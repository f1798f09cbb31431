"""Arrow IPC stream ingest (sources/arrowipc.py): roundtrip, typed
corruption errors, vectorized-aggregation parity, Spark rollup."""

import random

import pytest

import inception_spark.sources.arrowipc as A


def test_stream_roundtrip_multi_batch():
    import pyarrow.compute as pc

    ids = list(range(-3, 200))
    texts = [f"doc {i} " + "a" * (abs(i) % 5) for i in ids]
    blob = A.encode_arrow_stream(ids, texts, batch_rows=17)
    n = sid = nb = na = 0
    batches = 0
    for rb in A.iter_arrow_batches(blob):
        batches += 1
        n += rb.num_rows
        sid += pc.sum(rb.column("doc_id")).as_py()
        nb += pc.sum(
            pc.binary_length(pc.cast(rb.column("text"), "binary"))
        ).as_py()
        na += pc.sum(pc.count_substring(rb.column("text"), "a")).as_py()
    assert batches == 12  # 203 rows / 17 per batch
    assert (n, sid, nb, na) == (
        len(ids),
        sum(ids),
        sum(len(t.encode()) for t in texts),
        sum(t.count("a") for t in texts),
    )


def test_corruption_typed():
    blob = A.encode_arrow_stream([1, 2], ["x", "y"])
    with pytest.raises(A.ArrowIpcFormatError, match="IPC"):
        list(A.iter_arrow_batches(b"not an arrow stream"))
    with pytest.raises(A.ArrowIpcFormatError):
        list(A.iter_arrow_batches(blob[: len(blob) // 2]))


def test_mutation_fuzz_typed_or_decoded():
    ids = list(range(60))
    blob = A.encode_arrow_stream(ids, [f"doc {i}" for i in ids],
                                 batch_rows=11)
    rng = random.Random(42)
    caught = 0
    for _ in range(80):
        i = rng.randrange(len(blob))
        mut = (
            blob[:i]
            + bytes([blob[i] ^ (1 << rng.randrange(8))])
            + blob[i + 1 :]
        )
        try:
            list(A.iter_arrow_batches(mut))
        except A.ArrowIpcFormatError:
            caught += 1
        # any other exception type fails the test
    assert caught > 0


def test_arrow_ipc_stats_matches_text(spark):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, f"text {i} " + "a" * (i % 7)) for i in range(60)],
        "doc_id long, text string",
    )
    got = {r["shard"]: r for r in A.arrow_ipc_stats(docs).collect()}
    want = docs.groupBy((F.col("doc_id") % 4).alias("shard")).agg(
        F.count("*").alias("n_rows"),
        F.sum("doc_id").alias("sum_doc_id"),
        F.sum(F.octet_length("text")).alias("decoded_bytes"),
        F.sum(
            F.octet_length("text")
            - F.octet_length(F.replace(F.col("text"), F.lit("a")))
        ).alias("n_a"),
    )
    for r in want.collect():
        g = got[r["shard"]]
        assert (
            g["n_rows"],
            g["sum_doc_id"],
            g["decoded_bytes"],
            g["n_a"],
        ) == (
            r["n_rows"],
            r["sum_doc_id"],
            r["decoded_bytes"],
            r["n_a"],
        )
