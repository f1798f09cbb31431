"""SQLite shard images (sources/sqliteshard.py): stdlib
serialize/deserialize round trip, typed corruption errors, byte-level
text accounting, and the Spark rollup end-to-end."""

import pytest

import inception_spark.sources.sqliteshard as S


def test_image_roundtrip_and_magic():
    rows = [(i, f"doc {i} " + "o" * (i % 5)) for i in range(40)]
    blob = S.build_sqlite_image(rows)
    assert blob[:15] == b"SQLite format 3"
    back = S.read_sqlite_image(
        blob, "SELECT doc_id, text FROM docs ORDER BY doc_id"
    )
    assert back == rows


def test_corruption_taxonomy():
    blob = S.build_sqlite_image([(1, "x")])
    with pytest.raises(S.SqliteFormatError, match="magic"):
        S.read_sqlite_image(b"not a database", "SELECT 1")
    # keep the magic, wreck the pages: typed error, not sqlite3.Error
    with pytest.raises(S.SqliteFormatError, match="corrupt"):
        S.read_sqlite_image(
            blob[:100] + b"\xff" * (len(blob) - 100), S._SHARD_SQL
        )


def test_text_accounting_is_bytes_not_chars():
    """Non-ASCII text: decoded_bytes must count UTF-8 BYTES (DuckDB
    strlen semantics), not characters — the CAST AS BLOB pin."""
    rows = [(1, "héllo"), (2, "naïve oö")]
    blob = S.build_sqlite_image(rows)
    ((n, sid, nbytes, n_o),) = S.read_sqlite_image(blob, S._SHARD_SQL)
    assert n == 2 and sid == 3
    assert nbytes == len("héllo".encode()) + len("naïve oö".encode())
    assert n_o == 2  # ASCII 'o' only; 'ö' is not counted


def test_sqlite_ingest_stats_matches_text(spark):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, f"text {i} " + "o" * (i % 7)) for i in range(60)],
        "doc_id long, text string",
    )
    got = {
        r["shard"]: r for r in S.sqlite_ingest_stats(docs).collect()
    }
    want = docs.groupBy((F.col("doc_id") % 4).alias("shard")).agg(
        F.count("*").alias("n_rows"),
        F.sum("doc_id").alias("sum_doc_id"),
        F.sum(F.octet_length("text")).alias("decoded_bytes"),
        F.sum(
            F.octet_length("text")
            - F.octet_length(F.replace(F.col("text"), F.lit("o")))
        ).alias("n_o"),
    )
    for r in want.collect():
        g = got[r["shard"]]
        assert (
            g["n_rows"],
            g["sum_doc_id"],
            g["decoded_bytes"],
            g["n_o"],
        ) == (
            r["n_rows"],
            r["sum_doc_id"],
            r["decoded_bytes"],
            r["n_o"],
        )
