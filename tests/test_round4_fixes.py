"""Regression tests for the round-4 advisor/verdict residuals:

* simhash_dup_pairs max_bucket drop accounting (Observation metric);
* knn_join(block_on=None) cross-join warning;
* corpus_report top-lang tie-break with NULL lang (Spark vs DuckDB);
* pii staged counting on overlapping cross-category spans;
* probe_wav_meta on valid magics with zeroed fmt fields (ANSI-safe);
* load_events fallback on the TIMESTAMP(NANOS) physical encoding.
"""

import warnings

import duckdb
import pandas as pd
import pytest
from pyspark.sql import Observation
from pyspark.sql import functions as F


def test_simhash_bucket_cap_observation(spark):
    """Dropped band buckets are observable, mirroring lsh_candidate_pairs
    — the docstring's recall trade must be measurable, not asserted."""
    from inception_spark.operators.dedup import simhash_dup_pairs

    rows = [(i, "shared boilerplate words repeated for every doc")
            for i in range(6)]
    rows += [(100, "completely different content about sailing ships"),
             (101, "completely different content about sailing ships")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    obs = Observation("simhash_skew")
    pairs = simhash_dup_pairs(df, max_bucket=4, observation=obs)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    # the 6-doc clique saturates all 4 bands above the cap → dropped
    assert not any(a < 100 for a, _ in got)
    assert (100, 101) in got
    assert obs.get["rows_in_dropped_buckets"] == 6 * 4
    assert obs.get["band_rows"] == 8 * 4


def test_knn_join_unblocked_warns(spark):
    from inception_spark.operators.similarity import knn_join

    q = spark.createDataFrame(
        [(1, [1.0, 0.0])], "q_id long, q_vec array<float>"
    )
    c = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    with pytest.warns(UserWarning, match="cross join"):
        out = knn_join(q, c, k=1)
    assert out.collect()[0]["n_id"] == 10

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # blocked call must NOT warn
        q2 = q.withColumn("b", F.lit(0))
        c2 = c.withColumn("b", F.lit(0))
        knn_join(q2, c2, k=1, block_on=("b", "b"))


def test_corpus_report_null_lang_tie(spark, tmp_path):
    """n-tie between a NULL lang and a real lang: both engines must pick
    the real lang (NULLS LAST on the tie-break, explicit on both sides)."""
    from inception_spark.functions.text_analysis import (
        corpus_report,
        corpus_report_sql,
    )

    rows = [
        ("s1", None, "words here"), ("s1", None, "more words"),
        ("s1", "en", "english text"), ("s1", "en", "english again"),
        ("s2", None, "only null lang"),
    ]
    df = spark.createDataFrame(rows, "source string, lang string, text string")
    got = {r["source"]: r["top_lang"] for r in corpus_report(df).collect()}
    assert got["s1"] == "en"     # tie 2-2 vs NULL → real lang wins
    assert got["s2"] is None     # all-NULL group: NULL is the only lang

    path = str(tmp_path / "docs.parquet")
    df.write.mode("overwrite").parquet(path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    duck = con.execute(corpus_report_sql()).df()
    dgot = dict(zip(duck["source"], duck["top_lang"]))
    assert dgot["s1"] == "en"
    assert pd.isna(dgot["s2"])


def test_pii_overlapping_spans_staged_counts(spark):
    """A card number used as an email local-part is ONE email, not an
    email plus a card: counts are staged on progressively-redacted text
    so n_pii always equals the number of placeholders inserted."""
    from inception_spark.functions.pii import (
        PII_PLACEHOLDERS,
        pii_stats,
        pii_stats_sql,
    )

    text = "reach 1234-5678-9012-3456@x.co or 4111-1111-1111-1111 now"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = pii_stats(df).collect()[0]
    assert row["n_email"] == 1 and row["n_card"] == 1 and row["n_pii"] == 2
    assert row["redacted"] == "reach [EMAIL] or [CARD] now"
    n_placeholders = sum(
        row["redacted"].count(p) for p in PII_PLACEHOLDERS.values()
    )
    assert n_placeholders == row["n_pii"]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT 1 AS doc_id, '{text}' AS text"
    )
    drow = con.execute(pii_stats_sql()).df().iloc[0]
    assert drow["n_email"] == 1 and drow["n_card"] == 1
    assert drow["redacted"] == row["redacted"]


def test_probe_wav_meta_zeroed_fmt_is_null_not_throw(spark):
    """Valid RIFF/WAVE/data magics with zeroed fmt fields: under ANSI
    mode the duration division must be gated, yielding NULL duration."""
    from inception_spark.operators.multimodal import (
        attach_media_meta,
        encode_wav,
        probe_wav_meta,
    )

    good = bytearray(encode_wav([0.0] * 100, 8000))
    bad = bytearray(good)
    bad[22:36] = b"\x00" * 14  # channels, rate, byte rate, align, bps
    df = spark.createDataFrame(
        [(1, bad), (2, good)], "id long, payload binary"
    )
    out = probe_wav_meta(
        attach_media_meta(df, modality="audio", mime="audio/wav")
    )
    rows = {r["id"]: r for r in out.select("id", "media_meta.*").collect()}
    assert rows[1]["duration_ms"] is None      # degenerate header → NULL
    assert rows[2]["duration_ms"] is not None  # intact header unaffected


def test_load_events_nanos_physical_encoding(spark, tmp_path):
    """The fallback branch: a TIMESTAMP(NANOS) events.parquet (rounds 1-2
    driver encoding) must load to the same logical schema and micro-
    truncated values as the current timestamp[us] encoding."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from inception_spark.plans.relational import load_events

    tbl = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(
                [1700000000_123456789, 1700000100_987654321],
                pa.timestamp("ns"),
            ),
            "user_id": pa.array([10, 11], pa.int64()),
            "event_type": pa.array(["click", "view"]),
            "value": pa.array([1.5, 2.5], pa.float64()),
            "props": pa.array(["{}", "{}"]),
        }
    )
    pq.write_table(
        tbl, str(tmp_path / "events.parquet"),
        version="2.6", coerce_timestamps=None,
    )
    ev = load_events(spark, str(tmp_path))
    assert dict(ev.dtypes)["ts"] == "timestamp_ntz"
    got = sorted(
        r["ts"].isoformat() for r in ev.select("ts").collect()
    )
    assert got == [
        "2023-11-14T22:13:20.123456",
        "2023-11-14T22:15:00.987654",
    ]
