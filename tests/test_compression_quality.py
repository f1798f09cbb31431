"""gzip-compressibility quality signal (the RedPajama-v2-class
feature).  No SQL oracle can replay DEFLATE, so the pins here are
behavioral instead: the signal must actually SEPARATE the three
content classes it exists to separate, and the routing bands must be
engine-exact integers."""

import random

import pytest
from pyspark.sql import functions as F

from inception_spark.functions.text_analysis import (
    compression_quality_gate,
    doc_compression_ratio,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(11)
    prose = (
        "The committee reviewed the filings and issued a short "
        "opinion explaining the applicable standard of review. "
    )
    rows = [
        # 0-9: natural prose (the keep band)
        *[(i, (prose * 4) + f" case {i}.") for i in range(10)],
        # 10-19: degenerate repetition (too_repetitive)
        *[(i, "spam " * 400) for i in range(10, 20)],
        # 20-29: random hex noise (too_random tail)
        *[
            (i, "".join(rng.choice("0123456789abcdef") for _ in range(1500)))
            for i in range(20, 30)
        ],
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_ratio_separates_content_classes(corpus):
    r = {
        row.doc_id: row.ratio_millis
        for row in doc_compression_ratio(corpus).collect()
    }
    prose = [r[i] for i in range(10)]
    rep = [r[i] for i in range(10, 20)]
    noise = [r[i] for i in range(20, 30)]
    # strict ordering of the class MEANS of the signal
    assert max(rep) < min(prose) < max(prose) < min(noise)
    # and sane absolute ranges
    assert all(v < 150 for v in rep)         # "spam "*400 collapses
    assert all(250 <= v <= 700 for v in prose)
    assert all(v > 500 for v in noise)


def test_duplication_monotonicity(spark):
    """Duplicating a document's text can only IMPROVE compressibility
    (never worsen it beyond noise) — the defining property of a
    repetition detector."""
    base = "varied natural sentence with many different words here. "
    rows = [(1, base * 2), (2, base * 16)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    r = {
        row.doc_id: row.ratio_millis
        for row in doc_compression_ratio(df).collect()
    }
    assert r[2] < r[1]


def test_gate_routes(corpus):
    routed = compression_quality_gate(corpus)
    got = {
        row.doc_id: row.compress_route for row in routed.collect()
    }
    assert all(got[i] == "keep" for i in range(10))
    assert all(got[i] == "too_repetitive" for i in range(10, 20))
    # hex noise sits high; with the default 1100 ceiling it may keep —
    # tighten the band to show the tail routing
    tight = compression_quality_gate(corpus, max_ratio_millis=500)
    got2 = {row.doc_id: row.compress_route for row in tight.collect()}
    assert all(got2[i] == "too_random" for i in range(20, 30))


def test_empty_and_unicode(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "☃" * 300)], ["doc_id", "text"]
    )
    r = {
        row.doc_id: (row.n_bytes, row.ratio_millis)
        for row in doc_compression_ratio(df).collect()
    }
    assert r[1] == (0, 1000)          # empty: defined, not a crash
    assert r[2][0] == 900             # UTF-8 bytes, not chars
    assert r[2][1] < 150              # single repeated codepoint
