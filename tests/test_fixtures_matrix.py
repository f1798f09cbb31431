"""The FIXTURES.md §1 representative-case matrix, end to end through the
engine — every validation/cleaning branch the reference's tests exercise,
plus vector NULL/zero semantics from the ANSI-mode review."""

import pytest
from pyspark.sql import functions as F

from inception_spark.engine import EmbeddingEngine


@pytest.fixture(scope="module")
def engine(spark):
    return EmbeddingEngine(spark)


def test_fixtures_validation_matrix(spark, engine, sample_opinion):
    rows = [
        (1, sample_opinion),                     # legal opinion: golden path
        (2, sample_opinion * 20),                # long opinion: multi-chunk
        (3, ""),                                 # empty → min-length reject
        (4, "ñ😊"),                              # unicode-only: cleans empty
        (5, "a\tb\r\nc\r d\n\n\n\ne  \x00\x07"), # messy whitespace
        (6, "word " * 3000),                     # giant sentence → truncation
    ]
    df = spark.createDataFrame(rows, "id long, text string")

    # validate_text (M5): never raises, classifies each branch
    v = {r["id"]: r for r in engine.validate_text(df).collect()}
    assert v[1]["is_valid"] and v[2]["is_valid"]
    assert v[3]["error"] == "Text length (0) below minimum (1)"
    assert v[4]["error"] == "Text is empty after cleaning."
    assert v[5]["is_valid"]
    assert v[5]["processed_text"] == "a b\nc d\n\ne"
    assert v[6]["is_valid"]

    # batch pipeline: quarantine only the min-length reject (doc 4 chunks
    # raw — reference parity), budget respected everywhere
    good, bad = engine.validate_documents(df)
    assert {r["id"] for r in bad.collect()} == {3}
    out = engine.embed_documents(good).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[2]) > len(by_doc[1]) >= 1
    assert len(by_doc[6]) == 1  # one truncated chunk from the giant sentence
    assert all(r["n_tokens"] <= 512 for r in out)
    assert all(len(r["embedding"]) == 768 for r in out)

    # over-long text (>10M chars) rejects with the reference message
    import inception_spark.functions.cleaning as C

    with pytest.raises(ValueError, match=r"exceeds maximum \(10000000\)"):
        C.validate_text_length_py(
            "x" * 10_000_001, min_len=1, max_len=10_000_000
        )


def test_vector_null_and_zero_semantics(spark):
    """cosine: NULL (not crash) on zero norms under ANSI mode; NULL
    elements contribute 0 like DuckDB's list_sum."""
    from inception_spark.functions.vectors import cosine, dot

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], [1.0, 0.0]),
            (2, [0.0, 0.0], [1.0, 0.0]),       # zero norm
            (3, [1.0, None], [1.0, 1.0]),      # NULL element
        ],
        "id long, a array<double>, b array<double>",
    )
    rows = {
        r["id"]: (r["c"], r["d"])
        for r in df.select(
            "id",
            cosine(F.col("a"), F.col("b")).alias("c"),
            dot(F.col("a"), F.col("b")).alias("d"),
        ).collect()
    }
    assert rows[1] == (1.0, 1.0)
    assert rows[2][0] is None          # NULL, not DIVIDE_BY_ZERO
    assert rows[3][1] == 1.0           # NULL element skipped like DuckDB
