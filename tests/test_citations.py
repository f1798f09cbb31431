"""Legal citation extraction: Spark == Python re == DuckDB."""

import re

import duckdb
import pytest
from pyspark.sql import functions as F

from inception_spark.functions.text_analysis import (
    CITATION_PATTERNS,
    citation_count,
    citation_count_sql,
    extract_citations,
)

CASES = [
    ("brown", "Brown v. Board, 347 U.S. 483 (1954)", {"us": 1}),
    ("fed3d", "aff'd 163 F.3d 952", {"fed": 1}),
    ("fsupp", "98 F. Supp. 797 on remand", {"fed": 1}),
    ("regional", "see 410 P.2d 535 and 12 N.E.3d 44",
     {"regional": 2}),
    ("section", "under § 1983 and §12", {"section": 2}),
    ("none", "no citations in this text", {}),
    ("mixed", "347 U.S. 483, 163 F.3d 952, § 1983",
     {"us": 1, "fed": 1, "section": 1}),
]


@pytest.mark.parametrize("name,text,expected", CASES)
def test_python_counts(name, text, expected):
    for kind, pat in CITATION_PATTERNS.items():
        assert len(re.findall(pat, text)) == expected.get(kind, 0), (
            name, kind,
        )


@pytest.mark.parametrize("name,text,expected", CASES)
def test_spark_counts(spark, name, text, expected):
    df = spark.createDataFrame([(text,)], "text string")
    row = df.select(
        *[citation_count(F.col("text"), k).alias(k)
          for k in CITATION_PATTERNS]
    ).collect()[0]
    for kind in CITATION_PATTERNS:
        assert row[kind] == expected.get(kind, 0), (name, kind)


@pytest.mark.parametrize("name,text,expected", CASES)
def test_duckdb_counts(name, text, expected):
    con = duckdb.connect()
    sel = ", ".join(
        f"{citation_count_sql('?', k)} AS c_{k}" for k in CITATION_PATTERNS
    )
    got = con.execute(
        f"SELECT {sel}", [text] * len(CITATION_PATTERNS)
    ).fetchone()
    for i, kind in enumerate(CITATION_PATTERNS):
        assert got[i] == expected.get(kind, 0), (name, kind)


def test_extract_citations_ordered_list(spark):
    df = spark.createDataFrame(
        [(1, "see 347 U.S. 483 then 163 F.3d 952 under § 1983")],
        "doc_id long, text string",
    )
    row = extract_citations(df).collect()[0]
    assert row["citations"] == "347 U.S. 483|163 F.3d 952|§ 1983"
    assert row["n_us"] == 1 and row["n_fed"] == 1 and row["n_section"] == 1


def test_phrase_search_positions_and_counts(spark):
    """Adjacent-in-order only: permutations and gapped words don't
    match; overlapping occurrences all count; punctuation-normalized."""
    from inception_spark.functions.text_analysis import phrase_search

    rows = [
        (1, "a b c d"),
        (2, "b a c"),            # wrong order
        (3, "a x b"),            # gap
        (4, "a b a b a b"),      # overlapping: "a b" x3, "b a" x2
        (5, "A, B! c"),          # normalization
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.n_occurrences
           for r in phrase_search(df, "a b").collect()}
    assert got == {1: 1, 4: 3, 5: 1}
    got3 = {r.doc_id: r.n_occurrences
            for r in phrase_search(df, "a b c").collect()}
    assert got3 == {1: 1, 5: 1}


def test_phrase_search_normalizes_the_phrase_too(spark):
    """Punctuated/cased PHRASES match: the phrase goes through the
    same [a-z0-9]+ extraction as the postings."""
    from inception_spark.functions.text_analysis import phrase_search

    df = spark.createDataFrame(
        [(1, "the fast key order wins")], "doc_id long, text string"
    )
    got = phrase_search(df, "Fast, KEY order!").collect()
    assert [(r.doc_id, r.n_occurrences) for r in got] == [(1, 1)]


def test_term_keyness_finds_planted_term(spark):
    """A term appearing only in the slice dominates the keyness
    ranking; terms uniform across slices never rank (not enriched)."""
    rows = [
        (1, "de", "der kernel sehr " * 10 + "common word"),
        (2, "de", "der kernel auch " * 10 + "common word"),
        (3, "en", "the other text " * 10 + "common word"),
        (4, "en", "more other text " * 10 + "common word"),
    ]
    from inception_spark.functions.text_analysis import term_keyness_chi2

    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = term_keyness_chi2(df, group_value="de", k=5).collect()
    terms = [r.term for r in out]
    assert out[0].rank == 1 and terms[0] in {"der", "kernel"}
    assert "common" not in terms and "word" not in terms
    # planted term stats: appears only in-slice
    top = out[0]
    assert top.n_rest == 0 and top.n_in_slice >= 20
