"""Property-based tests for the pure text operators (Python twins —
the Spark/DuckDB expression parity is pinned by the example-based
three-way tests; these hammer the shared semantics with random input)."""

import re

from hypothesis import given, settings, strategies as st

from inception_spark.functions.cleaning import normalize_text_py
from inception_spark.functions.pii import (
    PII_PATTERNS,
    PII_PLACEHOLDERS,
)

TEXT = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    max_size=400,
)

PII_SNIPPETS = st.sampled_from(
    [
        "u@ex.org",
        "415-555-0199",
        "219-09-9999",
        "4111-1111-1111-1111",
        "10.0.0.1",
    ]
)


def _redact(text: str) -> str:
    for cat, pat in PII_PATTERNS.items():
        text = re.sub(pat, PII_PLACEHOLDERS[cat].replace("\\", "\\\\"), text)
    return text


@given(TEXT, st.lists(PII_SNIPPETS, max_size=4))
@settings(max_examples=200, deadline=None)
def test_redaction_is_complete(text, snippets):
    """After redaction, no PII pattern matches anywhere — placeholders
    cannot create new matches, and injected PII always disappears."""
    noisy = text
    for s in snippets:
        noisy += " " + s
    red = _redact(noisy)
    for cat, pat in PII_PATTERNS.items():
        assert not re.search(pat, red), (cat, noisy, red)


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_redaction_noop_without_matches(text):
    if all(not re.search(p, text) for p in PII_PATTERNS.values()):
        assert _redact(text) == text


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_normalize_idempotent(text):
    once = normalize_text_py(text)
    assert normalize_text_py(once) == once


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_normalize_invariants(text):
    out = normalize_text_py(text)
    # no leading/trailing whitespace, no runs, no mapped accents left
    assert out == out.strip()
    assert "  " not in out and "\t" not in out and "\n" not in out
    from inception_spark.functions.cleaning import ACCENT_FROM

    assert not any(c in out for c in ACCENT_FROM)


def test_trigram_backoff_branches(spark):
    """Every stupid-backoff branch verified by hand on a crafted corpus:
    doc 0 (train, all trigrams seen), doc 1 (held out: seen trigram,
    bigram backoff, unigram backoff, and the OOV floor)."""
    import math

    from inception_spark.functions.text_analysis import doc_trigram_logprob

    # train doc 0: "a b c d"  -> trigrams {a b c, b c d}; bigrams
    # {a b, b c, c d}; unigrams {a,b,c,d}; N=4
    # score doc 1: "a b c x"  -> trigrams:
    #   "a b c"  seen          -> c123/c12 = 1/1
    #   "b c x"  unseen, bg23 "c x" unseen, w3 "x" unseen -> OOV floor
    df = spark.createDataFrame(
        [(0, "a b c d"), (1, "a b c x")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in doc_trigram_logprob(df).collect()
    }
    assert rows[0]["n_trigrams"] == 2
    # doc 0: both trigrams seen once, prefix bigrams seen once -> ln(1)=0
    assert rows[0]["mean_logprob"] == 0.0
    assert rows[1]["n_trigrams"] == 2
    exp = (round(math.log(1.0), 6) + round(math.log(0.16 / 5.0), 6)) / 2
    assert abs(rows[1]["mean_logprob"] - exp) < 1e-9

    # bigram + unigram backoff branches: train "p q r", score "z q r"
    # trigram "z q r" unseen; bg23 "q r" seen (1), w2 "q" count 1 ->
    # 0.4 * 1/1
    df2 = spark.createDataFrame(
        [(0, "p q r"), (1, "z q r")], "doc_id long, text string"
    )
    rows2 = {
        r["doc_id"]: r for r in doc_trigram_logprob(df2).collect()
    }
    exp2 = round(math.log(0.4), 6)
    assert abs(rows2[1]["mean_logprob"] - exp2) < 1e-9

    # unigram branch: train "p q r", score "z x r": bg23 "x r" unseen,
    # w3 "r" seen once, N=3 -> 0.16 * 1/3
    df3 = spark.createDataFrame(
        [(0, "p q r"), (1, "z x r")], "doc_id long, text string"
    )
    rows3 = {
        r["doc_id"]: r for r in doc_trigram_logprob(df3).collect()
    }
    exp3 = round(math.log(0.16 * (1.0 / 3.0)), 6)
    assert abs(rows3[1]["mean_logprob"] - exp3) < 1e-9
