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
