"""RTF text extraction (sources/rtftext.py): control-word grammar,
destination skipping, Unicode escape + fallback-skip semantics,
taxonomy, and the Spark rollup."""

import pytest

import inception_spark.sources.rtftext as R


CASES = [
    "hello world",
    "braces {and} \\ backslash",
    "multi\nline\ntext",
    "",
    "unicode héllo — naïve — 日本語",
    "astral 𝄞 and emoji 🎵 (surrogate pairs)",
    "tab\there and ctrl\x01char",
    "trailing \n",
]


def test_roundtrip_cases():
    for t in CASES:
        assert R.rtf_to_text(R.encode_rtf(t)) == t, repr(t)


def test_destination_groups_skipped():
    src = (
        rb"{\rtf1\ansi{\fonttbl{\f0 Arial;}}{\colortbl;\red0;}"
        rb"{\*\generator Mystery 9.1;}{\info{\author nobody}}visible}"
    )
    assert R.rtf_to_text(src) == "visible"


def test_unicode_fallback_skip_counts():
    # \uc2: TWO fallback chars after each \uN must be dropped
    assert (
        R.rtf_to_text(rb"{\rtf1{\uc2\u233 e?after}}") == "éafter"
    )
    # \uc0: nothing dropped
    assert R.rtf_to_text(rb"{\rtf1{\uc0\u233 after}}") == "éafter"
    # uc state restores on group exit
    assert (
        R.rtf_to_text(rb"{\rtf1\uc1{\uc2\u233 xx}\u233 x rest}")
        == "éé rest"
    )


def test_control_word_space_consumption():
    # exactly ONE space after a control word is consumed
    assert R.rtf_to_text(rb"{\rtf1 a\tab  b}") == "a\t b"
    # \par with no space before text
    assert R.rtf_to_text(rb"{\rtf1 a\par b}") == "a\nb"


def test_hex_escapes_cp1252():
    assert R.rtf_to_text(rb"{\rtf1 caf\'e9 \'80}") == "café €"


def test_taxonomy():
    with pytest.raises(R.RtfFormatError, match="magic"):
        R.rtf_to_text(b"plain text, no rtf")
    with pytest.raises(R.RtfFormatError, match="unclosed"):
        R.rtf_to_text(rb"{\rtf1 unterminated")
    with pytest.raises(R.RtfFormatError, match="unbalanced"):
        R.rtf_to_text(rb"{\rtf1 }}} too many")
    with pytest.raises(R.RtfFormatError, match="hex"):
        R.rtf_to_text(rb"{\rtf1 \'zz}")


def test_rtf_text_stats_matches_text(spark):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, f"line a {i}\nline b (e) {'e' * (i % 4)}") for i in range(40)],
        "doc_id long, text string",
    )
    got = {r["shard"]: r for r in R.rtf_text_stats(docs).collect()}
    want = docs.groupBy((F.col("doc_id") % 4).alias("shard")).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.octet_length("text")).alias("extracted_bytes"),
        F.sum(
            F.octet_length("text")
            - F.octet_length(F.replace(F.col("text"), F.lit("e")))
        ).alias("n_e"),
        F.sum(F.lit(2)).alias("n_lines"),
    )
    for r in want.collect():
        g = got[r["shard"]]
        assert (
            g["n_docs"],
            g["extracted_bytes"],
            g["n_e"],
            g["n_lines"],
        ) == (
            r["n_docs"],
            r["extracted_bytes"],
            r["n_e"],
            r["n_lines"],
        )
