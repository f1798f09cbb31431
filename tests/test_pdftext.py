"""PDF text extraction (sources/pdftext.py): writer/reader roundtrip
across both filter paths, string-escape and operator semantics, the
unsupported-feature taxonomy, and the Spark rollup end-to-end."""

import zlib

import pytest

import inception_spark.sources.pdftext as P


CASES = [
    "hello world",
    "line one\nline two\nline three",
    "parens (nested (deep)) and \\ backslash",
    "tabs\tand\x01ctrl\x7fbytes",
    "unicode: héllo — naïve — 日本語",
    "",
    "trailing newline\n",
    "(((((",
    ")" * 5,
]


@pytest.mark.parametrize("compress", [True, False])
def test_roundtrip_cases(compress):
    for t in CASES:
        assert P.pdf_to_text(P.encode_pdf(t, compress=compress)) == t, (
            repr(t)
        )


def test_literal_string_escapes():
    # octal, named escapes, line continuation, bare-escape drop
    s, end = P._parse_pdf_string(rb"(\101\n\t\(x\)\\ \q)", 0)
    assert s == b"A\n\t(x)\\ q"
    # unbalanced parens via escapes
    s, _ = P._parse_pdf_string(rb"(a\(b)", 0)
    assert s == b"a(b"
    with pytest.raises(P.PdfFormatError, match="unterminated"):
        P._parse_pdf_string(b"(never closed", 0)


def test_hex_strings_and_tj_arrays():
    content = b"BT <48656C6C6F> Tj [(wo) -120 (rld)] TJ ET"
    assert P.extract_content_text(content) == b"Helloworld"
    # odd hex digit implies trailing zero per spec
    assert P.extract_content_text(b"BT <414> Tj ET") == b"A@"


def test_strings_outside_bt_et_ignored():
    content = b"(not text) Tj BT (yes) Tj ET (also not) Tj"
    assert P.extract_content_text(content) == b"yes"


def test_unsupported_taxonomy():
    with pytest.raises(P.PdfFormatError, match="magic"):
        P.pdf_to_text(b"GIF89a not a pdf")
    blob = P.encode_pdf("x", compress=True)
    with pytest.raises(P.PdfFormatError, match="filter"):
        P.pdf_to_text(blob.replace(b"FlateDecode", b"LZWDecode  "))
    with pytest.raises(P.PdfFormatError, match="ncrypt"):
        P.pdf_to_text(
            blob.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R")
        )
    # corrupt deflate body: flip bytes inside the stream
    s = blob.find(b"stream\n") + 7
    mut = blob[:s] + b"\x00\x01\x02\x03" + blob[s + 4 :]
    with pytest.raises(P.PdfFormatError, match="Flate"):
        P.pdf_to_text(mut)


def test_length_exact_stream_slicing():
    """A stream whose payload ENDS in 0x0A bytes must survive — the
    bug class where backward-scanning for 'endstream' + rstrip eats
    real payload bytes (compressed streams legitimately end in LF).
    /Length-exact slicing must return every declared byte."""
    payload = b"ABC\n\n"  # 5 bytes, two of them trailing LFs
    blob = (
        b"%PDF-1.4\n1 0 obj\n<< /Length 5 >>\nstream\n"
        + payload
        + b"\nendstream\nendobj\n"
    )
    objs = P._parse_objects(blob)
    assert objs[1][1] == payload
    # and the declared-length-overrun guard
    short = blob.replace(b"/Length 5", b"/Length 99")
    with pytest.raises(P.PdfFormatError, match="shorter"):
        P._parse_objects(short)


def test_pdf_text_stats_matches_text(spark):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, f"line a {i}\nline b (e) {'e' * (i % 4)}") for i in range(40)],
        "doc_id long, text string",
    )
    got = {r["shard"]: r for r in P.pdf_text_stats(docs).collect()}
    want = docs.groupBy((F.col("doc_id") % 4).alias("shard")).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.octet_length("text")).alias("extracted_bytes"),
        F.sum(
            F.octet_length("text")
            - F.octet_length(F.replace(F.col("text"), F.lit("e")))
        ).alias("n_e"),
        F.sum(F.lit(2)).alias("n_lines"),  # every doc has 2 lines
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


@pytest.mark.parametrize("compress", [False, True])
def test_structural_tokens_in_text_roundtrip(compress):
    """ADVICE r12: PDF structural tokens inside an UNCOMPRESSED content
    stream are data, not structure — the cursor-driven object scan jumps
    past stream bodies via /Length instead of regex-matching into them."""
    cases = [
        "see 12 0 obj here",
        "an endobj mid-line",
        "endstream then more",
        "trailer << /Encrypt 9 0 R >>",
        "1 0 obj\nstream\nnested\nendstream\nendobj",
    ]
    for text in cases:
        assert P.pdf_to_text(P.encode_pdf(text, compress=compress)) == text


def test_encrypt_sniff_confined_to_trailer():
    """'/Encrypt' in document TEXT must not trip the encryption check;
    '/Encrypt' in the trailer dictionary must."""
    assert (
        P.pdf_to_text(P.encode_pdf("uses /Encrypt literally", compress=False))
        == "uses /Encrypt literally"
    )
    blob = P.encode_pdf("x")
    enc = blob.replace(
        b"trailer\n<< /Size", b"trailer\n<< /Encrypt 9 0 R /Size"
    )
    with pytest.raises(P.PdfFormatError, match="encrypted"):
        P.pdf_to_text(enc)
