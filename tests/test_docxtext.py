"""DOCX text extraction (sources/docxtext.py): text-model roundtrip,
run fragmentation, break/tab semantics, taxonomy, Spark rollup."""

import io
import zipfile
from xml.etree import ElementTree

import pytest

import inception_spark.sources.docxtext as D


CASES = [
    "hello world",
    "a  b   c    (multi-space runs)",
    "multi\nline\ntext",
    "",
    "trailing space \nand more",
    "unicode héllo — naïve — 日本語",
    '<tags> & "quotes" &amp; entities',
]


def test_roundtrip_cases():
    for t in CASES:
        assert D.docx_to_text(D.encode_docx(t)) == t, repr(t)


def test_run_fragmentation_is_real():
    """The synthesized package must actually SPLIT lines into multiple
    runs (otherwise the rejoin contract is untested)."""
    blob = D.encode_docx("three words here")
    with zipfile.ZipFile(io.BytesIO(blob)) as z:
        xml = z.read("word/document.xml")
    root = ElementTree.fromstring(xml)
    ts = list(root.iter(f"{{{D._W}}}t"))
    assert len(ts) == 5  # 3 words + 2 space runs
    spaces = [t for t in ts if t.text == " "]
    key = "{http://www.w3.org/XML/1998/namespace}space"
    assert spaces and all(t.get(key) == "preserve" for t in spaces)


def test_br_and_tab_elements():
    xml = (
        '<w:document xmlns:w="%s"><w:body><w:p><w:r>'
        "<w:t>a</w:t><w:br/><w:t>b</w:t><w:tab/><w:t>c</w:t>"
        "</w:r></w:p></w:body></w:document>" % D._W
    ).encode()
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("word/document.xml", xml)
    assert D.docx_to_text(buf.getvalue()) == "a\nb\tc"


def test_taxonomy():
    with pytest.raises(D.DocxFormatError, match="OLE2"):
        D.docx_to_text(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1 legacy doc")
    with pytest.raises(D.DocxFormatError, match="ZIP"):
        D.docx_to_text(b"plainly not a package")
    # a zip without the document part
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("other.txt", "x")
    with pytest.raises(D.DocxFormatError, match="document.xml"):
        D.docx_to_text(buf.getvalue())
    # malformed XML inside a valid zip
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("word/document.xml", "<w:document unclosed")
    with pytest.raises(D.DocxFormatError, match="malformed"):
        D.docx_to_text(buf.getvalue())


def test_docx_text_stats_matches_text(spark):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, f"line a {i}\nline b (e) {'e' * (i % 4)}") for i in range(40)],
        "doc_id long, text string",
    )
    got = {r["shard"]: r for r in D.docx_text_stats(docs).collect()}
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


def test_doc_format_matrix_consistent(spark):
    """All four extractors agree on every counter — the one-scan
    cross-family consistency gate (EPUB joined in r13)."""
    docs = spark.createDataFrame(
        [(i, f"line a {i}\nline b (e) {'e' * (i % 4)}") for i in range(20)],
        "doc_id long, text string",
    )
    rows = {r["fmt"]: r for r in D.doc_format_matrix_stats(docs).collect()}
    assert set(rows) == {"pdf", "docx", "rtf", "epub"}
    vals = {
        f: (r["n_docs"], r["extracted_bytes"], r["n_e"], r["n_lines"])
        for f, r in rows.items()
    }
    assert len(set(vals.values())) == 1  # identical across formats
    assert vals["pdf"][0] == 20 and vals["pdf"][3] == 40
