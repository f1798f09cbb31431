"""DOCX text extraction — stdlib-only (zipfile + ElementTree).

DOCX (ECMA-376 WordprocessingML) is, with PDF, the other dominant
document format in scraped corpora.  A .docx is a ZIP package whose
text lives in ``word/document.xml``: paragraphs are ``<w:p>`` elements,
text runs are ``<w:t>`` (with ``xml:space="preserve"`` governing
whitespace), explicit line breaks are ``<w:br/>`` and tabs ``<w:tab/>``.
Both the container (ZIP) and the payload (XML) parse with the Python
stdlib, so unlike the PDF path nothing is transcribed — the operator's
value is the correct TEXT MODEL: paragraph boundaries → newlines,
breaks/tabs materialized, run fragmentation (one word split across
ten ``<w:t>`` runs by revision tracking) rejoined seamlessly.

Scope honesty: headers/footers/footnotes/comments live in sibling part
files and are deliberately excluded (the body-text contract states it);
``.doc`` (OLE2 binary) raises :class:`DocxFormatError`.

Spark shape: identical to the PDF path — synthesis worker-side (a real
ZIP per document, with the run-fragmentation torture built in: every
line is split into per-word ``<w:t>`` runs), one mapInPandas extract
pass, shard-key shuffle only.  At 100 TB one .docx per row; per-task
memory = one package (document.xml inflates alone — members stream)."""

from __future__ import annotations

import io
import zipfile
from typing import Iterator
from xml.etree import ElementTree

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from inception_spark.sources import fanout


class DocxFormatError(ValueError):
    """Typed error for corrupt/unsupported .docx bytes."""


_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.wordprocessingml.document.main'
    '+xml"/></Types>'
)


def encode_docx(text: str) -> bytes:
    """A real .docx: ZIP package with [Content_Types].xml and
    word/document.xml.  Every line becomes one paragraph whose words
    are split across per-word runs (the run-fragmentation shape real
    editors emit), with spaces carried in their own space-preserved
    runs — extraction must rejoin them exactly."""
    root = ElementTree.Element(f"{{{_W}}}document")
    body = ElementTree.SubElement(root, f"{{{_W}}}body")
    for line in text.split("\n"):
        p = ElementTree.SubElement(body, f"{{{_W}}}p")
        r = ElementTree.SubElement(p, f"{{{_W}}}r")
        # alternate word / space-run fragments, each its own <w:t>
        # (space runs need xml:space="preserve")
        import re as _re

        for part in _re.findall(r"[ ]+|[^ ]+", line):
            t = ElementTree.SubElement(r, f"{{{_W}}}t")
            t.text = part
            if part != part.strip():
                t.set(
                    "{http://www.w3.org/XML/1998/namespace}space",
                    "preserve",
                )
    ElementTree.register_namespace("w", _W)
    xml = ElementTree.tostring(root, encoding="UTF-8", xml_declaration=True)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("word/document.xml", xml)
    return buf.getvalue()


def docx_to_text(blob: bytes) -> str:
    """Extract body text: one line per ``<w:p>`` paragraph, ``<w:t>``
    runs concatenated in document order, ``<w:br/>`` → newline,
    ``<w:tab/>`` → tab.  Typed errors for non-ZIP bytes (incl. the
    OLE2 ``.doc`` magic), a package without word/document.xml, or
    malformed XML."""
    if blob[:8] == b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1":
        raise DocxFormatError("OLE2 .doc (binary Word) unsupported")
    try:
        z = zipfile.ZipFile(io.BytesIO(blob))
    except zipfile.BadZipFile as exc:
        raise DocxFormatError(f"not a ZIP package: {exc}") from exc
    try:
        with z.open("word/document.xml") as fh:
            xml = fh.read()
    except KeyError as exc:
        raise DocxFormatError("package has no word/document.xml") from exc
    try:
        root = ElementTree.fromstring(xml)
    except ElementTree.ParseError as exc:
        raise DocxFormatError(f"malformed document.xml: {exc}") from exc
    lines: list[str] = []
    for p in root.iter(f"{{{_W}}}p"):
        buf: list[str] = []
        for el in p.iter():
            if el.tag == f"{{{_W}}}t":
                buf.append(el.text or "")
            elif el.tag == f"{{{_W}}}br":
                buf.append("\n")
            elif el.tag == f"{{{_W}}}tab":
                buf.append("\t")
        lines.append("".join(buf))
    return "\n".join(lines)


_CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


def synth_docx_corpus(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    src = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).where(F.col("text").isNotNull())

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids.to_numpy(),
                    "payload": [encode_docx(str(t)) for t in pdf["text"]],
                }
            )

    return fanout(src).mapInPandas(gen, _CORPUS_SCHEMA)


_STATS_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.LongType(), False),
        T.StructField("n_docs", T.LongType(), False),
        T.StructField("extracted_bytes", T.LongType(), False),
        T.StructField("n_e", T.LongType(), False),
        T.StructField("n_lines", T.LongType(), False),
    ]
)


def docx_text_partials(corpus: DataFrame, *, n_shards: int = 4) -> DataFrame:
    """Extract every package's text and fold per-shard counters —
    byte-for-byte the PDF partial contract, so the two document
    formats share an oracle shape."""

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            agg: dict[int, list[int]] = {}
            for i, p in zip(pdf["doc_id"], pdf["payload"]):
                txt = docx_to_text(bytes(p))
                sh = int(i) % n_shards
                a = agg.setdefault(sh, [0, 0, 0, 0])
                raw = txt.encode("utf-8")
                a[0] += 1
                a[1] += len(raw)
                a[2] += raw.count(b"e")
                a[3] += txt.count("\n") + 1 if txt else 0
            if agg:
                yield pd.DataFrame(
                    [
                        {
                            "shard": sh,
                            "n_docs": v[0],
                            "extracted_bytes": v[1],
                            "n_e": v[2],
                            "n_lines": v[3],
                        }
                        for sh, v in agg.items()
                    ]
                )

    return corpus.mapInPandas(walk, _STATS_SCHEMA)


def docx_text_from_partials(parts: DataFrame) -> DataFrame:
    return (
        parts.groupBy("shard")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("extracted_bytes").cast("long").alias("extracted_bytes"),
            F.sum("n_e").cast("long").alias("n_e"),
            F.sum("n_lines").cast("long").alias("n_lines"),
        )
        .orderBy("shard")
    )


def docx_text_stats(docs: DataFrame) -> DataFrame:
    """REAL DOCX extraction, oracle-checked: package every document as
    a run-fragmented .docx, extract the body text back, aggregate per
    shard.  Shares the PDF entry's closed-form oracle (identical
    counters off ``documents.text``)."""
    return docx_text_from_partials(
        docx_text_partials(synth_docx_corpus(docs))
    )


# ---------------------------------------------------------------------------
# document-format matrix: one scan drives every extractor (the
# codecmatrix discipline applied to the document family)
# ---------------------------------------------------------------------------

_MATRIX_SCHEMA = T.StructType(
    [
        T.StructField("fmt", T.StringType(), False),
        T.StructField("n_docs", T.LongType(), False),
        T.StructField("extracted_bytes", T.LongType(), False),
        T.StructField("n_e", T.LongType(), False),
        T.StructField("n_lines", T.LongType(), False),
    ]
)


def doc_format_matrix_stats(docs: DataFrame) -> DataFrame:
    """ONE corpus scan drives all four document extractors — render
    every document as PDF (Flate), DOCX, RTF, and EPUB (r13: the
    spine-ordered OCF book), extract each back, and fold per-format
    counters: (fmt, n_docs, extracted_bytes, n_e, n_lines).  The
    oracle cross-joins one closed-form aggregate over
    ``documents.text`` with the format list, so a defect in any single
    extractor flips exactly its own row — and at 100 TB this is 1 scan
    where per-format validation passes would be 4.  The per-format
    REGISTRY entries remain the per-shard deep checks; this is the
    cross-family consistency gate."""
    from inception_spark.sources.epubtext import encode_epub, epub_to_text
    from inception_spark.sources.pdftext import encode_pdf, pdf_to_text
    from inception_spark.sources.rtftext import encode_rtf, rtf_to_text

    src = docs.select("doc_id", "text").where(F.col("text").isNotNull())

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fmts = {
            "pdf": lambda i, t: pdf_to_text(encode_pdf(t, compress=True)),
            "docx": lambda i, t: docx_to_text(encode_docx(t)),
            "rtf": lambda i, t: rtf_to_text(encode_rtf(t)),
            "epub": lambda i, t: epub_to_text(encode_epub(i, t)),
        }
        for pdf_b in batches:
            agg = {f: [0, 0, 0, 0] for f in fmts}
            for i, t in zip(pdf_b["doc_id"], pdf_b["text"]):
                t = str(t)
                for f, fn in fmts.items():
                    txt = fn(int(i), t)
                    raw = txt.encode("utf-8")
                    a = agg[f]
                    a[0] += 1
                    a[1] += len(raw)
                    a[2] += raw.count(b"e")
                    a[3] += txt.count("\n") + 1 if txt else 0
            yield pd.DataFrame(
                [
                    {
                        "fmt": f,
                        "n_docs": v[0],
                        "extracted_bytes": v[1],
                        "n_e": v[2],
                        "n_lines": v[3],
                    }
                    for f, v in agg.items()
                ]
            )

    return (
        fanout(src).mapInPandas(walk, _MATRIX_SCHEMA)
        .groupBy("fmt")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("extracted_bytes").cast("long").alias("extracted_bytes"),
            F.sum("n_e").cast("long").alias("n_e"),
            F.sum("n_lines").cast("long").alias("n_lines"),
        )
        .orderBy("fmt")
    )


def doc_format_matrix_sql() -> str:
    """DuckDB twin: one closed-form aggregate cross-joined with the
    format list."""
    return """
WITH base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(strlen(text)) AS BIGINT) AS extracted_bytes,
         CAST(SUM(strlen(text) - strlen(replace(text, 'e', '')))
              AS BIGINT) AS n_e,
         CAST(SUM(CASE WHEN strlen(text) = 0 THEN 0
                  ELSE strlen(text)
                       - strlen(replace(text, chr(10), '')) + 1
                  END) AS BIGINT) AS n_lines
  FROM documents WHERE text IS NOT NULL)
SELECT f.fmt, b.n_docs, b.extracted_bytes, b.n_e, b.n_lines
FROM base b
CROSS JOIN (VALUES ('pdf'), ('docx'), ('rtf'), ('epub')) AS f(fmt)
ORDER BY f.fmt
"""
