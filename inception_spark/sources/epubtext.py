"""EPUB ingest — the packaged-book layer of the document family.

EPUB (IDPF/W3C, the public EPUB 3 spec) is an OCF container: a ZIP
whose FIRST entry must be an uncompressed ``mimetype`` file reading
``application/epub+zip``, a ``META-INF/container.xml`` pointing at the
package document (OPF), and the OPF's manifest (id → href) + spine
(ordered idrefs) naming the XHTML content chapters in READING ORDER.
Public-domain book corpora (Gutenberg et al.) ship exactly this; a
pretraining ingest fleet routes them next to PDF/DOCX/RTF.

What the oracle makes load-bearing here (vs. the simpler DOCX walk):

* the OCF handshake — a wrong/compressed/missing ``mimetype`` or a
  missing container.xml is a typed error, not a guess;
* indirection — container.xml → OPF path → manifest href resolution
  (hrefs are OPF-relative), each step typed on failure;
* SPINE ORDER — chapters are stored in the ZIP and listed in the
  manifest in DELIBERATELY SHUFFLED order; only the spine yields the
  original text, so an extractor that walks zip entries or manifest
  order hash-mismatches (the synthesis alternates chapter split
  points by doc_id so multi-chapter spines are the common case);
* XHTML unescape — ``&amp;/&lt;/&gt;`` round-trip through the XML
  layer, one ``<p>`` per line, chapters re-joined with a single
  newline: extraction must be byte-exact against documents.text.

Shares the PDF/DOCX/RTF closed-form oracle (identical per-shard
counters off ``documents.text``), the `fanout` scale discipline, and
the mutation-fuzz typed-error contract (tests/test_epubtext.py).
Reference scope: document ingest generalizes the reference's
plain-text reader (main.py batch path); everything else is this
repo's training-data surface.
"""

from __future__ import annotations

import io
import zipfile
from typing import Iterator
from xml.etree import ElementTree

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import fanout


class EpubFormatError(ValueError):
    """Typed error for corrupt/unsupported EPUB bytes."""


_MIMETYPE = b"application/epub+zip"

_CONTAINER_XML = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<container version="1.0" xmlns="urn:oasis:names:tc:opendocument:'
    'xmlns:container"><rootfiles>'
    '<rootfile full-path="OEBPS/content.opf" '
    'media-type="application/oebps-package+xml"/>'
    "</rootfiles></container>"
)

_CNT_NS = "urn:oasis:names:tc:opendocument:xmlns:container"
_OPF_NS = "http://www.idpf.org/2007/opf"
_XHTML_NS = "http://www.w3.org/1999/xhtml"


def _chapter_xhtml(lines: list[str]) -> bytes:
    root = ElementTree.Element(f"{{{_XHTML_NS}}}html")
    body = ElementTree.SubElement(root, f"{{{_XHTML_NS}}}body")
    for ln in lines:
        p = ElementTree.SubElement(body, f"{{{_XHTML_NS}}}p")
        p.text = ln
    return ElementTree.tostring(
        root, encoding="UTF-8", xml_declaration=True,
        default_namespace=_XHTML_NS,
    )


def encode_epub(doc_id: int, text: str) -> bytes:
    """A real EPUB: OCF zip (stored mimetype first), container.xml,
    OPF with manifest + spine, and the text split across 1-3 XHTML
    chapters at doc_id-rotated points.  Chapters are WRITTEN to the
    zip and LISTED in the manifest in shuffled order; only the spine
    is the reading order."""
    lines = text.split("\n")
    n_ch = min(3, 1 + (int(doc_id) + len(lines)) % 3, len(lines))
    cut = max(1, len(lines) // n_ch)
    chapters = [
        lines[i * cut : (i + 1) * cut] for i in range(n_ch - 1)
    ] + [lines[(n_ch - 1) * cut :]]
    names = [f"ch{c}.xhtml" for c in range(n_ch)]

    manifest_items = "".join(
        f'<item id="c{c}" href="{names[c]}" '
        'media-type="application/xhtml+xml"/>'
        # shuffled: reversed manifest listing
        for c in reversed(range(n_ch))
    )
    spine = "".join(f'<itemref idref="c{c}"/>' for c in range(n_ch))
    opf = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<package xmlns="{_OPF_NS}" version="3.0" '
        'unique-identifier="uid">'
        f'<metadata><dc:identifier xmlns:dc="http://purl.org/dc/'
        f'elements/1.1/" id="uid">doc-{doc_id}</dc:identifier>'
        "</metadata>"
        f"<manifest>{manifest_items}</manifest>"
        f"<spine>{spine}</spine></package>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr(
            zipfile.ZipInfo("mimetype"),
            _MIMETYPE,
            compress_type=zipfile.ZIP_STORED,
        )
        z.writestr("META-INF/container.xml", _CONTAINER_XML,
                   compress_type=zipfile.ZIP_DEFLATED)
        z.writestr("OEBPS/content.opf", opf,
                   compress_type=zipfile.ZIP_DEFLATED)
        # shuffled storage order too (reversed vs spine)
        for c in reversed(range(n_ch)):
            z.writestr(f"OEBPS/{names[c]}", _chapter_xhtml(chapters[c]),
                       compress_type=zipfile.ZIP_DEFLATED)
    return buf.getvalue()


def _read_member(z: zipfile.ZipFile, name: str) -> bytes:
    """Member read with the zip error taxonomy mapped to the typed
    contract: a corrupted deflate stream raises zlib.error, a bad CRC
    raises BadZipFile, and a truncated local header raises OSError —
    all structural corruption, none allowed to leak (fuzz-pinned)."""
    import zlib

    try:
        return z.read(name)
    except KeyError:
        raise  # caller maps missing members to its own message
    except (zipfile.BadZipFile, zlib.error, OSError, ValueError) as exc:
        # ValueError covers zipfile's bare "negative seek value" on a
        # corrupted local-header offset (fuzz-pinned)
        raise EpubFormatError(
            f"corrupt container member {name!r}: {exc}"
        ) from exc


def epub_to_text(blob: bytes) -> str:
    """OCF handshake → container.xml → OPF → spine-ordered chapter
    extraction (one line per <p>, chapters joined by newline)."""
    try:
        z = zipfile.ZipFile(io.BytesIO(blob))
    except zipfile.BadZipFile as exc:
        raise EpubFormatError(f"not a ZIP container: {exc}") from exc
    names = z.namelist()
    if not names or names[0] != "mimetype":
        raise EpubFormatError("first zip entry is not mimetype")
    info = z.getinfo("mimetype")
    if info.compress_type != zipfile.ZIP_STORED:
        raise EpubFormatError("mimetype entry must be stored")
    if _read_member(z, "mimetype") != _MIMETYPE:
        raise EpubFormatError("mimetype is not application/epub+zip")
    try:
        container = ElementTree.fromstring(
            _read_member(z, "META-INF/container.xml")
        )
    except KeyError as exc:
        raise EpubFormatError("missing META-INF/container.xml") from exc
    except ElementTree.ParseError as exc:
        raise EpubFormatError(f"malformed container.xml: {exc}") from exc
    rf = container.find(f".//{{{_CNT_NS}}}rootfile")
    if rf is None or not rf.get("full-path"):
        raise EpubFormatError("container.xml names no rootfile")
    opf_path = rf.get("full-path")
    try:
        opf = ElementTree.fromstring(_read_member(z, opf_path))
    except KeyError as exc:
        raise EpubFormatError(f"missing package doc {opf_path}") from exc
    except ElementTree.ParseError as exc:
        raise EpubFormatError(f"malformed OPF: {exc}") from exc
    base = opf_path.rsplit("/", 1)[0] + "/" if "/" in opf_path else ""
    hrefs = {
        it.get("id"): it.get("href")
        for it in opf.iter(f"{{{_OPF_NS}}}item")
    }
    chapters: list[str] = []
    spine = opf.find(f"{{{_OPF_NS}}}spine")
    if spine is None:
        raise EpubFormatError("OPF has no spine")
    for ref in spine.iter(f"{{{_OPF_NS}}}itemref"):
        idref = ref.get("idref")
        href = hrefs.get(idref)
        if not href:
            raise EpubFormatError(
                f"spine idref {idref!r} not in manifest"
            )
        try:
            xhtml = _read_member(z, base + href)
        except KeyError as exc:
            raise EpubFormatError(
                f"manifest href {href!r} missing from container"
            ) from exc
        try:
            root = ElementTree.fromstring(xhtml)
        except ElementTree.ParseError as exc:
            raise EpubFormatError(
                f"malformed chapter {href!r}: {exc}"
            ) from exc
        lines = [
            p.text or ""
            for p in root.iter(f"{{{_XHTML_NS}}}p")
        ]
        chapters.append("\n".join(lines))
    if not chapters:
        raise EpubFormatError("spine lists no chapters")
    return "\n".join(chapters)


# ---------------------------------------------------------------------------
# corpus pipeline — byte-identical contract with the PDF/DOCX family
# ---------------------------------------------------------------------------

_CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


def synth_epub_corpus(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    src = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).where(F.col("text").isNotNull())

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64").to_numpy(),
                    "payload": [
                        encode_epub(int(i), str(t))
                        for i, t in zip(pdf["doc_id"], pdf["text"])
                    ],
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


def epub_text_partials(
    corpus: DataFrame, *, n_shards: int = 4
) -> DataFrame:
    """Extract every book and fold the document-family counters —
    byte-identical contract with the PDF/DOCX/RTF partials, so all
    four formats share one closed-form oracle."""

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            agg: dict[int, list[int]] = {}
            for i, p in zip(pdf["doc_id"], pdf["payload"]):
                txt = epub_to_text(bytes(p))
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


def epub_text_from_partials(parts: DataFrame) -> DataFrame:
    return (
        parts.groupBy("shard")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("extracted_bytes").cast("long")
            .alias("extracted_bytes"),
            F.sum("n_e").cast("long").alias("n_e"),
            F.sum("n_lines").cast("long").alias("n_lines"),
        )
        .orderBy("shard")
    )


def epub_text_stats(docs: DataFrame) -> DataFrame:
    """REAL EPUB extraction, oracle-checked: every document packaged
    as a multi-chapter OCF book (shuffled storage + manifest order;
    spine is authoritative), extracted back byte-exactly, aggregated
    per shard.  Shares the document-family closed-form oracle."""
    return epub_text_from_partials(
        epub_text_partials(synth_epub_corpus(docs))
    )
