"""PDF text extraction — binding-free, spec-transcribed (ISO 32000).

PDFs are one of the largest text sources in modern pretraining corpora
and the one conspicuously missing from this repo's source family.  No
PDF library exists in this environment, so — like the Avro/TFRecord/
codec family — the subset needed for TEXT EXTRACTION is transcribed
from the public PDF specification (ISO 32000-1 / the Adobe PDF 1.7
reference): indirect objects, object dictionaries, stream objects with
``/Length`` and ``/FlateDecode``, and the content-stream text operators
``BT``/``ET``, ``Tj``, ``'``, ``TJ`` with literal-string escapes
(backslash, octal) and hex strings.

Scope honesty (the MP3/MP4 discipline): this extracts text from PDFs
whose strings are single-byte encoded (standard fonts, no CID/Type0
composite-font CMaps) and whose content streams are plain or
FlateDecode.  Anything else — encrypted files, object streams
(``/ObjStm``), LZW/DCT filters, composite fonts — raises the typed
:class:`PdfFormatError` rather than silently extracting garbage; a
production path routes those to a real renderer.

Spark shape: the corpus synthesizes worker-side (every document's text
becomes a real 1-page PDF with xref table and Flate-compressed content
stream), extraction walks object tables inside one Arrow batch pass,
and the only shuffle is the shard groupBy.  At 100 TB: one PDF per
row, per-task memory = one file image + one inflated content stream;
PDFs never split (xref is global), so parallelism is per-file — which
is exactly how production PDF ingest fleets shard.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from inception_spark.sources import fanout


class PdfFormatError(ValueError):
    """Typed error for corrupt/unsupported PDF bytes."""


# ---------------------------------------------------------------------------
# writer (synthesis side): classic xref-table layout, 1 page, Helvetica
# ---------------------------------------------------------------------------


def _escape_pdf_string(raw: bytes) -> bytes:
    out = bytearray()
    for b in raw:
        if b in (0x5C, 0x28, 0x29):  # backslash, ( , )
            out += b"\\" + bytes([b])
        elif 32 <= b <= 126:
            out.append(b)
        else:
            out += b"\\%03o" % b  # octal escape for non-printables
    return bytes(out)


def encode_pdf(text: str, *, compress: bool = True) -> bytes:
    """One-page PDF showing ``text`` as a sequence of Tj lines.  Text
    is Latin-1-encodable content (the single-byte-font contract);
    other codepoints are transcribed as octal-escaped UTF-8 bytes —
    the round trip is byte-exact either way."""
    lines = text.split("\n") or [""]
    content = bytearray(b"BT /F1 11 Tf 36 790 Td 13 TL\n")
    for k, ln in enumerate(lines):
        if k:
            content += b"T*\n"  # line advance BETWEEN lines only
        content += b"(" + _escape_pdf_string(ln.encode("utf-8")) + b") Tj\n"
    content += b"ET"
    body = bytes(content)
    filt = b""
    if compress:
        body = zlib.compress(body, 6)
        filt = b" /Filter /FlateDecode"

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length %d%s >>\nstream\n%s\nendstream"
        % (len(body), filt, body),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = []
    for i, o in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i
        out += o
        out += b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


def _parse_objects(blob: bytes) -> dict[int, tuple[bytes, bytes | None]]:
    """→ {obj_num: (dict/body bytes, stream bytes or None)}.  Linear
    object scan rather than xref-driven lookup: tolerant of the
    incremental-update files real crawls contain (later definitions win,
    matching the spec's 'last xref section takes precedence').

    The scan is CURSOR-DRIVEN: after each object it resumes past that
    object's full extent — using ``/Length`` to jump over the stream
    body — so PDF structural tokens INSIDE an uncompressed content
    stream ('12 0 obj', 'endobj', 'endstream') are data, never
    structure.  A finditer over raw bytes would misparse exactly those
    documents (ADVICE r12: text containing 'see 12 0 obj here' failed
    the plain-stream round trip)."""
    objs: dict[int, tuple[bytes, bytes | None]] = {}
    pos = 0
    while True:
        m = _OBJ_RE.search(blob, pos)
        if m is None:
            break
        num = int(m.group(1))
        s_at = blob.find(b"stream", m.end())
        e_at = blob.find(b"endobj", m.end())
        if e_at < 0:
            raise PdfFormatError(f"object {num} missing endobj")
        stream = None
        if 0 <= s_at < e_at:
            head = blob[m.end() : s_at]
            data_at = s_at + len(b"stream")
            if blob[data_at : data_at + 2] == b"\r\n":
                data_at += 2
            elif blob[data_at : data_at + 1] == b"\n":
                data_at += 1
            # /Length gives the EXACT byte count — never trim by
            # scanning for 'endstream', because payloads (compressed OR
            # plain text) legitimately contain/end in those bytes
            lm = re.search(rb"/Length\s+(\d+)", head)
            if lm:
                want = int(lm.group(1))
                stream = blob[data_at : data_at + want]
                if len(stream) < want:
                    raise PdfFormatError(
                        f"object {num} stream shorter than /Length"
                    )
                after = data_at + want
            else:
                # no /Length: first endstream wins — ambiguous when the
                # data itself contains the token, which only /Length can
                # disambiguate (scope honesty: typed error, not garbage)
                e = blob.find(b"endstream", data_at)
                if e < 0 or e > blob.find(b"endobj", data_at):
                    raise PdfFormatError(
                        f"object {num} stream not terminated"
                    )
                stream = blob[data_at:e]
                # spec mandates an EOL before endstream; strip ONE
                if stream[-2:] == b"\r\n":
                    stream = stream[:-2]
                elif stream[-1:] in (b"\n", b"\r"):
                    stream = stream[:-1]
                after = e
            e_at = blob.find(b"endobj", after)
            if e_at < 0:
                raise PdfFormatError(f"object {num} missing endobj")
            body = head
        else:
            body = blob[m.end() : e_at]
        objs[num] = (body, stream)
        pos = e_at + len(b"endobj")
    if not objs:
        raise PdfFormatError("no objects found (not a PDF body)")
    return objs


def _decode_stream(head: bytes, stream: bytes) -> bytes:
    if b"/ObjStm" in head:
        raise PdfFormatError("object streams (/ObjStm) unsupported")
    if b"/Filter" not in head:
        return stream
    if b"/FlateDecode" in head:
        try:
            return zlib.decompress(stream)
        except zlib.error as exc:
            raise PdfFormatError(f"bad Flate stream: {exc}") from exc
    raise PdfFormatError("unsupported stream filter (only FlateDecode)")


def _parse_pdf_string(data: bytes, pos: int) -> tuple[bytes, int]:
    """Literal string at data[pos] == '(' → (raw bytes, end pos)."""
    assert data[pos : pos + 1] == b"("
    out = bytearray()
    depth = 1
    i = pos + 1
    n = len(data)
    while i < n:
        c = data[i]
        if c == 0x5C:  # backslash
            if i + 1 >= n:
                raise PdfFormatError("dangling escape in string")
            nxt = data[i + 1]
            if 0x30 <= nxt <= 0x37:  # octal, up to 3 digits
                j = i + 1
                val = 0
                while j < min(i + 4, n) and 0x30 <= data[j] <= 0x37:
                    val = val * 8 + (data[j] - 0x30)
                    j += 1
                out.append(val & 0xFF)
                i = j
                continue
            mapped = {
                0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08,
                0x66: 0x0C, 0x28: 0x28, 0x29: 0x29, 0x5C: 0x5C,
            }.get(nxt)
            if mapped is not None:
                out.append(mapped)
            elif nxt in (0x0A, 0x0D):
                pass  # line continuation
            else:
                out.append(nxt)  # spec: backslash before other chars drops
            i += 2
            continue
        if c == 0x28:
            depth += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
        out.append(c)
        i += 1
    raise PdfFormatError("unterminated literal string")


def _parse_hex_string(data: bytes, pos: int) -> tuple[bytes, int]:
    end = data.find(b">", pos)
    if end < 0:
        raise PdfFormatError("unterminated hex string")
    hx = bytes(c for c in data[pos + 1 : end] if not chr(c).isspace())
    if len(hx) % 2:
        hx += b"0"  # spec: odd final digit implies trailing 0
    try:
        return bytes.fromhex(hx.decode("ascii")), end + 1
    except ValueError as exc:
        raise PdfFormatError(f"bad hex string: {exc}") from exc


def extract_content_text(content: bytes) -> bytes:
    """Walk a content stream and concatenate the string operands of the
    text-showing operators (Tj, ', TJ); T* / ' line advances append a
    newline.  Strings outside BT/ET (e.g. in marked-content properties)
    are ignored."""
    out = bytearray()
    i, n = 0, len(content)
    in_text = False
    pending: list[bytes] = []

    def flush(op: bytes) -> None:
        nonlocal pending
        if not in_text:
            pending = []
            return
        if op in (b"Tj", b"TJ"):
            for s in pending:
                out.extend(s)
        elif op == b"'":
            out.append(0x0A)
            for s in pending:
                out.extend(s)
        elif op == b"T*":
            out.append(0x0A)
        pending = []

    while i < n:
        c = content[i : i + 1]
        if c == b"(":
            s, i = _parse_pdf_string(content, i)
            pending.append(s)
            continue
        if c == b"<" and content[i : i + 2] != b"<<":
            s, i = _parse_hex_string(content, i)
            pending.append(s)
            continue
        if c.isspace():
            i += 1
            continue
        # operator / operand token
        j = i
        while j < n and not content[j : j + 1].isspace() and content[
            j : j + 1
        ] not in (b"(", b"<", b"[", b"]"):
            j += 1
        if j == i:
            i += 1  # [ ] delimiters of TJ arrays
            continue
        tok = content[i:j]
        if tok == b"BT":
            in_text = True
        elif tok == b"ET":
            in_text = False
            pending = []
        elif tok in (b"Tj", b"TJ", b"'", b"T*"):
            flush(tok)
        elif tok[:1].isalpha() or tok[:1] in (b"'", b'"'):
            pending = [] if not tok[0:1].isdigit() else pending
        i = j
    return bytes(out)


def pdf_to_text(blob: bytes) -> str:
    """Full extraction: object parse → every content stream (any object
    whose head lacks /Type but carries a stream, plus explicitly
    referenced /Contents) → filter decode → text-operator walk.  For
    the 1-page synthesis layout this is exactly the document text."""
    if not blob.startswith(b"%PDF-"):
        raise PdfFormatError("bad magic (not a PDF)")
    # the /Encrypt sniff is confined to the trailer DICTIONARY — a raw
    # substring probe over the file tail would false-positive on
    # document text containing '/Encrypt' inside an uncompressed
    # content stream (ADVICE r12)
    t = blob.rfind(b"trailer")
    if t >= 0 and b"/Encrypt" in blob[t:]:
        raise PdfFormatError("encrypted PDFs unsupported")
    objs = _parse_objects(blob)
    pieces = []
    for num in sorted(objs):
        head, stream = objs[num]
        if stream is None:
            continue
        if b"/Font" in head or b"/XObject" in head or b"/Image" in head:
            continue
        txt = extract_content_text(_decode_stream(head, stream))
        if txt:
            pieces.append(txt)
    return b"\n".join(pieces).decode("utf-8", errors="strict")


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------

_CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


def synth_pdf_corpus(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One real 1-page PDF per document (odd ids Flate-compressed, even
    ids plain streams — both filter paths stay load-bearing),
    worker-side."""
    src = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).where(F.col("text").isNotNull())

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            payloads = [
                encode_pdf(str(t), compress=bool(int(i) % 2))
                for i, t in zip(ids, pdf["text"])
            ]
            yield pd.DataFrame(
                {"doc_id": ids.to_numpy(), "payload": payloads}
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


def pdf_text_partials(corpus: DataFrame, *, n_shards: int = 4) -> DataFrame:
    """Extract every PDF's text and fold per-shard counters.  The
    extracted byte count and letter count are unproducible without a
    correct object walk + inflate + string unescape; ``n_lines`` pins
    the Tj/T* line structure (one per original newline-separated
    line).  Mergeable sums."""

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            agg: dict[int, list[int]] = {}
            for i, p in zip(pdf["doc_id"], pdf["payload"]):
                txt = pdf_to_text(bytes(p))
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


def pdf_text_from_partials(parts: DataFrame) -> DataFrame:
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


def pdf_text_stats(docs: DataFrame) -> DataFrame:
    """REAL PDF text extraction, oracle-checked: render every document
    into a 1-page PDF (xref table, Flate-compressed content streams on
    odd ids), extract the text back through the spec-transcribed
    object/stream/operator walk, and aggregate per shard.  The oracle
    reads the same stats straight off ``documents.text`` — an escape,
    inflate, operator, or line-structure defect hash-mismatches."""
    return pdf_text_from_partials(pdf_text_partials(synth_pdf_corpus(docs)))


def pdf_text_stats_sql(*, n_shards: int = 4) -> str:
    """DuckDB twin.  ``n_lines`` counts newline-separated lines (the
    writer emits one Tj + T* per line and extraction rejoins with
    LF)."""
    return f"""
SELECT CAST(doc_id % {int(n_shards)} AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(strlen(text)) AS BIGINT) AS extracted_bytes,
       CAST(SUM(strlen(text) - strlen(replace(text, 'e', '')))
            AS BIGINT) AS n_e,
       CAST(SUM(CASE WHEN strlen(text) = 0 THEN 0
                ELSE strlen(text) - strlen(replace(text, chr(10), '')) + 1
                END) AS BIGINT) AS n_lines
FROM documents
WHERE text IS NOT NULL
GROUP BY 1
ORDER BY 1
"""
