"""WARC (Web ARChive, ISO 28500) source — the Common-Crawl ingestion
path for a web-scale training-data pipeline.

The reference has no web-archive surface (its sources are JSON/text —
SURVEY.md §2.2); this extends the engine per the build brief's
training-pipeline mandate.  Format knowledge is from the public WARC/1.1
specification (ISO 28500 / IIPC warc-specifications) and the Common
Crawl dataset layout; the parser is written from scratch on stdlib
``zlib`` only.

Scale shape: WARC segments are independently parseable files (Common
Crawl ships ~1 GB gzipped segments, tens of thousands per crawl), so the
natural Spark decomposition is ONE TASK PER FILE — the same shape every
published Common Crawl Spark pipeline uses (e.g. cc-pyspark).  Files
load through the built-in ``binaryFile`` source and records stream out
of an Arrow-batched ``mapInPandas``, so a 100 TB crawl parallelizes
across however many segment files it has, with no shuffle.  The .gz
framing (one gzip member per record, members concatenated) decompresses
incrementally — a segment never needs its INFLATED size in memory at
once, only the compressed bytes binaryFile hands the task.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType(), False),
        T.StructField("record_offset", T.LongType(), False),
        T.StructField("warc_type", T.StringType(), True),
        T.StructField("record_id", T.StringType(), True),
        T.StructField("target_uri", T.StringType(), True),
        T.StructField("warc_date", T.StringType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("content_length", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


class WarcFormatError(ValueError):
    """Raised on a structurally invalid WARC record."""


def _gunzip_members(data: bytes) -> bytes:
    """Inflate a stream of CONCATENATED gzip members (the WARC .gz
    convention: one member per record) into one plain-bytes stream."""
    out = []
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        out.append(d.decompress(data[pos:]))
        out.append(d.flush())
        tail = d.unused_data
        if not tail:
            break
        pos = len(data) - len(tail)
    return b"".join(out)


def parse_warc_records(
    data: bytes, *, strict: bool = True
) -> Iterator[dict]:
    """Yield one dict per WARC record from raw (already-inflated) bytes.

    A record is ``WARC/1.x CRLF`` + ``Name: value CRLF`` header block +
    empty line + exactly ``Content-Length`` payload bytes + two CRLFs.
    Header names are case-insensitive per the spec.  ``strict=False``
    stops at the first malformed record instead of raising (quarantine
    semantics for truncated segments)."""
    if data[:2] == b"\x1f\x8b":  # gzipped segment
        data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            return
        start = pos
        if not data.startswith(b"WARC/", pos):
            if strict:
                raise WarcFormatError(
                    f"expected WARC/ version line at offset {pos}"
                )
            return
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            if strict:
                raise WarcFormatError("unterminated WARC header block")
            return
        headers: dict[str, str] = {}
        lines = data[pos:hdr_end].split(b"\r\n")
        for line in lines[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("ascii", "replace")] = (
                v.strip().decode("utf-8", "replace")
            )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            if strict:
                raise WarcFormatError(
                    f"missing/invalid Content-Length at offset {start}"
                )
            return
        body_start = hdr_end + 4
        if body_start + length > n:
            if strict:
                raise WarcFormatError(
                    f"truncated payload at offset {start}"
                )
            return
        yield {
            "record_offset": start,
            "warc_type": headers.get("warc-type"),
            "record_id": headers.get("warc-record-id"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "content_length": length,
            "payload": data[body_start : body_start + length],
        }
        pos = body_start + length


def read_warc(
    spark: SparkSession,
    path: str,
    *,
    record_types: list[str] | None = None,
    max_payload_bytes: int | None = None,
    strict: bool = True,
) -> DataFrame:
    """WARC directory/glob → one row per record (``WARC_SCHEMA``).

    * ``record_types`` — keep only these WARC-Type values (typical:
      ``["response"]`` — Common Crawl segments are mostly request/
      response/metadata triples and only responses carry page bodies).
      Filtering INSIDE the parser task avoids materializing unwanted
      payload bytes into Arrow batches at all.
    * ``max_payload_bytes`` — truncate oversized payloads (a single
      outlier page must not blow the Arrow batch budget).
    * ``strict=False`` — per-file quarantine semantics: a malformed or
      truncated segment yields its valid prefix instead of failing the
      task (the bad-UTF8 contract of ``read_documents_text``).

    Downstream composition is ordinary DataFrame code: filter
    content_type, decode payload, ``html_to_text`` the markup, feed the
    cleaning/dedup/quality operators."""
    import pandas as pd

    keep = set(record_types) if record_types is not None else None

    def mapper(batches):
        for pdf in batches:
            for fname, content in zip(pdf["path"], pdf["content"]):
                rows = []
                for rec in parse_warc_records(bytes(content), strict=strict):
                    if keep is not None and rec["warc_type"] not in keep:
                        continue
                    if (
                        max_payload_bytes is not None
                        and len(rec["payload"]) > max_payload_bytes
                    ):
                        rec["payload"] = rec["payload"][:max_payload_bytes]
                    rows.append({"warc_file": fname, **rec})
                if rows:
                    yield pd.DataFrame(rows)

    files = spark.read.format("binaryFile").load(path)
    return files.select("path", "content").mapInPandas(mapper, WARC_SCHEMA)
