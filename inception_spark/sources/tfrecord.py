"""TFRecord shard ingest — binding-free, spec-transcribed.

TFRecord is the canonical container of TensorFlow-era training-data
drops (and the on-disk format of many public corpora's "tfds" builds).
No TensorFlow exists in this environment, so — like the Avro container
(`avrocontainer.py`) and the lz4/zstd/brotli codecs — the format is
transcribed from its PUBLIC documentation (TensorFlow's
``tf.data.TFRecordDataset`` format notes and the riegeli/crc32c docs):

* record framing = ``length: uint64 LE`` + ``masked_crc32c(length)``
  + ``data: length bytes`` + ``masked_crc32c(data)``, records
  back-to-back with no file header;
* the checksum is CRC32C (Castagnoli polynomial 0x82F63B78,
  reflected), masked as ``((crc >> 15) | (crc << 17)) + 0xA282EAD8``
  (mod 2³²) — the mask stops a CRC-of-CRC from looking valid;
* each record's payload here is a minimal protobuf wire-format message
  (the tf.train.Example shape without the 3-level Features nesting):
  field 1 = ``doc_id`` varint, field 2 = ``text`` length-delimited.
  Wire format per the public protobuf encoding spec: tag =
  ``(field_number << 3) | wire_type``, varints 7-bit little-endian.

Spark shape (the bz2shard/avrocontainer discipline): synthesis is
worker-side per shard key, decode walks records inside one Arrow batch
pass and folds mergeable counters; the only shuffle is the shard
groupBy.  At 100 TB: TFRecord is record-framed with no compression
context across records, so a shard can split at any record boundary —
with a byte-offset index, record-range-per-task; indexless files walk
sequentially per task exactly like the multistream fallback.  Per-task
memory = one record.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class TFRecordFormatError(ValueError):
    """Typed error for corrupt/truncated TFRecord bytes."""


# ---------------------------------------------------------------------------
# CRC32C (Castagnoli, reflected, poly 0x82F63B78) — table-driven
# ---------------------------------------------------------------------------


def _build_crc32c_table() -> np.ndarray:
    table = np.empty(256, dtype=np.uint32)
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
        table[n] = c
    return table


_CRC_TABLE = _build_crc32c_table()


def crc32c(data: bytes) -> int:
    """Pure-Python/numpy CRC32C.  Vectorization note: CRC is a serial
    recurrence, so the byte loop is Python — fine here because payloads
    cross this path once per record and the loop body is table lookups;
    the cross-check tests pin known vectors from the public CRC
    catalogue (check=0xE3069283)."""
    crc = 0xFFFFFFFF
    tab = _CRC_TABLE
    for b in data:
        crc = (crc >> 8) ^ int(tab[(crc ^ b) & 0xFF])
    return crc ^ 0xFFFFFFFF


def masked_crc32c(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# protobuf wire format (minimal: varint + length-delimited fields)
# ---------------------------------------------------------------------------


def _emit_varint(out: bytearray, n: int) -> None:
    if n < 0:
        n &= (1 << 64) - 1  # proto int64 negatives are 10-byte varints
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    shift, acc = 0, 0
    while True:
        if pos >= len(data):
            raise TFRecordFormatError("truncated varint")
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 70:
            raise TFRecordFormatError("varint too long")
    return acc, pos


def encode_doc_message(doc_id: int, text: str) -> bytes:
    """field 1 (varint) = doc_id, field 2 (len-delim) = utf-8 text."""
    out = bytearray()
    out.append((1 << 3) | 0)  # tag: field 1, varint
    _emit_varint(out, doc_id)
    raw = text.encode("utf-8")
    out.append((2 << 3) | 2)  # tag: field 2, length-delimited
    _emit_varint(out, len(raw))
    out += raw
    return bytes(out)


def decode_doc_message(data: bytes) -> tuple[int, bytes]:
    """Parse the (doc_id, text) message; unknown fields are skipped by
    wire type (the proto forward-compat rule), unknown wire types
    raise."""
    doc_id, text, pos = None, None, 0
    while pos < len(data):
        tag, pos = _read_varint(data, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            val, pos = _read_varint(data, pos)
            if field == 1:
                if val >= 1 << 63:
                    val -= 1 << 64
                doc_id = val
        elif wire == 2:
            n, pos = _read_varint(data, pos)
            if n < 0 or pos + n > len(data):
                raise TFRecordFormatError("truncated length-delimited")
            if field == 2:
                text = data[pos : pos + n]
            pos += n
        elif wire == 1:
            pos += 8
        elif wire == 5:
            pos += 4
        else:
            raise TFRecordFormatError(f"unsupported wire type {wire}")
        if pos > len(data):
            raise TFRecordFormatError("field overruns message")
    if doc_id is None or text is None:
        raise TFRecordFormatError("message missing doc_id/text")
    return doc_id, text


# ---------------------------------------------------------------------------
# record framing
# ---------------------------------------------------------------------------


def write_tfrecords(payloads: list[bytes]) -> bytes:
    out = bytearray()
    for p in payloads:
        hdr = struct.pack("<Q", len(p))
        out += hdr
        out += struct.pack("<I", masked_crc32c(hdr))
        out += p
        out += struct.pack("<I", masked_crc32c(p))
    return bytes(out)


def iter_tfrecords(blob: bytes) -> Iterator[bytes]:
    """Walk the framing record by record, verifying BOTH masked CRCs
    (a flipped payload bit or a desynced length is caught here, not in
    a downstream parse)."""
    pos, n = 0, len(blob)
    while pos < n:
        if pos + 12 > n:
            raise TFRecordFormatError("truncated record header")
        hdr = blob[pos : pos + 8]
        (want_hcrc,) = struct.unpack_from("<I", blob, pos + 8)
        if masked_crc32c(hdr) != want_hcrc:
            raise TFRecordFormatError("length CRC mismatch")
        (length,) = struct.unpack("<Q", hdr)
        pos += 12
        if pos + length + 4 > n:
            raise TFRecordFormatError("truncated record payload")
        data = blob[pos : pos + length]
        (want_dcrc,) = struct.unpack_from("<I", blob, pos + length)
        if masked_crc32c(data) != want_dcrc:
            raise TFRecordFormatError("payload CRC mismatch")
        yield data
        pos += length + 4


# ---------------------------------------------------------------------------
# Spark operators (partial/finalize, the shard-source discipline)
# ---------------------------------------------------------------------------

_CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.LongType(), False),
        T.StructField("n_records", T.LongType(), False),
        T.StructField("blob", T.BinaryType(), False),
    ]
)


def synth_tfrecord_corpus(
    docs: DataFrame,
    *,
    n_shards: int = 4,
    n_subshards: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-shard TFRecord blob: every document becomes one proto
    message record, records framed in doc_id order (shard = doc_id mod
    n_shards), worker-side.

    Each logical shard is built as ``n_subshards`` independent
    sub-blobs (multiple rows sharing a ``shard`` key — the
    synth_mbox_corpus discipline): the per-record Python encode runs
    at shard x sub parallelism instead of ``n_shards`` tasks, and the
    stats fold per shard so sub-blob boundaries are invisible to the
    result.  The group exchange is pinned with an EXPLICIT-count
    repartition on the group keys so AQE's coalescing cannot fuse the
    build back to a handful of tasks (guide §2.5)."""
    if n_subshards is None:
        par = docs.sparkSession.sparkContext.defaultParallelism
        n_subshards = max(1, (int(par) + n_shards - 1) // n_shards)
    src = (
        docs.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        )
        .where(F.col("text").isNotNull())
        .withColumn(
            "shard", (F.col("doc_id") % F.lit(int(n_shards))).cast("long")
        )
        .withColumn(
            "subshard",
            F.expr(
                f"CAST((doc_id DIV {int(n_shards)}) "
                f"% {int(n_subshards)} AS BIGINT)"
            ),
        )
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        blob = write_tfrecords(
            [
                encode_doc_message(int(i), str(t))
                for i, t in zip(pdf["doc_id"], pdf["text"])
            ]
        )
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])],
                "n_records": [len(pdf)],
                "blob": [blob],
            }
        )

    n_groups = int(n_shards) * int(n_subshards)
    return (
        src.repartition(n_groups, "shard", "subshard")
        .groupBy("shard", "subshard")
        .applyInPandas(build, _CORPUS_SCHEMA)
    )


_STATS_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.LongType(), False),
        T.StructField("n_records", T.LongType(), False),
        T.StructField("sum_doc_id", T.LongType(), False),
        T.StructField("decoded_bytes", T.LongType(), False),
        T.StructField("n_t", T.LongType(), False),
    ]
)


def tfrecord_partials(corpus: DataFrame) -> DataFrame:
    """Walk every blob's records (CRC-verified framing + proto parse)
    and fold per-shard counters.  ``sum_doc_id`` proves the varint
    decode, ``n_t`` (letter 't' over decoded text) proves the payload
    slice — neither is producible without a correct walk."""

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sh, nr, blob in zip(
                pdf["shard"], pdf["n_records"], pdf["blob"]
            ):
                n, sid, nbytes, n_t = 0, 0, 0, 0
                for rec in iter_tfrecords(bytes(blob)):
                    doc_id, raw = decode_doc_message(rec)
                    n += 1
                    sid += doc_id
                    nbytes += len(raw)
                    n_t += raw.count(b"t")
                if n != int(nr):
                    raise TFRecordFormatError(
                        f"shard {sh}: walked {n} records, wrote {nr}"
                    )
                rows.append(
                    {
                        "shard": int(sh),
                        "n_records": n,
                        "sum_doc_id": sid,
                        "decoded_bytes": nbytes,
                        "n_t": n_t,
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return corpus.mapInPandas(walk, _STATS_SCHEMA)


def tfrecord_from_partials(parts: DataFrame) -> DataFrame:
    return (
        parts.groupBy("shard")
        .agg(
            F.sum("n_records").cast("long").alias("n_records"),
            F.sum("sum_doc_id").cast("long").alias("sum_doc_id"),
            F.sum("decoded_bytes").cast("long").alias("decoded_bytes"),
            F.sum("n_t").cast("long").alias("n_t"),
        )
        .orderBy("shard")
    )


def tfrecord_ingest_stats(docs: DataFrame) -> DataFrame:
    """REAL TFRecord decode, oracle-checked: frame every document as a
    proto message record in per-shard blobs, walk them back (masked
    CRC32C verified per record) and aggregate.  The oracle reads the
    same stats straight off ``documents``."""
    return tfrecord_from_partials(
        tfrecord_partials(synth_tfrecord_corpus(docs))
    )


def tfrecord_stats_sql(*, n_shards: int = 4) -> str:
    """DuckDB twin — strlen is BYTES, and 0x74 't' never occurs inside
    a UTF-8 continuation byte."""
    return f"""
SELECT CAST(doc_id % {int(n_shards)} AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_records,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(SUM(strlen(text)) AS BIGINT) AS decoded_bytes,
       CAST(SUM(strlen(text) - strlen(replace(text, 't', '')))
            AS BIGINT) AS n_t
FROM documents
WHERE text IS NOT NULL
GROUP BY 1
ORDER BY 1
"""
