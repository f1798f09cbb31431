"""tf.train.Example ingest — nested protobuf wire format, from scratch.

The TFRecord reader (``sources/tfrecord.py``) proved the FRAMING layer
(length + masked CRC32C) over flat two-field messages.  Real TFRecord
corpora don't carry flat messages: they carry ``tf.train.Example`` —
the de-facto interchange schema for ML training shards — whose wire
form exercises everything the flat codec didn't:

* nested length-delimited submessages 4 deep
  (Example → Features → map entry → Feature → value list),
* the proto map encoding (``map<string, Feature>`` = repeated
  key/value entry messages, order not guaranteed),
* PACKED repeated primitives (Int64List varints, FloatList fixed32
  floats inside one length-delimited run),
* unknown-field skipping at every nesting level (the forward-compat
  rule: skip by wire type, never by schema guess).

The schema transcribed here is the public one
(tensorflow/core/example/example.proto + feature.proto):

    message Example   { Features features = 1; }
    message Features  { map<string, Feature> feature = 1; }
    message Feature   { oneof kind { BytesList bytes_list = 1;
                                     FloatList float_list = 2;
                                     Int64List int64_list = 3; } }
    message BytesList { repeated bytes value = 1; }
    message FloatList { repeated float value = 1 [packed = true]; }
    message Int64List { repeated int64 value = 1 [packed = true]; }

Each document synthesizes to an Example with four features — "doc_id"
(int64), "text" (bytes), "wlens" (packed int64 word lengths), and
"density" (packed float32 ``n_chars/64`` — exactly representable, so
the float path is hash-exact) — plus an unknown feature and an unknown
top-level field the decoder must skip.  Every folded stat is a closed
form over ``documents.text`` (sum of word lengths == chars minus
spaces; the float sum re-scales to an integer), so a slip in varint
continuation, packed-run bounds, map-entry framing, or float32 byte
order is a value-hash mismatch — mirrored by the same mutation-fuzz
contract as the other containers (``tests/test_protoexample.py``).

Spark shape: the shard-source discipline (`sources/__init__` fanout →
applyInPandas shard build → ONE mapInPandas walk → shard-key rollup);
the decode is pure Python over bytes, priced with the same
convert-once routing rule as the codec family in SCALING.md.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .tfrecord import (
    TFRecordFormatError,
    _emit_varint,
    _read_varint,
    iter_tfrecords,
    write_tfrecords,
)


class ProtoExampleError(TFRecordFormatError):
    """Typed error for malformed Example messages (subclass of the
    framing error so callers can catch either layer)."""


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def _len_delim(field: int, payload: bytes) -> bytes:
    out = bytearray()
    out.append((field << 3) | 2)
    _emit_varint(out, len(payload))
    out += payload
    return bytes(out)


def _bytes_list(values: list[bytes]) -> bytes:
    out = bytearray()
    for v in values:
        out += _len_delim(1, v)
    return bytes(out)


def _int64_list(values: list[int]) -> bytes:
    packed = bytearray()
    for v in values:
        _emit_varint(packed, v)
    return _len_delim(1, bytes(packed))


def _float_list(values: list[float]) -> bytes:
    return _len_delim(1, struct.pack(f"<{len(values)}f", *values))


def _feature(kind_field: int, list_payload: bytes) -> bytes:
    return _len_delim(kind_field, list_payload)


def _map_entry(key: str, feature_payload: bytes) -> bytes:
    entry = _len_delim(1, key.encode("utf-8")) + _len_delim(
        2, feature_payload
    )
    return _len_delim(1, entry)


def encode_example(doc_id: int, text: str) -> bytes:
    """One document → Example bytes (with deliberate unknown content
    the decoder must skip: an "extra" feature and a top-level varint
    field 15)."""
    raw = text.encode("utf-8")
    wlens = [len(w.encode("utf-8")) for w in text.split(" ")]
    feats = (
        _map_entry("doc_id", _feature(3, _int64_list([doc_id])))
        + _map_entry("text", _feature(1, _bytes_list([raw])))
        + _map_entry("wlens", _feature(3, _int64_list(wlens)))
        + _map_entry(
            "density", _feature(2, _float_list([len(raw) / 64.0]))
        )
        + _map_entry("extra", _feature(3, _int64_list([7])))
    )
    out = bytearray(_len_delim(1, feats))  # Example.features
    out.append((15 << 3) | 0)  # unknown top-level field, varint
    _emit_varint(out, 42)
    return bytes(out)


# ---------------------------------------------------------------------------
# decode (strict bounds at every level)
# ---------------------------------------------------------------------------


def _iter_fields(data: bytes):
    """Yield (field, wire, value) where value is int (wire 0), bytes
    (wire 2), or raw bytes (wire 1/5).  Bounds-checked; unknown wire
    types are typed errors."""
    pos = 0
    while pos < len(data):
        tag, pos = _read_varint(data, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            val, pos = _read_varint(data, pos)
            yield field, wire, val
        elif wire == 2:
            n, pos = _read_varint(data, pos)
            if pos + n > len(data):
                raise ProtoExampleError(
                    "length-delimited field overruns message"
                )
            yield field, wire, data[pos : pos + n]
            pos += n
        elif wire == 5:
            if pos + 4 > len(data):
                raise ProtoExampleError("truncated fixed32")
            yield field, wire, data[pos : pos + 4]
            pos += 4
        elif wire == 1:
            if pos + 8 > len(data):
                raise ProtoExampleError("truncated fixed64")
            yield field, wire, data[pos : pos + 8]
            pos += 8
        else:
            raise ProtoExampleError(f"unsupported wire type {wire}")


def _decode_feature(data: bytes):
    """Feature → ('bytes'|'float'|'int64', values).  The oneof rule:
    exactly one kind field must be present."""
    kind = None
    for field, wire, val in _iter_fields(data):
        if field == 1 and wire == 2:  # BytesList
            vals = [
                v
                for f, w, v in _iter_fields(val)
                if f == 1 and w == 2
            ]
            kind = ("bytes", vals)
        elif field == 2 and wire == 2:  # FloatList (packed)
            floats: list[float] = []
            for f, w, v in _iter_fields(val):
                if f == 1 and w == 2:
                    if len(v) % 4:
                        raise ProtoExampleError(
                            "packed float run not a multiple of 4"
                        )
                    floats += list(
                        struct.unpack(f"<{len(v) // 4}f", v)
                    )
                elif f == 1 and w == 5:  # unpacked fallback is legal
                    floats.append(struct.unpack("<f", v)[0])
            kind = ("float", floats)
        elif field == 3 and wire == 2:  # Int64List (packed)
            ints: list[int] = []
            for f, w, v in _iter_fields(val):
                if f == 1 and w == 2:
                    p = 0
                    while p < len(v):
                        n, p = _read_varint(v, p)
                        if n >= 1 << 63:
                            n -= 1 << 64
                        ints.append(n)
                elif f == 1 and w == 0:  # unpacked fallback
                    n = v
                    if n >= 1 << 63:
                        n -= 1 << 64
                    ints.append(n)
            kind = ("int64", ints)
        # unknown fields: skipped by _iter_fields' wire handling
    if kind is None:
        raise ProtoExampleError("Feature with no kind set")
    return kind


def decode_example(data: bytes) -> dict[str, tuple[str, list]]:
    """Example bytes → {feature_name: (kind, values)}.  Unknown
    top-level fields and unknown feature names pass through the
    forward-compat rule (skipped / kept by name respectively)."""
    feats: dict[str, tuple[str, list]] = {}
    saw_features = False
    for field, wire, val in _iter_fields(data):
        if field != 1 or wire != 2:
            continue  # unknown top-level field: skip
        saw_features = True
        for f2, w2, entry in _iter_fields(val):
            if f2 != 1 or w2 != 2:
                continue
            key, feature = None, None
            for f3, w3, v3 in _iter_fields(entry):
                if f3 == 1 and w3 == 2:
                    try:
                        key = v3.decode("utf-8")
                    except UnicodeDecodeError as exc:
                        raise ProtoExampleError(
                            f"feature key not UTF-8: {exc}"
                        ) from exc
                elif f3 == 2 and w3 == 2:
                    feature = v3
            if key is None or feature is None:
                raise ProtoExampleError(
                    "map entry missing key or value"
                )
            feats[key] = _decode_feature(feature)
    if not saw_features:
        raise ProtoExampleError("Example has no features field")
    return feats


# ---------------------------------------------------------------------------
# corpus synthesis + the one-pass walk
# ---------------------------------------------------------------------------

_CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.LongType(), False),
        T.StructField("n_records", T.LongType(), False),
        T.StructField("blob", T.BinaryType(), False),
    ]
)


def synth_tfexample_corpus(
    docs: DataFrame, *, n_shards: int = 4,
    n_subshards: int | None = None,
) -> DataFrame:
    """Each logical shard is built as ``n_subshards`` independent
    sub-blobs (the synth_mbox_corpus discipline): the per-record proto
    encode runs at shard x sub parallelism instead of ``n_shards``
    tasks — the earlier upstream ``fanout`` bought nothing because the
    4-key groupBy immediately re-fused the build to 4 tasks (guide
    §2.5).  Stats fold per shard, so sub-blob boundaries are invisible
    to the result; the explicit-count repartition pins the exchange
    against AQE coalescing."""
    if n_subshards is None:
        par = docs.sparkSession.sparkContext.defaultParallelism
        n_subshards = max(1, (int(par) + n_shards - 1) // n_shards)
    src = (
        docs.select("doc_id", "text").where(F.col("text").isNotNull())
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
        payloads = [
            encode_example(int(i), str(t))
            for i, t in zip(pdf["doc_id"], pdf["text"])
        ]
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])],
                "n_records": [len(payloads)],
                "blob": [write_tfrecords(payloads)],
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
        T.StructField("n_examples", T.LongType(), False),
        T.StructField("sum_doc_id", T.LongType(), False),
        T.StructField("text_bytes", T.LongType(), False),
        T.StructField("sum_wlens", T.LongType(), False),
        T.StructField("density_scaled", T.LongType(), False),
    ]
)


def tfexample_partials(corpus: DataFrame) -> DataFrame:
    """Decode every Example through the full nested walk and fold the
    closed-form counters.  density re-scales the float32 back to the
    exact integer (v*64) so the float path hashes."""

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sh, nr, blob in zip(
                pdf["shard"], pdf["n_records"], pdf["blob"]
            ):
                n = sid = tb = wl = dens = 0
                for payload in iter_tfrecords(bytes(blob)):
                    feats = decode_example(payload)
                    n += 1
                    sid += feats["doc_id"][1][0]
                    text = feats["text"][1][0]
                    tb += len(text)
                    wl += sum(feats["wlens"][1])
                    v = feats["density"][1][0]
                    dens += round(v * 64)
                    if feats["extra"] != ("int64", [7]):
                        raise ProtoExampleError(
                            "unknown-feature passthrough corrupted"
                        )
                if n != int(nr):
                    raise ProtoExampleError(
                        f"shard {sh}: walked {n} records, wrote {nr}"
                    )
                rows.append(
                    {
                        "shard": int(sh),
                        "n_examples": n,
                        "sum_doc_id": sid,
                        "text_bytes": tb,
                        "sum_wlens": wl,
                        "density_scaled": dens,
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return corpus.mapInPandas(walk, _STATS_SCHEMA)


def tfexample_from_partials(parts: DataFrame) -> DataFrame:
    return (
        parts.groupBy("shard")
        .agg(
            F.sum("n_examples").cast("long").alias("n_examples"),
            F.sum("sum_doc_id").cast("long").alias("sum_doc_id"),
            F.sum("text_bytes").cast("long").alias("text_bytes"),
            F.sum("sum_wlens").cast("long").alias("sum_wlens"),
            F.sum("density_scaled")
            .cast("long")
            .alias("density_scaled"),
        )
        .orderBy("shard")
    )


def tfexample_stats(docs: DataFrame) -> DataFrame:
    """REAL nested-proto decode, oracle-checked: every document round
    trips through Example encode → TFRecord framing → full map/packed
    decode; the oracle reads the same counters straight off
    documents.text."""
    return tfexample_from_partials(
        tfexample_partials(synth_tfexample_corpus(docs))
    )


def tfexample_stats_sql(*, n_shards: int = 4) -> str:
    """sum_wlens: word byte-lengths sum to utf-8 bytes minus the
    single-space separators; density_scaled: round(float32(bytes/64)
    * 64) == bytes exactly (exponent-shift representable)."""
    return f"""
SELECT doc_id % {n_shards} AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_examples,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(SUM(strlen(text)) AS BIGINT) AS text_bytes,
       CAST(SUM(strlen(replace(text, ' ', ''))) AS BIGINT)
         AS sum_wlens,
       CAST(SUM(strlen(text)) AS BIGINT) AS density_scaled
FROM documents
WHERE text IS NOT NULL
GROUP BY doc_id % {n_shards}
ORDER BY shard
"""
