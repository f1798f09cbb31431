"""Avro Object Container File reader/writer (sources/avrocontainer.py):
binary-encoding roundtrips per block codec, the structural-corruption
taxonomy, and the Spark ingest rollup end-to-end."""

import json
import struct
import zlib

import pytest

import inception_spark.sources.avrocontainer as A


RECS = [
    {"doc_id": i, "text": f"doc {i} " + "a" * (i % 5)}
    for i in range(-3, 120)
]


@pytest.mark.parametrize("codec", ["null", "deflate", "snappy"])
def test_container_roundtrip(codec):
    blob = A.encode_avro_container(
        RECS, A._DOC_SCHEMA, codec=codec, records_per_block=17
    )
    assert list(A.iter_avro_records(blob)) == RECS


def test_zigzag_varint_edges():
    out = bytearray()
    vals = [0, -1, 1, 63, -64, 64, 2**31, -(2**31), 2**62, -(2**62)]
    for v in vals:
        A._emit_long(out, v)
    data, pos = bytes(out), 0
    got = []
    for _ in vals:
        v, pos = A._read_long(data, pos)
        got.append(v)
    assert got == vals and pos == len(data)


def test_deflate_is_raw_rfc1951():
    """The spec mandates RAW deflate — a zlib-wrapped block must fail,
    and our writer's payload must inflate with wbits=-15."""
    blob = A.encode_avro_container(RECS[:5], A._DOC_SCHEMA, codec="deflate")
    # locate the first data block payload: header + sync, then
    # (count, size) varints
    meta_end = blob.index(A._SYNC, 4) + 16
    count, pos = A._read_long(blob, meta_end)
    size, pos = A._read_long(blob, pos)
    zlib.decompress(blob[pos : pos + size], -15)  # raw inflate works
    with pytest.raises(zlib.error):
        zlib.decompress(blob[pos : pos + size])  # zlib-wrapped does not


def test_snappy_crc_is_checked():
    blob = bytearray(
        A.encode_avro_container(RECS[:8], A._DOC_SCHEMA, codec="snappy")
    )
    # flip one bit in the last 4 bytes before the trailing sync marker
    # (the block's big-endian CRC32 of the uncompressed payload)
    blob[-17] ^= 0x01
    with pytest.raises(A.AvroFormatError, match="CRC"):
        list(A.iter_avro_records(bytes(blob)))


def test_corruption_taxonomy():
    blob = A.encode_avro_container(RECS, A._DOC_SCHEMA, codec="deflate")
    with pytest.raises(A.AvroFormatError, match="magic"):
        list(A.iter_avro_records(b"Xbj\x01" + blob[4:]))
    with pytest.raises(A.AvroFormatError):
        list(A.iter_avro_records(blob[:-1]))  # truncated final block
    # sync-marker mismatch: corrupt the header sync copy
    meta_end = blob.index(A._SYNC, 4)
    mut = blob[:meta_end] + b"\xff" * 16 + blob[meta_end + 16 :]
    with pytest.raises(A.AvroFormatError, match="sync"):
        list(A.iter_avro_records(mut))
    # non-record schema refused
    bad_schema = json.dumps({"type": "string"}).encode()
    hdr = bytearray(A.MAGIC)
    A._emit_long(hdr, 1)
    A._emit_long(hdr, len(b"avro.schema"))
    hdr += b"avro.schema"
    A._emit_long(hdr, len(bad_schema))
    hdr += bad_schema
    A._emit_long(hdr, 0)
    hdr += A._SYNC
    with pytest.raises(A.AvroFormatError, match="record"):
        list(A.iter_avro_records(bytes(hdr)))


def test_negative_count_metadata_map_blocks():
    """The spec allows map blocks with a NEGATIVE count + byte-size
    prefix; hand-build one and check the reader honors it."""
    schema = json.dumps(A._DOC_SCHEMA).encode()
    items = bytearray()
    A._emit_long(items, len(b"avro.schema"))
    items += b"avro.schema"
    A._emit_long(items, len(schema))
    items += schema
    hdr = bytearray(A.MAGIC)
    A._emit_long(hdr, -1)  # one item, size-prefixed form
    A._emit_long(hdr, len(items))
    hdr += items
    A._emit_long(hdr, 0)
    hdr += A._SYNC
    assert list(A.iter_avro_records(bytes(hdr))) == []


def test_record_bytes_leftover_raises():
    """A block whose payload holds MORE bytes than its declared record
    count consumes must raise, not silently drop data."""
    blob = bytearray(
        A.encode_avro_container(RECS[:4], A._DOC_SCHEMA, codec="null")
    )
    meta_end = bytes(blob).index(A._SYNC, 4) + 16
    count, pos = A._read_long(bytes(blob), meta_end)
    # shrink the declared count by 1 without touching the payload
    patched = bytearray()
    A._emit_long(patched, count - 1)
    _, size_pos = A._read_long(bytes(blob), meta_end)
    blob2 = blob[:meta_end] + patched + blob[size_pos:]
    with pytest.raises(A.AvroFormatError, match="decoded"):
        list(A.iter_avro_records(bytes(blob2)))


def test_double_and_boolean_fields_roundtrip():
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "x", "type": "double"},
            {"name": "ok", "type": "boolean"},
            {"name": "raw", "type": "bytes"},
        ],
    }
    recs = [
        {"x": 1.5, "ok": True, "raw": b"\x00\xffbin"},
        {"x": -0.125, "ok": False, "raw": b""},
        {"x": float("inf"), "ok": True, "raw": b"z"},
    ]
    blob = A.encode_avro_container(recs, schema, codec="null")
    assert list(A.iter_avro_records(blob)) == recs


def test_avro_ingest_stats_matches_text(spark):
    """End-to-end Spark rollup equals a plain DataFrame aggregate over
    the same documents — the oracle identity, in-process."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, f"text {i} " + "a" * (i % 7)) for i in range(60)],
        "doc_id long, text string",
    )
    got = {
        r["shard"]: r
        for r in A.avro_ingest_stats(docs, codec="deflate").collect()
    }
    want = docs.groupBy((F.col("doc_id") % 4).alias("shard")).agg(
        F.count("*").alias("n_records"),
        F.sum("doc_id").alias("sum_doc_id"),
        F.sum(F.octet_length("text")).alias("decoded_bytes"),
        F.sum(
            F.octet_length("text")
            - F.octet_length(F.replace(F.col("text"), F.lit("a")))
        ).alias("n_a"),
    )
    for r in want.collect():
        g = got[r["shard"]]
        assert (
            g["n_records"],
            g["sum_doc_id"],
            g["decoded_bytes"],
            g["n_a"],
        ) == (
            r["n_records"],
            r["sum_doc_id"],
            r["decoded_bytes"],
            r["n_a"],
        )
