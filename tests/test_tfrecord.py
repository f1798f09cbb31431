"""TFRecord framing + minimal proto wire format (sources/tfrecord.py):
CRC32C catalogue pins, framing roundtrip, corruption taxonomy, proto
forward-compat skipping, and the Spark rollup end-to-end."""

import struct

import pytest

import inception_spark.sources.tfrecord as TF


def test_crc32c_catalogue_vectors():
    """Public CRC catalogue (CRC-32C/Castagnoli): check=0xE3069283 on
    b'123456789'; plus the all-zeros and empty identities."""
    assert TF.crc32c(b"123456789") == 0xE3069283
    assert TF.crc32c(b"") == 0
    assert TF.crc32c(b"\x00" * 32) == 0x8A9136AA  # iSCSI test vector


def test_mask_is_invertible_and_offset():
    c = TF.crc32c(b"payload")
    m = TF.masked_crc32c(b"payload")
    rot = ((c >> 15) | (c << 17)) & 0xFFFFFFFF
    assert m == (rot + 0xA282EAD8) & 0xFFFFFFFF


def test_framing_roundtrip():
    recs = [TF.encode_doc_message(i, f"doc {i} tt" * (i % 3 + 1))
            for i in range(-3, 60)]
    blob = TF.write_tfrecords(recs)
    assert list(TF.iter_tfrecords(blob)) == recs
    assert [TF.decode_doc_message(r)[0] for r in recs] == list(
        range(-3, 60)
    )


def test_framing_corruption_taxonomy():
    blob = TF.write_tfrecords([b"abc", b"defgh"])
    # payload bit flip → payload CRC
    mut = bytearray(blob)
    mut[12] ^= 1
    with pytest.raises(TF.TFRecordFormatError, match="payload CRC"):
        list(TF.iter_tfrecords(bytes(mut)))
    # length bit flip → length CRC (never a misframed walk)
    mut = bytearray(blob)
    mut[0] ^= 1
    with pytest.raises(TF.TFRecordFormatError, match="length CRC"):
        list(TF.iter_tfrecords(bytes(mut)))
    # truncation mid-payload
    with pytest.raises(TF.TFRecordFormatError, match="truncated"):
        list(TF.iter_tfrecords(blob[:-2]))
    # truncated header
    with pytest.raises(TF.TFRecordFormatError, match="truncated"):
        list(TF.iter_tfrecords(blob + b"\x01\x02"))


def test_proto_negative_ids_are_ten_byte_varints():
    msg = TF.encode_doc_message(-1, "x")
    # tag(1) + 10-byte varint for -1 per the proto int64 rule
    assert msg[0] == 0x08 and msg[1:11] == b"\xff" * 9 + b"\x01"
    assert TF.decode_doc_message(msg) == (-1, b"x")


def test_proto_unknown_fields_skipped():
    """Forward compat: unknown varint/fixed64/fixed32/len-delim fields
    must be skipped, unknown wire types must raise."""
    base = TF.encode_doc_message(7, "hi")
    extra = bytearray()
    extra.append((9 << 3) | 0)  # unknown varint field
    TF._emit_varint(extra, 300)
    extra.append((10 << 3) | 1)  # unknown fixed64
    extra += struct.pack("<Q", 99)
    extra.append((11 << 3) | 5)  # unknown fixed32
    extra += struct.pack("<I", 5)
    extra.append((12 << 3) | 2)  # unknown len-delim
    TF._emit_varint(extra, 3)
    extra += b"abc"
    assert TF.decode_doc_message(base + bytes(extra)) == (7, b"hi")
    bad = base + bytes([(9 << 3) | 3])  # group wire type: unsupported
    with pytest.raises(TF.TFRecordFormatError, match="wire type"):
        TF.decode_doc_message(bad)


def test_tfrecord_ingest_stats_matches_text(spark):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, f"text {i} " + "t" * (i % 7)) for i in range(60)],
        "doc_id long, text string",
    )
    got = {
        r["shard"]: r for r in TF.tfrecord_ingest_stats(docs).collect()
    }
    want = docs.groupBy((F.col("doc_id") % 4).alias("shard")).agg(
        F.count("*").alias("n_records"),
        F.sum("doc_id").alias("sum_doc_id"),
        F.sum(F.octet_length("text")).alias("decoded_bytes"),
        F.sum(
            F.octet_length("text")
            - F.octet_length(F.replace(F.col("text"), F.lit("t")))
        ).alias("n_t"),
    )
    for r in want.collect():
        g = got[r["shard"]]
        assert (
            g["n_records"],
            g["sum_doc_id"],
            g["decoded_bytes"],
            g["n_t"],
        ) == (
            r["n_records"],
            r["sum_doc_id"],
            r["decoded_bytes"],
            r["n_t"],
        )
