"""tf.train.Example codec: round-trip, forward-compat skipping, typed
errors, and mutation fuzz (same contract as the other containers:
typed error or successful decode, never a foreign exception)."""

import random
import struct

import pytest

import inception_spark.sources.protoexample as PE
import inception_spark.sources.tfrecord as TF


def test_round_trip_all_kinds():
    blob = PE.encode_example(41, "alpha beta gamma")
    f = PE.decode_example(blob)
    assert f["doc_id"] == ("int64", [41])
    assert f["text"] == ("bytes", [b"alpha beta gamma"])
    assert f["wlens"] == ("int64", [5, 4, 5])
    kind, vals = f["density"]
    assert kind == "float" and vals == [16 / 64.0]
    # the deliberate unknown feature passes through by name
    assert f["extra"] == ("int64", [7])


def test_utf8_byte_lengths():
    f = PE.decode_example(PE.encode_example(1, "héllo wörld"))
    assert f["wlens"] == ("int64", [6, 6])
    assert sum(f["wlens"][1]) == len("héllo wörld".encode()) - 1


def test_unknown_top_level_field_skipped():
    """encode_example plants varint field 15 at top level; decode must
    ignore it (and the test proves it's really there)."""
    blob = PE.encode_example(3, "x")
    assert blob[-2:] == bytes([(15 << 3) | 0, 42])
    PE.decode_example(blob)  # no error


def test_map_entry_order_irrelevant():
    """Proto maps guarantee no entry order: decoding a re-ordered
    Features payload must give the same dict."""
    blob = PE.encode_example(9, "a b c")
    # rebuild with entries reversed: walk the outer message manually
    fields = list(PE._iter_fields(blob))
    feats = next(v for f, w, v in fields if f == 1 and w == 2)
    entries = [v for f, w, v in PE._iter_fields(feats) if f == 1]
    rebuilt = b"".join(
        PE._len_delim(1, e) for e in reversed(entries)
    )
    out = PE.decode_example(PE._len_delim(1, rebuilt))
    assert out == PE.decode_example(blob)


def test_unpacked_fallbacks_accepted():
    """proto2-style unpacked repeated primitives are legal on the
    wire; the decoder must accept both forms."""
    # Int64List with two unpacked varint values
    il = bytearray()
    for v in (5, 6):
        il.append((1 << 3) | 0)
        TF._emit_varint(il, v)
    feat = PE._len_delim(3, bytes(il))
    # FloatList with one unpacked fixed32 value
    fl = bytes([(1 << 3) | 5]) + struct.pack("<f", 2.5)
    feat2 = PE._len_delim(2, fl)
    msg = PE._len_delim(
        1, PE._map_entry("a", feat) + PE._map_entry("b", feat2)
    )
    out = PE.decode_example(msg)
    assert out["a"] == ("int64", [5, 6])
    assert out["b"] == ("float", [2.5])


def test_negative_int64_ten_byte_varint():
    il = bytearray()
    TF._emit_varint(il, -3)
    packed = PE._len_delim(1, bytes(il))
    msg = PE._len_delim(1, PE._map_entry("n", PE._len_delim(3, packed)))
    assert PE.decode_example(msg)["n"] == ("int64", [-3])


def test_typed_errors():
    with pytest.raises(PE.ProtoExampleError, match="no features"):
        PE.decode_example(bytes([(15 << 3) | 0, 1]))
    # Feature with no kind
    msg = PE._len_delim(1, PE._map_entry("k", b""))
    with pytest.raises(PE.ProtoExampleError, match="no kind"):
        PE.decode_example(msg)
    # packed float run not a multiple of 4
    bad = PE._len_delim(2, PE._len_delim(1, b"\x00\x00\x00"))
    msg = PE._len_delim(1, PE._map_entry("k", bad))
    with pytest.raises(PE.ProtoExampleError, match="multiple of 4"):
        PE.decode_example(msg)
    # map entry missing the value
    entry = PE._len_delim(1, PE._len_delim(1, b"k"))
    with pytest.raises(PE.ProtoExampleError, match="missing key or"):
        PE.decode_example(PE._len_delim(1, entry))


def test_mutation_fuzz_typed_or_decoded():
    """Every mutation of a framed Example shard either decodes, or
    raises the typed error family (ProtoExampleError or the framing's
    TFRecordFormatError) — never IndexError/struct.error/KeyError."""
    payloads = [
        PE.encode_example(i, f"doc {i} body text with words")
        for i in range(25)
    ]
    blob = TF.write_tfrecords(payloads)
    rng = random.Random(4242)
    caught = decoded = 0
    for _ in range(150):
        kind = rng.randrange(3)
        if kind == 0:
            i = rng.randrange(len(blob))
            mut = (
                blob[:i]
                + bytes([blob[i] ^ (1 << rng.randrange(8))])
                + blob[i + 1 :]
            )
        elif kind == 1:
            mut = blob[: rng.randrange(1, len(blob))]
        else:
            i = rng.randrange(len(blob))
            mut = (
                blob[:i]
                + bytes(rng.randrange(256) for _ in range(5))
                + blob[i:]
            )
        try:
            for p in TF.iter_tfrecords(mut):
                PE.decode_example(p)
            decoded += 1
        except TF.TFRecordFormatError:
            caught += 1  # ProtoExampleError subclasses this
    assert caught > 0


def test_bare_example_mutations_are_typed():
    """Without the CRC-protected framing, the nested decoder itself
    takes the mutations — the strict bounds at every level must turn
    them all into typed errors or successful skips."""
    blob = PE.encode_example(7, "some words for the fuzz harness")
    rng = random.Random(777)
    for _ in range(200):
        i = rng.randrange(len(blob))
        mut = (
            blob[:i]
            + bytes([blob[i] ^ (1 << rng.randrange(8))])
            + blob[i + 1 :]
        )
        try:
            PE.decode_example(mut)
        except TF.TFRecordFormatError:
            pass
        except UnicodeDecodeError:
            pytest.fail("raw UnicodeDecodeError leaked from key decode")
