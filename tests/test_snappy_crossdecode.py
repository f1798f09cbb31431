"""Snappy cross-validation against the REAL snappy bundled with
pyarrow — the liblz4/libzstd protocol applied to the legacy-lake
codec.  Both directions: real-snappy payloads must decode byte-exact
under ``decode_snappy`` (all four tag types, overlap copies, extended
literal lengths), and every ``encode_snappy`` payload must round-trip
under the real decoder (proving tag/offset/length encoding).
"""

import random

import pytest

from inception_spark.operators.snappycodec import (
    SnappyFormatError,
    decode_snappy,
    encode_snappy,
)


def _pa():
    try:
        import pyarrow as pa
    except ImportError:
        pytest.skip("pyarrow not present")
    if not pa.Codec.is_available("snappy"):
        pytest.skip("pyarrow built without snappy")
    return pa


def _fixtures() -> list[bytes]:
    rng = random.Random(20260816)
    return [
        b"",
        b"a",
        b"abc",                            # below the 4-byte match floor
        b"hello hello hello hello world" * 10,
        b"x" * 100_000,                    # overlap / RLE copies
        rng.randbytes(50_000),             # incompressible literals
        bytes(range(256)) * 300,
        b"ab" * 40_000,                    # offset-2 overlap copies
        b"".join(
            rng.choice([b"cat", b"dog", b"fish", b" "])
            for _ in range(20_000)
        ),
    ]


def test_real_to_ours():
    pa = _pa()
    for i, src in enumerate(_fixtures()):
        comp = pa.compress(src, codec="snappy", asbytes=True)
        assert decode_snappy(comp) == src, f"case {i}"


def test_ours_to_real():
    pa = _pa()
    for i, src in enumerate(_fixtures()):
        ours = encode_snappy(src)
        back = pa.decompress(
            ours, decompressed_size=len(src), codec="snappy", asbytes=True
        )
        assert back == src, f"case {i}"


def test_roundtrip_without_reference():
    for src in _fixtures():
        assert decode_snappy(encode_snappy(src)) == src


def test_fuzz_differential():
    pa = _pa()
    rng = random.Random(7)
    for _ in range(120):
        n = rng.choice([0, 1, 5, 100, 5_000, 70_000])
        kind = rng.randrange(3)
        if kind == 0:
            src = rng.randbytes(n)
        elif kind == 1:
            src = bytes([rng.randrange(3)]) * n
        else:
            src = b"".join(
                rng.choice([b"aa", b"bb", b"c"]) for _ in range(n // 2)
            )
        assert decode_snappy(
            pa.compress(src, codec="snappy", asbytes=True)
        ) == src
        assert pa.decompress(
            encode_snappy(src), decompressed_size=len(src),
            codec="snappy", asbytes=True,
        ) == src


def test_corrupt_payloads_raise():
    good = encode_snappy(b"corruption target " * 50)
    with pytest.raises(SnappyFormatError):
        decode_snappy(good[:-3])  # truncated → length mismatch
    with pytest.raises(SnappyFormatError):
        decode_snappy(b"")  # missing preamble
    # a copy before any output: offset outside window
    with pytest.raises(SnappyFormatError):
        decode_snappy(bytes([4, 0b10 | (3 << 2), 1, 0]))
    # preamble promises more than the elements produce
    with pytest.raises(SnappyFormatError):
        decode_snappy(bytes([200, 1]) + encode_snappy(b"xy")[1:])
