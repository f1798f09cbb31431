"""LZ4 cross-validation against the REAL system ``liblz4.so.1`` — the
libjpeg/giflib/audioop protocol applied to a compression codec.

``operators/lz4codec.py`` is a spec transcription (block format +
frame format + xxHash32); transcriptions carry silent-divergence risk,
so every layer is pinned bidirectionally against lz4 1.9.4:

* block: ``LZ4_compress_default`` output → our ``decode_lz4_block``
  must be byte-exact; our ``encode_lz4_block`` payloads →
  ``LZ4_decompress_safe`` must round-trip (proves we honor the end
  rules: trailing 5 literal bytes, no match in the last 12);
* frame: ``LZ4F_compressFrame`` across the option grid — linked AND
  independent blocks, with/without block checksums, all four block
  sizes, with/without content size — → our ``decode_lz4_frame``;
  our ``encode_lz4_frame`` → ``LZ4F_decompress``;
* xxh32: the spec's published vectors plus a differential sweep
  against the frame checksums liblz4 computes internally (every
  LZ4F→ours case above verifies our xxh32 on real header/content
  checksums — a wrong hash fails the decode, not just this pin).

Skipped (not failed) where liblz4.so.1 is absent.
"""

import ctypes
import random

import pytest

from inception_spark.operators.lz4codec import (
    Lz4FormatError,
    decode_lz4_block,
    decode_lz4_frame,
    encode_lz4_block,
    encode_lz4_frame,
    xxh32,
)


def _load_lz4():
    try:
        lib = ctypes.CDLL("liblz4.so.1")
    except OSError:
        pytest.skip("liblz4.so.1 not present")
    lib.LZ4_compress_default.restype = ctypes.c_int
    lib.LZ4_decompress_safe.restype = ctypes.c_int
    lib.LZ4F_compressFrameBound.restype = ctypes.c_size_t
    lib.LZ4F_compressFrame.restype = ctypes.c_size_t
    lib.LZ4F_isError.restype = ctypes.c_uint
    lib.LZ4F_createDecompressionContext.restype = ctypes.c_size_t
    lib.LZ4F_decompress.restype = ctypes.c_size_t
    return lib


class _FrameInfo(ctypes.Structure):
    _fields_ = [
        ("blockSizeID", ctypes.c_int),
        ("blockMode", ctypes.c_int),
        ("contentChecksumFlag", ctypes.c_int),
        ("frameType", ctypes.c_int),
        ("contentSize", ctypes.c_ulonglong),
        ("dictID", ctypes.c_uint),
        ("blockChecksumFlag", ctypes.c_int),
    ]


class _Prefs(ctypes.Structure):
    _fields_ = [
        ("frameInfo", _FrameInfo),
        ("compressionLevel", ctypes.c_int),
        ("autoFlush", ctypes.c_uint),
        ("favorDecSpeed", ctypes.c_uint),
        ("reserved", ctypes.c_uint * 3),
    ]


def _lib_block_compress(lib, src: bytes) -> bytes:
    cap = len(src) + len(src) // 255 + 64
    dst = ctypes.create_string_buffer(cap)
    n = lib.LZ4_compress_default(src, dst, len(src), cap)
    assert n > 0
    return dst.raw[:n]


def _lib_block_decompress(lib, src: bytes, osize: int) -> bytes:
    dst = ctypes.create_string_buffer(max(osize, 1))
    n = lib.LZ4_decompress_safe(src, dst, len(src), osize)
    assert n == osize, f"liblz4 rejected our payload: {n}"
    return dst.raw[:osize]


def _lib_frame_compress(
    lib, src: bytes, *, block_mode=0, bsum=0, bsid=4, csize=1
) -> bytes:
    p = _Prefs()
    p.frameInfo.blockSizeID = bsid
    p.frameInfo.blockMode = block_mode  # 0 = linked, 1 = independent
    p.frameInfo.contentChecksumFlag = 1
    p.frameInfo.blockChecksumFlag = bsum
    p.frameInfo.contentSize = len(src) if csize else 0
    cap = lib.LZ4F_compressFrameBound(len(src), ctypes.byref(p))
    dst = ctypes.create_string_buffer(cap)
    n = lib.LZ4F_compressFrame(dst, cap, src, len(src), ctypes.byref(p))
    assert not lib.LZ4F_isError(n)
    return dst.raw[:n]


def _lib_frame_decompress(lib, frame: bytes) -> bytes:
    ctx = ctypes.c_void_p()
    assert not lib.LZ4F_isError(
        lib.LZ4F_createDecompressionContext(ctypes.byref(ctx), 100)
    )
    try:
        out = bytearray()
        off = 0
        buf = ctypes.create_string_buffer(1 << 20)
        while off < len(frame):
            dsz = ctypes.c_size_t(len(buf))
            ssz = ctypes.c_size_t(len(frame) - off)
            r = lib.LZ4F_decompress(
                ctx, buf, ctypes.byref(dsz), frame[off:], ctypes.byref(ssz), None
            )
            assert not lib.LZ4F_isError(r), f"liblz4 rejected our frame: {r}"
            out += buf.raw[: dsz.value]
            off += ssz.value
            if r == 0:
                break
        return bytes(out)
    finally:
        lib.LZ4F_freeDecompressionContext(ctx)


def _fixtures() -> list[bytes]:
    rng = random.Random(20260816)
    text = (
        b"The quick brown fox jumps over the lazy dog. " * 700
    )  # highly compressible prose
    return [
        b"",  # empty
        b"a",  # single byte (all-literal block)
        b"abcd" * 4000,  # short-period repetition
        rng.randbytes(50_000),  # incompressible (stored-block path)
        b"x" * 200_000,  # RLE / overlapping match, multi-block
        text,
        bytes(range(256)) * 300,  # long-period structure
        rng.randbytes(13),  # shorter than the 12-byte match floor
        b"ab" * 6 + b"XYZWV",  # matches butting the end rules
    ]


def test_xxh32_reference_vectors():
    # published xxHash spec vectors
    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"", 0x9E3779B1) == 0x36B78AE7
    assert xxh32(bytes.fromhex("9e")) == 0xB85CBEE5
    # longer inputs: pinned against python's zlib-free reference impl
    # via liblz4's content checksum in the frame tests below; here a
    # structural sanity pin (seed sensitivity + avalanche)
    assert xxh32(b"hello") != xxh32(b"hello", 1)
    assert xxh32(b"hello") != xxh32(b"hellp")


def test_block_lib_to_ours():
    lib = _load_lz4()
    for i, src in enumerate(_fixtures()):
        comp = _lib_block_compress(lib, src)
        assert decode_lz4_block(comp, len(src)) == src, f"case {i}"


def test_block_ours_to_lib():
    lib = _load_lz4()
    for i, src in enumerate(_fixtures()):
        if not src:
            continue  # LZ4_decompress_safe(osize=0) is a degenerate call
        comp = encode_lz4_block(src)
        assert _lib_block_decompress(lib, comp, len(src)) == src, f"case {i}"


def test_frame_lib_to_ours_option_grid():
    lib = _load_lz4()
    for i, src in enumerate(_fixtures()):
        for bm in (0, 1):
            for bsum in (0, 1):
                frame = _lib_frame_compress(
                    lib, src, block_mode=bm, bsum=bsum,
                    bsid=4 + (i % 4), csize=i % 2,
                )
                assert decode_lz4_frame(frame) == src, (
                    f"case {i} block_mode={bm} bsum={bsum}"
                )


def test_frame_ours_to_lib():
    lib = _load_lz4()
    for i, src in enumerate(_fixtures()):
        frame = encode_lz4_frame(src, block_checksum=bool(i % 2))
        assert _lib_frame_decompress(lib, frame) == src, f"case {i}"


def test_frame_roundtrip_without_lib():
    for src in _fixtures():
        assert decode_lz4_frame(encode_lz4_frame(src)) == src


def test_corrupt_frames_raise():
    frame = bytearray(encode_lz4_frame(b"corruption target " * 100))
    with pytest.raises(Lz4FormatError):
        decode_lz4_frame(bytes(frame[:10]))  # truncated
    bad_magic = bytes([0xFF]) + bytes(frame[1:])
    with pytest.raises(Lz4FormatError):
        decode_lz4_frame(bad_magic)
    flipped = bytes(frame[:-1]) + bytes([frame[-1] ^ 0x01])
    with pytest.raises(Lz4FormatError):
        decode_lz4_frame(flipped)  # content checksum mismatch
    hdr_flip = bytearray(frame)
    hdr_flip[4] ^= 0x04  # toggle a descriptor flag under the HC byte
    with pytest.raises(Lz4FormatError):
        decode_lz4_frame(bytes(hdr_flip))


def test_zero_offset_rejected():
    # token with a match whose offset is 0 — spec-invalid
    payload = bytes([0x10]) + b"A" + b"\x00\x00"
    with pytest.raises(Lz4FormatError):
        decode_lz4_block(payload, 100)
