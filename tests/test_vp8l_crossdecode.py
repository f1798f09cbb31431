"""VP8L cross-validation against the REAL libwebp (PARITY.md standing
retry, VERDICT r8 'missing' #2).

Until r9 the pure-numpy VP8L codec was proven only by internal
round-trip — a transcription error in the spec reading could hide on
both sides.  This environment ships ``libwebp.so.7`` (system library,
no Python binding needed): these tests drive it through ctypes in BOTH
directions —

* libwebp ENCODES lossless WebP payloads → our ``decode_webp`` must
  reproduce the pixels exactly;
* our ``encode_webp_lossless`` payloads → libwebp's ``WebPDecodeRGBA``
  must reproduce the pixels exactly.

Either direction failing means our reading of the VP8L spec diverges
from the reference implementation.  Skipped (not failed) where the
shared library is absent.
"""

import ctypes
import ctypes.util

import numpy as np
import pytest

from inception_spark.operators.vp8l import (
    decode_webp,
    encode_webp_lossless,
)


def _load_libwebp():
    for name in ("libwebp.so.7", "libwebp.so", "webp"):
        try:
            if name == "webp":
                found = ctypes.util.find_library("webp")
                if not found:
                    return None
                name = found
            lib = ctypes.CDLL(name)
            lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
            lib.WebPEncodeLosslessRGBA.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
            ]
            lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
            lib.WebPDecodeRGBA.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.WebPFree.restype = None
            lib.WebPFree.argtypes = [ctypes.c_void_p]
            return lib
        except OSError:
            continue
    return None


_LIB = _load_libwebp()

pytestmark = pytest.mark.skipif(
    _LIB is None, reason="libwebp shared library not available"
)


def _libwebp_encode(rgba: np.ndarray) -> bytes:
    h, w = rgba.shape[:2]
    buf = np.ascontiguousarray(rgba, dtype=np.uint8).tobytes()
    out = ctypes.POINTER(ctypes.c_ubyte)()
    size = _LIB.WebPEncodeLosslessRGBA(
        buf, w, h, w * 4, ctypes.byref(out)
    )
    assert size > 0, "libwebp refused to encode the fixture"
    try:
        return bytes(bytearray(out[:size]))
    finally:
        _LIB.WebPFree(out)


def _libwebp_decode(payload: bytes) -> np.ndarray:
    w = ctypes.c_int()
    h = ctypes.c_int()
    ptr = _LIB.WebPDecodeRGBA(
        payload, len(payload), ctypes.byref(w), ctypes.byref(h)
    )
    assert ptr, "libwebp failed to decode our payload"
    try:
        flat = np.frombuffer(
            bytearray(ptr[: w.value * h.value * 4]), dtype=np.uint8
        )
        return flat.reshape(h.value, w.value, 4).copy()
    finally:
        _LIB.WebPFree(ptr)


def _fixtures():
    rng = np.random.RandomState(7)
    out = {}
    # smooth gradient (predictor-transform friendly)
    g = np.zeros((16, 24, 4), np.uint8)
    yy, xx = np.mgrid[0:16, 0:24]
    g[..., 0] = (xx * 10) % 256
    g[..., 1] = (yy * 16) % 256
    g[..., 2] = ((xx + yy) * 7) % 256
    g[..., 3] = 255
    out["gradient"] = g
    # tiny palette image (color-indexing transform territory)
    pal = np.array(
        [[255, 0, 0, 255], [0, 255, 0, 255], [0, 0, 255, 128]], np.uint8
    )
    idx = rng.randint(0, 3, size=(9, 13))
    out["palette"] = pal[idx]
    # repeated tiles (LZ77 back-references)
    tile = rng.randint(0, 256, size=(4, 4, 4), dtype=np.uint8)
    tile[..., 3] = 255
    out["tiled"] = np.tile(tile, (5, 6, 1))
    # full-noise, including varying alpha (worst case for every
    # transform — exercises plain prefix-coded literals)
    noise = rng.randint(0, 256, size=(11, 7, 4), dtype=np.uint8)
    out["noise"] = noise
    # single pixel and single row/column edges
    out["1x1"] = np.array([[[42, 250, 3, 77]]], np.uint8)
    out["1row"] = rng.randint(0, 256, size=(1, 19, 4), dtype=np.uint8)
    out["1col"] = rng.randint(0, 256, size=(23, 1, 4), dtype=np.uint8)
    return out


@pytest.mark.parametrize("name", sorted(_fixtures()))
def test_libwebp_encodes_we_decode(name):
    img = _fixtures()[name]
    payload = _libwebp_encode(img)
    # sanity: it really is a lossless (VP8L) payload
    assert payload[:4] == b"RIFF" and b"VP8L" in payload[:32]
    got = decode_webp(payload)
    assert got.shape == img.shape
    assert np.array_equal(got, img), name


@pytest.mark.parametrize("name", sorted(_fixtures()))
def test_we_encode_libwebp_decodes(name):
    img = _fixtures()[name]
    payload = encode_webp_lossless(img)
    got = _libwebp_decode(payload)
    assert got.shape == img.shape
    assert np.array_equal(got, img), name
