"""TIFF cross-validation against the REAL system libtiff (VERDICT r10
ask 6 stretch — the giflib/libjpeg/libpng/libwebp protocol applied to
the new format).

``libtiff.so.6`` ships in this environment with no dev header, so the
shim declares the public libtiff prototypes itself and links the .so
directly; encode/decode go through real temp FILES via ``TIFFOpen``
(no client-callback plumbing needed).  Both directions:

* libtiff ENCODES fixtures — uncompressed and LZW, with and without
  horizontal Predictor 2, grayscale and RGB, multi-strip, odd dims —
  and ``decode_tiff`` must be PIXEL-EXACT (lossless: zero tolerance).
  libtiff's LZW writer emits real variable-width MSB-first codes with
  the early-change rule, exactly the paths a self-round-trip of our
  uncompressed encoder never touches;
* our ``encode_tiff`` payloads → libtiff must reproduce the pixels
  exactly (via TIFFReadRGBAImageOriented, orientation TOPLEFT).

Skipped (not failed) where gcc or libtiff.so.6 is absent.
"""

import ctypes
import os
import shutil
import subprocess
import tempfile

import numpy as np
import pytest

from inception_spark.operators.tiff import decode_tiff, encode_tiff

_LIBTIFF_SO = "/usr/lib/x86_64-linux-gnu/libtiff.so.6"

_SHIM_C = r"""
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

/* public libtiff API subset, declared locally (no dev package) */
typedef struct tiff TIFF;
extern TIFF *TIFFOpen(const char *, const char *);
extern void TIFFClose(TIFF *);
extern int TIFFSetField(TIFF *, uint32_t, ...);
extern int TIFFGetField(TIFF *, uint32_t, ...);
extern int TIFFWriteScanline(TIFF *, void *, uint32_t, uint16_t);
extern int TIFFReadRGBAImageOriented(TIFF *, uint32_t, uint32_t,
                                     uint32_t *, int, int);

#define TAG_WIDTH 256
#define TAG_LENGTH 257
#define TAG_BPS 258
#define TAG_COMPRESSION 259
#define TAG_PHOTOMETRIC 262
#define TAG_SPP 277
#define TAG_RPS 278
#define TAG_PLANAR 284
#define TAG_PREDICTOR 317
#define ORIENT_TOPLEFT 1

/* Write pix (contig, 8-bit, spp samples) as photometric 1 (gray) or
   2 (RGB); compression 1=none 5=LZW; predictor 0 -> unset. */
int tshim_encode(const char *path, const unsigned char *pix,
                 int w, int h, int spp, int compression, int predictor,
                 int rows_per_strip) {
    TIFF *t = TIFFOpen(path, "w");
    int y;
    if (!t) return -1;
    TIFFSetField(t, TAG_WIDTH, (uint32_t)w);
    TIFFSetField(t, TAG_LENGTH, (uint32_t)h);
    TIFFSetField(t, TAG_BPS, (uint16_t)8);
    TIFFSetField(t, TAG_SPP, (uint16_t)spp);
    TIFFSetField(t, TAG_PHOTOMETRIC, (uint16_t)(spp == 1 ? 1 : 2));
    TIFFSetField(t, TAG_PLANAR, (uint16_t)1);
    TIFFSetField(t, TAG_COMPRESSION, (uint16_t)compression);
    TIFFSetField(t, TAG_RPS, (uint32_t)rows_per_strip);
    if (predictor)
        TIFFSetField(t, TAG_PREDICTOR, (uint16_t)predictor);
    for (y = 0; y < h; y++) {
        if (TIFFWriteScanline(t, (void *)(pix + (long)y * w * spp),
                              (uint32_t)y, 0) < 0) {
            TIFFClose(t);
            return -2;
        }
    }
    TIFFClose(t);
    return 0;
}

/* Decode any TIFF to top-left RGB8 via libtiff's full pipeline. */
int tshim_decode(const char *path, unsigned char *out, long cap,
                 int *w, int *h) {
    TIFF *t = TIFFOpen(path, "r");
    uint32_t tw = 0, th = 0, *raster;
    long i, npix;
    if (!t) return -1;
    TIFFGetField(t, TAG_WIDTH, &tw);
    TIFFGetField(t, TAG_LENGTH, &th);
    npix = (long)tw * (long)th;
    if (npix * 3 > cap) { TIFFClose(t); return -2; }
    raster = (uint32_t *)malloc((size_t)npix * 4);
    if (!raster) { TIFFClose(t); return -3; }
    if (!TIFFReadRGBAImageOriented(t, tw, th, raster,
                                   ORIENT_TOPLEFT, 0)) {
        free(raster);
        TIFFClose(t);
        return -4;
    }
    for (i = 0; i < npix; i++) {
        uint32_t v = raster[i];
        out[3 * i]     = (unsigned char)(v & 0xff);         /* R */
        out[3 * i + 1] = (unsigned char)((v >> 8) & 0xff);  /* G */
        out[3 * i + 2] = (unsigned char)((v >> 16) & 0xff); /* B */
    }
    free(raster);
    TIFFClose(t);
    *w = (int)tw;
    *h = (int)th;
    return 0;
}
"""


def _build_shim():
    gcc = shutil.which("gcc") or shutil.which("cc")
    if gcc is None or not os.path.exists(_LIBTIFF_SO):
        return None
    d = tempfile.mkdtemp(prefix="tiff_shim_")
    src = os.path.join(d, "tshim.c")
    so = os.path.join(d, "tshim.so")
    with open(src, "w") as f:
        f.write(_SHIM_C)
    r = subprocess.run(
        [gcc, "-O2", "-shared", "-fPIC", "-o", so, src, _LIBTIFF_SO],
        capture_output=True,
    )
    if r.returncode != 0:
        return None
    lib = ctypes.CDLL(so)
    lib.tshim_encode.restype = ctypes.c_int
    lib.tshim_encode.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.tshim_decode.restype = ctypes.c_int
    lib.tshim_decode.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    return lib


_LIB = _build_shim()

pytestmark = pytest.mark.skipif(
    _LIB is None, reason="gcc or libtiff.so.6 unavailable"
)


def _libtiff_encode(img, *, compression=1, predictor=0,
                    rows_per_strip=8) -> bytes:
    spp = 1 if img.ndim == 2 else img.shape[2]
    h, w = img.shape[:2]
    with tempfile.NamedTemporaryFile(suffix=".tif", delete=False) as f:
        path = f.name
    try:
        rc = _LIB.tshim_encode(
            path.encode(), np.ascontiguousarray(img, np.uint8).tobytes(),
            w, h, spp, compression, predictor, rows_per_strip,
        )
        assert rc == 0, f"libtiff encode failed: {rc}"
        with open(path, "rb") as f:
            return f.read()
    finally:
        os.unlink(path)


def _libtiff_decode(payload: bytes) -> np.ndarray:
    with tempfile.NamedTemporaryFile(suffix=".tif", delete=False) as f:
        f.write(payload)
        path = f.name
    try:
        cap = 64 * 1024 * 1024
        out = (ctypes.c_ubyte * cap)()
        w = ctypes.c_int()
        h = ctypes.c_int()
        rc = _LIB.tshim_decode(path.encode(), out, cap,
                               ctypes.byref(w), ctypes.byref(h))
        assert rc == 0, f"libtiff decode failed: {rc}"
        return np.frombuffer(
            bytes(out[: w.value * h.value * 3]), np.uint8
        ).reshape(h.value, w.value, 3)
    finally:
        os.unlink(path)


def _rgbify(img):
    return (
        img if img.ndim == 3
        else np.repeat(img[:, :, None], 3, axis=2)
    )


# ---------------------------------------------------------------------------
# libtiff encodes -> our decoder (pixel-exact)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "shape,compression,predictor,rps,pattern",
    [
        ((12, 17, 3), 1, 0, 8, "noise"),       # RGB uncompressed, 2 strips
        ((12, 17), 1, 0, 4, "noise"),          # gray, 3 strips
        ((30, 41, 3), 5, 0, 8, "noise"),       # RGB LZW
        ((30, 41, 3), 5, 2, 8, "gradient"),    # LZW + horizontal predictor
        ((64, 99), 5, 2, 16, "gradient"),      # gray LZW + predictor
        ((7, 5, 3), 1, 0, 1000, "noise"),      # single strip, odd dims
        ((128, 200, 3), 5, 0, 32, "stripes"),  # dictionary-heavy runs
        ((90, 130), 5, 0, 7, "noise"),         # gray LZW, uneven strips
        ((1, 1, 3), 1, 0, 8, "noise"),         # degenerate 1x1
    ],
)
def test_libtiff_encodes_our_decoder_exact(shape, compression, predictor,
                                           rps, pattern):
    rng = np.random.default_rng(hash(shape) % 2**31)
    if pattern == "noise":
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    elif pattern == "gradient":
        h, w = shape[:2]
        base = ((np.arange(h)[:, None] * 3 + np.arange(w)[None, :] * 5)
                % 256).astype(np.uint8)
        img = (base if len(shape) == 2
               else np.stack([base, base // 2, 255 - base], axis=-1))
    else:  # stripes
        h, w = shape[:2]
        base = np.repeat((np.arange(h) % 7 * 36).astype(np.uint8)[:, None],
                         w, axis=1)
        img = (base if len(shape) == 2
               else np.repeat(base[:, :, None], 3, axis=2))
    payload = _libtiff_encode(img, compression=compression,
                              predictor=predictor, rows_per_strip=rps)
    want = _rgbify(img)
    # libtiff's own full decode pipeline agrees on its own payload
    assert np.array_equal(_libtiff_decode(payload), want)
    # and OUR decoder is pixel-exact on the libtiff-compressed stream
    got = decode_tiff(payload)
    assert got.shape == want.shape
    assert np.array_equal(got, want), (shape, compression, predictor, rps)


def test_libtiff_lzw_code_width_growth():
    """256-value noise big enough that libtiff's LZW writer climbs
    through 10/11/12-bit codes and emits mid-stream Clear codes."""
    rng = np.random.default_rng(1234)
    img = rng.integers(0, 256, size=(150, 220, 3), dtype=np.uint8)
    payload = _libtiff_encode(img, compression=5, rows_per_strip=150)
    assert np.array_equal(decode_tiff(payload), img)


# ---------------------------------------------------------------------------
# our encoder -> libtiff decodes (pixel-exact)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("case", ["rgb_noise", "gray_ramp", "multi_strip",
                                  "tall"])
def test_our_encoder_libtiff_decodes_exact(case):
    rng = np.random.default_rng(7)
    if case == "rgb_noise":
        img = rng.integers(0, 256, size=(19, 23, 3), dtype=np.uint8)
        payload = encode_tiff(img)
    elif case == "gray_ramp":
        img = np.tile(np.arange(128, dtype=np.uint8), (9, 1))
        payload = encode_tiff(img)
    elif case == "multi_strip":
        img = rng.integers(0, 256, size=(50, 31, 3), dtype=np.uint8)
        payload = encode_tiff(img, rows_per_strip=6)
    else:  # tall: single-column edge case
        img = rng.integers(0, 256, size=(40, 1, 3), dtype=np.uint8)
        payload = encode_tiff(img, rows_per_strip=7)
    got = _libtiff_decode(payload)
    assert np.array_equal(got, _rgbify(img)), case
    # both independent decoders agree on our payload
    assert np.array_equal(decode_tiff(payload), got)


def test_unsupported_features_raise_decoder_unavailable():
    from inception_spark.operators.multimodal import DecoderUnavailable

    with pytest.raises(DecoderUnavailable, match="not a TIFF"):
        decode_tiff(b"NOPE")
    # a real libtiff payload with an unsupported compression scheme
    img = np.zeros((4, 4, 3), np.uint8)
    payload = bytearray(_libtiff_encode(img, compression=1))
    # patch the Compression IFD short from 1 to 7 (JPEG-in-TIFF)
    i = payload.find(b"\x03\x01\x03\x00")  # tag 259 (II), type SHORT
    assert i > 0
    assert payload[i + 8] == 1
    payload[i + 8] = 7
    with pytest.raises(DecoderUnavailable, match="compression 7"):
        decode_tiff(bytes(payload))
