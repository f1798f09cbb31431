"""VP8L (lossless WebP) codec: encoder round-trips prove the literal /
LZ77 / color-cache / prefix-code paths; handcrafted bitstreams prove the
four transforms, meta prefix codes and plane-code distances the minimal
encoder never emits."""

import numpy as np
import pytest

from inception_spark.operators.multimodal import DecoderUnavailable
from inception_spark.operators.vp8l import (
    BitWriter,
    PLANE_CODES,
    _write_image_data,
    decode_vp8l,
    decode_webp,
    encode_webp_lossless,
    plane_code_to_distance,
    prefix_encode_value,
    read_prefix_value,
    rgba_to_argb,
)

rng = np.random.default_rng(2024)


# --------------------------------------------------------------------------
# round-trips through the in-repo encoder
# --------------------------------------------------------------------------

@pytest.mark.parametrize("kw", [
    {"use_lz77": False},
    {"use_lz77": True},
    {"use_lz77": True, "cache_bits": 5},
    {"use_lz77": False, "cache_bits": 3},
])
def test_round_trip_noise(kw):
    img = rng.integers(0, 256, (13, 17, 4), dtype=np.uint8)
    assert np.array_equal(decode_webp(encode_webp_lossless(img, **kw)), img)


def test_round_trip_structured():
    img = np.zeros((20, 31, 4), np.uint8)
    img[..., 3] = 255
    img[:, ::3, 0] = 200
    img[5:9] = [10, 20, 30, 255]
    assert np.array_equal(decode_webp(encode_webp_lossless(img)), img)


def test_round_trip_few_colors_simple_codes():
    img = np.zeros((8, 8, 4), np.uint8)
    img[..., 1] = 77
    img[..., 3] = 255
    out = decode_webp(encode_webp_lossless(img, use_lz77=False))
    assert np.array_equal(out, img)


def test_round_trip_1x1_and_wide():
    one = rng.integers(0, 256, (1, 1, 4), dtype=np.uint8)
    assert np.array_equal(decode_webp(encode_webp_lossless(one)), one)
    wide = rng.integers(0, 256, (1, 300, 4), dtype=np.uint8)
    assert np.array_equal(decode_webp(encode_webp_lossless(wide)), wide)


# --------------------------------------------------------------------------
# prefix-value coding and the plane-code table
# --------------------------------------------------------------------------

def test_prefix_value_inverse():
    class FakeBR:
        def __init__(self, v, n):
            self.v, self.n = v, n

        def read(self, n):
            assert n == self.n
            return self.v

    for value in list(range(1, 70)) + [127, 128, 1000, 4096]:
        sym, extra_v, extra_n = prefix_encode_value(value)
        assert read_prefix_value(sym, FakeBR(extra_v, extra_n)) == value


def test_plane_code_table_invariants():
    assert len(PLANE_CODES) == 120 and len(set(PLANE_CODES)) == 120
    for dx, dy in PLANE_CODES:
        assert 0 <= dy <= 7 and -7 <= dx <= 8
        assert dy > 0 or dx > 0            # strictly-before in scan order
    # canonical anchors from the spec text
    assert PLANE_CODES[0] == (0, 1)        # directly above
    assert PLANE_CODES[1] == (1, 0)        # previous pixel
    assert plane_code_to_distance(100, 1) == 100
    assert plane_code_to_distance(100, 2) == 1
    assert plane_code_to_distance(100, 121 + 41) == 42  # direct form


# --------------------------------------------------------------------------
# handcrafted streams: the paths the minimal encoder does not emit
# --------------------------------------------------------------------------

def _header(bw, w, h):
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)


def _decode_chunk(bw):
    return decode_vp8l(b"\x2f" + bw.to_bytes())


def test_plane_code_distance_stream():
    """Copy with distance code 1 ((0,1) = one row up) repeats row 0."""
    w = 9
    row = rng.integers(0, 256, (1, w, 4), dtype=np.uint8)
    img = np.vstack([row, row])
    argb = rgba_to_argb(img)
    bw = BitWriter()
    _header(bw, w, 2)
    bw.write(0, 1)  # no transforms
    # image data written manually: row 0 literals, then one copy
    from inception_spark.operators.vp8l import (
        NUM_DISTANCE_CODES,
        NUM_LENGTH_CODES,
        _build_huffman_lengths,
        _write_prefix_code,
    )

    flat = [int(v) for v in argb[0]]
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    gfreq = {}
    for px in flat:
        gfreq[(px >> 8) & 0xFF] = gfreq.get((px >> 8) & 0xFF, 0) + 1
    lsym, lev, lbits = prefix_encode_value(w)   # copy length = w
    gfreq[256 + lsym] = 1
    enc_g = _write_prefix_code(
        bw, _build_huffman_lengths(gfreq), 256 + NUM_LENGTH_CODES)
    enc_r = _write_prefix_code(
        bw, _build_huffman_lengths(
            {(p >> 16) & 0xFF: 1 for p in flat}), 256)
    enc_b = _write_prefix_code(
        bw, _build_huffman_lengths({p & 0xFF: 1 for p in flat}), 256)
    enc_a = _write_prefix_code(
        bw, _build_huffman_lengths(
            {(p >> 24) & 0xFF: 1 for p in flat}), 256)
    dsym, dev, dbits = prefix_encode_value(1)   # distance CODE 1
    enc_d = _write_prefix_code(
        bw, _build_huffman_lengths({dsym: 1}), NUM_DISTANCE_CODES)
    for px in flat:
        bw.write_code(*enc_g[(px >> 8) & 0xFF])
        bw.write_code(*enc_r[(px >> 16) & 0xFF])
        bw.write_code(*enc_b[px & 0xFF])
        bw.write_code(*enc_a[(px >> 24) & 0xFF])
    bw.write_code(*enc_g[256 + lsym])
    bw.write(lev, lbits)
    bw.write_code(*enc_d[dsym])
    bw.write(dev, dbits)
    assert np.array_equal(_decode_chunk(bw), img)


def test_subtract_green_transform():
    img = rng.integers(0, 256, (6, 7, 4), dtype=np.uint8)
    argb = rgba_to_argb(img)
    g = (argb >> 8) & 0xFF
    res = ((argb & 0xFF000000)
           | ((((argb >> 16) & 0xFF) - g) & 0xFF) << 16
           | (g << 8)
           | ((argb - g) & 0xFF))
    bw = BitWriter()
    _header(bw, 7, 6)
    bw.write(1, 1)  # transform present
    bw.write(2, 2)  # SUBTRACT_GREEN
    bw.write(0, 1)  # no more transforms
    _write_image_data(bw, res.astype(np.uint32), use_lz77=False,
                      cache_bits=0, is_main=True)
    assert np.array_equal(_decode_chunk(bw), img)


def _forward_predict(argb, modes_val, bits):
    """Forward predictor residuals under the decoder's own edge rules —
    validated by the inverse reconstructing the exact image."""
    from inception_spark.operators.vp8l import _apply_predictor_inverse

    h, w = argb.shape
    modes = np.full(((h + (1 << bits) - 1) >> bits,
                     (w + (1 << bits) - 1) >> bits),
                    modes_val, dtype=np.uint32)
    # solve residuals row by row: residual = actual - pred (mod 256/ch);
    # pred depends only on already-reconstructed pixels, so compute by
    # running the inverse incrementally
    res = np.zeros_like(argb)
    for y in range(h):
        for x in range(w):
            # reconstruct prefix with current residuals
            partial = _apply_predictor_inverse(res, modes, bits)
            # choose residual so that partial[y, x] == argb[y, x]
            cur = int(partial[y, x])
            want = int(argb[y, x])
            delta = 0
            for shift in (0, 8, 16, 24):
                d = ((want >> shift) - (cur >> shift)) & 0xFF
                delta |= d << shift
            r = int(res[y, x])
            summed = 0
            for shift in (0, 8, 16, 24):
                s = (((r >> shift) & 0xFF) + ((delta >> shift) & 0xFF)) \
                    & 0xFF
                summed |= s << shift
            res[y, x] = summed
    return res, modes


@pytest.mark.parametrize("mode", [1, 2, 7, 11, 12, 13])
def test_predictor_transform(mode):
    img = rng.integers(0, 256, (5, 6, 4), dtype=np.uint8)
    argb = rgba_to_argb(img)
    bits = 2
    res, modes = _forward_predict(argb, mode, bits)
    bw = BitWriter()
    _header(bw, 6, 5)
    bw.write(1, 1)
    bw.write(0, 2)            # PREDICTOR
    bw.write(bits - 2, 3)
    mode_img = (modes.astype(np.uint32) << 8) | 0xFF000000
    _write_image_data(bw, mode_img, use_lz77=False, cache_bits=0,
                      is_main=False)
    bw.write(0, 1)            # no more transforms
    _write_image_data(bw, res, use_lz77=False, cache_bits=0, is_main=True)
    assert np.array_equal(_decode_chunk(bw), img)


def test_color_transform():
    from inception_spark.operators.vp8l import _ct_delta

    img = rng.integers(0, 256, (4, 5, 4), dtype=np.uint8)
    argb = rgba_to_argb(img)
    g2r, g2b, r2b = 0x23, 0xE9, 0x41   # mixed-sign int8 factors
    elem = 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
    h, w = argb.shape
    res = np.zeros_like(argb)
    for y in range(h):
        for x in range(w):
            px = int(argb[y, x])
            a = (px >> 24) & 0xFF
            r = (px >> 16) & 0xFF
            gg = (px >> 8) & 0xFF
            b = px & 0xFF
            rr = (r - _ct_delta(g2r, gg)) & 0xFF
            bb = (b - _ct_delta(g2b, gg) - _ct_delta(r2b, r)) & 0xFF
            res[y, x] = (a << 24) | (rr << 16) | (gg << 8) | bb
    bits = 3
    bw = BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(1, 2)            # COLOR_TRANSFORM
    bw.write(bits - 2, 3)
    elems = np.full(((h + 7) >> 3, (w + 7) >> 3), elem, dtype=np.uint32)
    _write_image_data(bw, elems, use_lz77=False, cache_bits=0,
                      is_main=False)
    bw.write(0, 1)
    _write_image_data(bw, res, use_lz77=False, cache_bits=0, is_main=True)
    assert np.array_equal(_decode_chunk(bw), img)


def test_color_indexing_with_bundling():
    palette = np.array(
        [0xFF102030, 0xFF405060, 0xFFAABBCC, 0xFF000000], dtype=np.uint32
    )
    w, h = 11, 3
    idx = rng.integers(0, 4, (h, w))
    bw = BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(3, 2)            # COLOR_INDEXING
    bw.write(len(palette) - 1, 8)
    # palette sub-image: entries delta-coded against the previous entry
    deltas = np.zeros((1, len(palette)), dtype=np.uint32)
    prev = 0
    for i, cur in enumerate(int(p) for p in palette):
        d = 0
        for shift in (0, 8, 16, 24):
            d |= (((cur >> shift) - (prev >> shift)) & 0xFF) << shift
        deltas[0, i] = d
        prev = cur
    _write_image_data(bw, deltas, use_lz77=False, cache_bits=0,
                      is_main=False)
    bw.write(0, 1)            # no more transforms
    # packed main image: 4 colors -> 2 bits/pixel, 4 px per green byte
    xbits = 2
    pw = (w + 3) >> 2
    packed = np.zeros((h, pw), dtype=np.uint32)
    for y in range(h):
        for x in range(w):
            packed[y, x >> xbits] |= int(idx[y, x]) << (
                8 + 2 * (x & 3)
            )
    packed |= 0xFF000000
    _write_image_data(bw, packed, use_lz77=False, cache_bits=0,
                      is_main=True)
    out = _decode_chunk(bw)
    want = palette[idx]
    got = rgba_to_argb(out)
    assert np.array_equal(got, want)


def test_meta_prefix_codes_two_groups():
    """Left tiles use group 0, right tiles group 1 — each group's green
    code only knows its own half's symbols, so decode succeeds ONLY by
    selecting the correct group per tile."""
    from inception_spark.operators.vp8l import (
        NUM_DISTANCE_CODES,
        NUM_LENGTH_CODES,
        _build_huffman_lengths,
        _write_prefix_code,
    )

    w = h = 8
    bits = 2                   # 4x4 tiles -> 2x2 tile grid
    img = np.zeros((h, w, 4), np.uint8)
    img[:, :4] = [10, 1, 5, 255]    # left half: green 1
    img[:, 4:] = [20, 2, 6, 255]    # right half: green 2
    argb = rgba_to_argb(img)

    bw = BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)             # no transforms
    bw.write(0, 1)             # no cache
    bw.write(1, 1)             # meta prefix codes present
    bw.write(bits - 2, 3)
    # entropy image 2x2: group id in (red<<8)|green -> green channel
    meta = np.array([[0, 1], [0, 1]], dtype=np.uint32) << 8
    meta |= 0xFF000000
    _write_image_data(bw, meta, use_lz77=False, cache_bits=0,
                      is_main=False)
    encs = []
    for green, red, blue in ((1, 10, 5), (2, 20, 6)):
        eg = _write_prefix_code(
            bw, _build_huffman_lengths({green: 1}),
            256 + NUM_LENGTH_CODES)
        er = _write_prefix_code(bw, _build_huffman_lengths({red: 1}), 256)
        eb = _write_prefix_code(bw, _build_huffman_lengths({blue: 1}), 256)
        ea = _write_prefix_code(bw, _build_huffman_lengths({255: 1}), 256)
        ed = _write_prefix_code(
            bw, _build_huffman_lengths({0: 1}), NUM_DISTANCE_CODES)
        encs.append((eg, er, eb, ea, ed))
    for y in range(h):
        for x in range(w):
            px = int(argb[y, x])
            eg, er, eb, ea, _ = encs[0 if x < 4 else 1]
            bw.write_code(*eg[(px >> 8) & 0xFF])
            bw.write_code(*er[(px >> 16) & 0xFF])
            bw.write_code(*eb[px & 0xFF])
            bw.write_code(*ea[(px >> 24) & 0xFF])
    assert np.array_equal(_decode_chunk(bw), img)


# --------------------------------------------------------------------------
# container handling and refusals
# --------------------------------------------------------------------------

def test_vp8x_extended_container():
    import struct

    img = rng.integers(0, 256, (3, 4, 4), dtype=np.uint8)
    plain = encode_webp_lossless(img)
    vp8l_chunk = plain[20:]  # header(12) + "VP8L" + size(4)
    vp8l_size = struct.unpack("<I", plain[16:20])[0]
    vp8x = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
    body = b"WEBP" + vp8x + b"VP8L" + struct.pack("<I", vp8l_size) + \
        vp8l_chunk
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    assert np.array_equal(decode_webp(data), img)


def test_lossy_vp8_refuses():
    import struct

    body = b"WEBP" + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
    with pytest.raises(DecoderUnavailable, match="lossy"):
        decode_webp(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_garbage_refuses():
    with pytest.raises(DecoderUnavailable):
        decode_webp(b"NOPE" + b"\x00" * 30)
    with pytest.raises(DecoderUnavailable):
        decode_vp8l(b"\x00\x01\x02")


def test_decode_image_dispatches_webp(spark):
    """multimodal.decode_image now handles lossless WebP natively — the
    round-5 refusal is closed; the same pixels hash identically through
    the perceptual dedup path regardless of container."""
    from inception_spark.operators.multimodal import decode_image, dhash64

    img = np.repeat(
        np.repeat(rng.integers(0, 256, (4, 5, 4), dtype=np.uint8), 3, 0),
        3, 1,
    )
    rgb = decode_image(encode_webp_lossless(img))
    assert rgb.shape == (12, 15, 3)
    assert np.array_equal(rgb, img[..., :3])
    # cross-codec: WebP and BMP encodings of the same pixels → same hash
    from inception_spark.operators.multimodal import encode_bmp

    assert dhash64(rgb) == dhash64(decode_image(encode_bmp(img[..., :3])))


# --------------------------------------------------------------------------
# property-based fuzz: any image, any encoder configuration, bit-exact
# --------------------------------------------------------------------------

def test_round_trip_fuzz():
    """200 random (shape, palette-size, lz77, cache) configurations —
    every one must round-trip bit-exactly.  Catches interactions the
    targeted tests can't enumerate (e.g. a simple code for one channel
    alongside a deep normal code for another, runs crossing row
    boundaries under a small cache)."""
    import random

    rnd = random.Random(99)
    for trial in range(200):
        h = rnd.randint(1, 12)
        w = rnd.randint(1, 40)
        n_colors = rnd.choice([1, 2, 3, 8, 64, 256])
        palette = [
            tuple(rnd.randrange(256) for _ in range(4))
            for _ in range(n_colors)
        ]
        img = np.array(
            [[palette[rnd.randrange(n_colors)] for _ in range(w)]
             for _ in range(h)],
            dtype=np.uint8,
        )
        kw = {
            "use_lz77": rnd.random() < 0.5,
            "cache_bits": rnd.choice([0, 0, 1, 4, 8]),
        }
        got = decode_webp(encode_webp_lossless(img, **kw))
        assert np.array_equal(got, img), (trial, img.shape, kw)
