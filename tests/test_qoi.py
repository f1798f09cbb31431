"""QOI codec: spec conformance proven by encoder/decoder round-trips
exercising every chunk op, plus handcrafted streams for the ops the
encoder's heuristics might skip, plus malformed-payload refusals."""

import struct

import numpy as np
import pytest

from inception_spark.operators.qoi import (
    QoiFormatError,
    decode_qoi,
    encode_qoi,
)


def _rng(seed):
    return np.random.default_rng(seed)


def test_roundtrip_random_rgb():
    img = _rng(1).integers(0, 256, (23, 17, 3), dtype=np.uint8)
    assert np.array_equal(decode_qoi(encode_qoi(img)), img)


def test_roundtrip_random_rgba():
    img = _rng(2).integers(0, 256, (9, 31, 4), dtype=np.uint8)
    assert np.array_equal(decode_qoi(encode_qoi(img)), img)


def test_roundtrip_exercises_run_and_index():
    # long flat spans -> RUN (incl. the 62-cap split); a repeating
    # 3-color palette -> INDEX hits
    base = np.zeros((8, 40, 3), dtype=np.uint8)
    base[:, :20] = (200, 10, 10)
    pal = np.array([(1, 2, 3), (9, 9, 9), (1, 2, 3)], dtype=np.uint8)
    base[:, 20:23] = pal
    enc = encode_qoi(base)
    ops = {b & 0xC0 for b in enc[14:-8] if b not in (0xFE, 0xFF)}
    assert 0xC0 in ops  # RUN present
    assert np.array_equal(decode_qoi(enc), base)


def test_roundtrip_exercises_diff_and_luma():
    # slow gradients -> DIFF; medium green-led steps -> LUMA
    row = np.cumsum(
        _rng(3).integers(-1, 2, (1, 200, 3), dtype=np.int16), axis=1
    ).astype(np.uint8) + 128
    enc = encode_qoi(row)
    tags = [b & 0xC0 for b in enc[14:-8] if b not in (0xFE, 0xFF)]
    assert 0x40 in tags  # DIFF
    assert np.array_equal(decode_qoi(enc), row)
    lum = np.zeros((1, 50, 3), dtype=np.uint8)
    for i in range(1, 50):
        lum[0, i] = lum[0, i - 1] + np.array([20, 20, 21], dtype=np.uint8)
    enc2 = encode_qoi(lum)
    assert any((b & 0xC0) == 0x80 for b in enc2[14:-8]
               if b not in (0xFE, 0xFF))
    assert np.array_equal(decode_qoi(enc2), lum)


def test_handcrafted_stream_all_ops():
    """A hand-assembled chunk stream (spec §, one op each) decodes to
    the pixels the spec mandates — independent of the encoder."""
    head = b"qoif" + struct.pack(">II", 6, 1) + bytes([4, 0])
    stream = bytes(
        [0xFE, 10, 20, 30]          # RGB (10,20,30,255)
        + [0xFF, 1, 2, 3, 4]        # RGBA (1,2,3,4)
        + [0x40 | (3 << 4) | (0 << 2) | 2]  # DIFF +1,-2,0 -> (2,0,3,4)
        + [0x80 | (32 + 10), ((8 - 3) << 4) | (8 + 2)]  # LUMA dg=10,dr-dg=-3,db-dg=2 -> (9,10,15,4)
        + [0xC0 | 0]                # RUN 1 (repeat previous)
        + [0x00 | (10 * 3 + 20 * 5 + 30 * 7 + 255 * 11) % 64]  # INDEX -> first px
    )
    img = decode_qoi(head + stream + b"\x00" * 7 + b"\x01")
    want = np.array(
        [[(10, 20, 30, 255), (1, 2, 3, 4), (2, 0, 3, 4),
          (9, 10, 15, 4), (9, 10, 15, 4), (10, 20, 30, 255)]],
        dtype=np.uint8,
    )
    assert np.array_equal(img, want)


def test_malformed_payloads_refuse():
    img = _rng(4).integers(0, 256, (4, 4, 3), dtype=np.uint8)
    good = encode_qoi(img)
    with pytest.raises(QoiFormatError, match="not a QOI"):
        decode_qoi(b"nope" + good[4:])
    with pytest.raises(QoiFormatError, match="end marker"):
        decode_qoi(good[:-1] + b"\x02")
    with pytest.raises(QoiFormatError, match="truncated QOI chunk"):
        # valid header+end but chunk stream cut: drop the stream bytes
        decode_qoi(good[:14] + good[-8:])
    with pytest.raises(QoiFormatError, match="channel count"):
        decode_qoi(good[:12] + b"\x05" + good[13:])


def test_decode_image_dispatches_qoi():
    from inception_spark.operators.multimodal import decode_image

    img = _rng(5).integers(0, 256, (5, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_qoi(img)), img)
    # RGBA payloads come back RGB through the shared dispatcher contract
    rgba = _rng(6).integers(0, 256, (5, 7, 4), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_qoi(rgba)), rgba[..., :3])


def test_cross_codec_same_pixels_as_png():
    """The multimodal dedup contract: QOI and PNG encodings of the same
    pixels decode identically (so they pair at hamming 0)."""
    from inception_spark.operators.multimodal import (
        decode_image,
        encode_png,
    )

    img = _rng(7).integers(0, 256, (16, 16, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_image(encode_qoi(img)), decode_image(encode_png(img))
    )


def test_final_op_missing_operands_refuses():
    """ADVICE r7: an op byte whose operands would run into the 8-byte
    end marker must raise, not decode marker bytes as pixel data."""
    head = b"qoif" + struct.pack(">II", 2, 1) + bytes([4, 0])
    end = b"\x00" * 7 + b"\x01"
    rgba = bytes([0xFF, 1, 2, 3, 4])
    for dangling in (b"\xfe", b"\xfe\x10", b"\xff\x01\x02\x03",
                     bytes([0x80 | 5])):  # RGB / RGBA / LUMA sans operands
        with pytest.raises(QoiFormatError, match="truncated QOI chunk"):
            decode_qoi(head + rgba + dangling + end)
