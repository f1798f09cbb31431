"""G.711 / IMA ADPCM cross-validation against CPython's audioop — the
libjpeg/giflib protocol applied to audio companding (audioop is the
reference C implementation of G.711 shipped with this interpreter;
import-gated because 3.13 removes it)."""

import struct

import numpy as np
import pytest

audioop = pytest.importorskip("audioop")

from inception_spark.operators.g711 import (  # noqa: E402
    alaw_to_linear,
    decode_wav_any,
    encode_g711_wav,
    ima_adpcm_decode_block,
    linear_to_ulaw,
    ulaw_to_linear,
)


def test_ulaw_expansion_all_256_codes():
    codes = np.arange(256, dtype=np.uint8)
    ref = np.frombuffer(audioop.ulaw2lin(codes.tobytes(), 2), dtype="<i2")
    assert np.array_equal(ulaw_to_linear(codes), ref)


def test_alaw_expansion_all_256_codes():
    codes = np.arange(256, dtype=np.uint8)
    ref = np.frombuffer(audioop.alaw2lin(codes.tobytes(), 2), dtype="<i2")
    assert np.array_equal(alaw_to_linear(codes), ref)


def test_ulaw_compression_full_int16_domain():
    """The encoder (fixture side) matches audioop.lin2ulaw for EVERY
    int16 value — including the 381 segment-boundary values a
    float-log2 exponent gets wrong and the deep-negative clamp."""
    lin = np.arange(-32768, 32768, dtype=np.int32)
    ref = np.frombuffer(
        audioop.lin2ulaw(lin.astype("<i2").tobytes(), 2), dtype=np.uint8
    )
    assert np.array_equal(linear_to_ulaw(lin), ref)


def test_ima_adpcm_matches_audioop_per_nibble():
    """Same nibble stream, same primed (predictor, index) state —
    audioop packs HIGH nibble first while the WAV container is
    low-first, so the test swaps packing when feeding audioop; the
    header predictor is emitted as sample 0 per the WAVE spec."""
    rng = np.random.default_rng(7)
    for pred0, idx0 in [(0, 0), (100, 20), (-2000, 60), (32000, 88)]:
        nib = rng.integers(0, 16, 128).astype(np.uint8)
        wav_pack = (nib[0::2] | (nib[1::2] << 4)).astype(np.uint8)
        aud_pack = ((nib[0::2] << 4) | nib[1::2]).astype(np.uint8)
        block = struct.pack("<hBB", pred0, idx0, 0) + wav_pack.tobytes()
        ours = ima_adpcm_decode_block(block)
        ref, _ = audioop.adpcm2lin(aud_pack.tobytes(), 2, (pred0, idx0))
        assert ours[0] == pred0
        assert np.array_equal(ours[1:], np.frombuffer(ref, "<i2"))


def test_container_roundtrip_and_wave_fallback(spark):
    """decode_wav (multimodal) transparently falls back to the g711
    path for non-PCM fmt tags and returns the same float convention
    PCM uses."""
    from inception_spark.operators.multimodal import decode_wav

    codes = np.arange(256, dtype=np.uint8)
    for law, expand in (("ulaw", ulaw_to_linear), ("alaw", alaw_to_linear)):
        payload = encode_g711_wav(codes, 8000, law=law)
        x16, rate = decode_wav_any(payload)
        assert rate == 8000
        assert np.array_equal(x16, expand(codes))
        xf, rate2 = decode_wav(payload)
        assert rate2 == 8000
        assert np.allclose(xf, x16.astype(np.float64) / 32768.0)


def test_unsupported_tag_is_declared():
    from inception_spark.operators.multimodal import DecoderUnavailable

    # build a WAV with fmt tag 2 (MS ADPCM — not implemented)
    fmt = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 4)
    body = b"\x00" * 8
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(body)) + body)
    wav = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    with pytest.raises(DecoderUnavailable, match="0x2"):
        decode_wav_any(wav)


def test_pcm_widths_8_24_32(spark):
    """8-bit (unsigned), 24-bit and 32-bit PCM all decode through the
    RIFF walk; stdlib wave writes the containers, so the container side
    is reference-produced."""
    import io
    import wave as wv

    from inception_spark.operators.multimodal import decode_wav

    vals16 = np.array([-32768, -1, 0, 1, 32767, 12345, -12345],
                      dtype=np.int16)

    def container(width, frames):
        buf = io.BytesIO()
        with wv.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(width)
            w.setframerate(8000)
            w.writeframes(frames)
        return buf.getvalue()

    # 8-bit: unsigned bytes; expected int16 = (u - 128) << 8
    u8 = np.array([0, 1, 127, 128, 200, 255], dtype=np.uint8)
    x, rate = decode_wav(container(1, u8.tobytes()))
    assert rate == 8000
    want = ((u8.astype(np.int16) - 128) << 8).astype(np.int16)
    assert np.array_equal(np.round(x * 32768).astype(np.int16), want)

    # 24-bit: int16 values widened to 24 by <<8 must round-trip exactly
    b24 = b"".join(
        int(v << 8).to_bytes(3, "little", signed=True) for v in vals16
    )
    x, _ = decode_wav(container(3, b24))
    assert np.array_equal(np.round(x * 32768).astype(np.int16), vals16)

    # 32-bit: int16 << 16 round-trips exactly
    x, _ = decode_wav(container(4, (vals16.astype("<i4") << 16).tobytes()))
    assert np.array_equal(np.round(x * 32768).astype(np.int16), vals16)
