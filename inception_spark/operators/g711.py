"""G.711 (mu-law / A-law) and IMA ADPCM WAV decode — the telephony and
speech-corpus formats 16-bit-PCM-only ingestion silently drops.

The stdlib ``wave`` module refuses non-PCM fmt tags, so this module
carries its own minimal RIFF chunk walk plus vectorized integer
expanders.  Everything is closed-form integer arithmetic (the G.711
tables ARE formulas), so the corpus entry's oracle replays the
expansion in pure SQL, and tests cross-validate all 256 code points of
both laws against the CPython ``audioop`` implementation (the
libjpeg/giflib protocol applied to audio).
"""

from __future__ import annotations

import struct

import numpy as np

from inception_spark.operators.multimodal import DecoderUnavailable

# WAVE fmt tags
WAVE_PCM = 1
WAVE_ALAW = 6
WAVE_MULAW = 7
WAVE_IMA_ADPCM = 0x11


def ulaw_to_linear(codes: np.ndarray) -> np.ndarray:
    """G.711 mu-law expansion, vectorized: 8-bit code -> int16 linear.
    Matches audioop.ulaw2lin bit-for-bit (pinned over all 256 codes)."""
    u = (~np.asarray(codes, dtype=np.uint8)).astype(np.int32) & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign != 0, -mag, mag).astype(np.int16)


_ULAW_SEG_END = np.array(
    [0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF],
    dtype=np.int32,
)


def linear_to_ulaw(samples: np.ndarray) -> np.ndarray:
    """Inverse companding (for fixtures/round-trips): the exact G.711
    14-bit segment search audioop.lin2ulaw implements — integer all
    the way (a float-log2 exponent disagrees at the 381 segment-
    boundary values; pinned over the full int16 domain)."""
    x14 = np.asarray(samples, dtype=np.int32) >> 2
    mask = np.where(x14 < 0, 0x7F, 0xFF)
    v = np.where(x14 < 0, -x14, x14)
    v = np.minimum(v, 8159) + 33
    seg = np.searchsorted(_ULAW_SEG_END, v)
    segc = np.minimum(seg, 7)
    uval = np.where(
        seg >= 8,  # out of range: g711.c returns the max-magnitude code
        0x7F,
        (segc << 4) | ((v >> (segc + 1)) & 0x0F),
    )
    return (uval ^ mask).astype(np.uint8)


def alaw_to_linear(codes: np.ndarray) -> np.ndarray:
    """G.711 A-law expansion, vectorized: 8-bit code -> int16 linear.
    Matches audioop.alaw2lin bit-for-bit (pinned over all 256 codes)."""
    a = np.asarray(codes, dtype=np.uint8).astype(np.int32) ^ 0x55
    sign = a & 0x80
    exp = (a >> 4) & 0x07
    mant = a & 0x0F
    mag = np.where(
        exp == 0,
        (mant << 4) + 8,
        ((mant << 4) + 0x108) << (exp - 1),
    )
    return np.where(sign != 0, mag, -mag).astype(np.int16)


_IMA_INDEX_ADJUST = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8],
    dtype=np.int32,
)
_IMA_STEPS = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
        34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
        143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408,
        449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282,
        1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327,
        3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630,
        9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350,
        22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int32,
)


def ima_adpcm_decode_block(block: bytes) -> np.ndarray:
    """One mono IMA-ADPCM WAV block -> int16 samples.  Block layout
    (Microsoft WAVE spec): int16 predictor, uint8 step index, one
    reserved byte, then packed nibbles LOW-FIRST; the header predictor
    IS the first output sample."""
    if len(block) < 4:
        raise DecoderUnavailable("truncated IMA ADPCM block")
    pred = struct.unpack("<h", block[:2])[0]
    idx = block[2]
    if idx > 88:
        raise DecoderUnavailable(f"bad IMA ADPCM step index {idx}")
    out = [pred]
    data = np.frombuffer(block[4:], dtype=np.uint8)
    nibbles = np.empty(data.size * 2, dtype=np.uint8)
    nibbles[0::2] = data & 0x0F
    nibbles[1::2] = data >> 4
    pred = int(pred)
    idx = int(idx)
    for n in nibbles:
        step = int(_IMA_STEPS[idx])
        diff = step >> 3
        if n & 1:
            diff += step >> 2
        if n & 2:
            diff += step >> 1
        if n & 4:
            diff += step
        if n & 8:
            pred -= diff
        else:
            pred += diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + int(_IMA_INDEX_ADJUST[n])))
        out.append(pred)
    return np.asarray(out, dtype=np.int16)


def _riff_chunks(payload: bytes):
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise DecoderUnavailable("not a WAV payload")
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        yield cid, body
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def decode_wav_any(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV -> (mono int16 samples, sample_rate) across fmt tags:
    PCM16 (1), A-law (6), mu-law (7), IMA ADPCM (0x11, mono).  Stereo
    PCM/G.711 averages to mono; other tags raise DecoderUnavailable
    with the tag named (the declared-not-hidden taxonomy)."""
    fmt = None
    data = None
    for cid, body in _riff_chunks(payload):
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise DecoderUnavailable("WAV missing fmt/data chunks")
    tag, ch, rate = struct.unpack("<HHI", fmt[:8])
    block_align = struct.unpack("<H", fmt[12:14])[0]
    if tag == WAVE_PCM:
        bits = struct.unpack("<H", fmt[14:16])[0]
        if bits == 16:
            x = np.frombuffer(
                data[: (len(data) // (2 * ch)) * 2 * ch], dtype="<i2"
            )
        elif bits == 8:
            # 8-bit PCM is UNSIGNED by spec; widen to int16
            u = np.frombuffer(
                data[: (len(data) // ch) * ch], dtype=np.uint8
            )
            x = ((u.astype(np.int16) - 128) << 8).astype(np.int16)
        elif bits == 24:
            # 3-byte little-endian signed; keep the top 16 bits
            nb = (len(data) // (3 * ch)) * 3 * ch
            b = np.frombuffer(data[:nb], dtype=np.uint8).reshape(-1, 3)
            full = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            full = np.where(full >= 1 << 23, full - (1 << 24), full)
            x = (full >> 8).astype(np.int16)
        elif bits == 32:
            i32 = np.frombuffer(
                data[: (len(data) // (4 * ch)) * 4 * ch], dtype="<i4"
            )
            x = (i32 >> 16).astype(np.int16)
        else:
            raise DecoderUnavailable(f"PCM width {bits} unsupported")
    elif tag in (WAVE_ALAW, WAVE_MULAW):
        codes = np.frombuffer(data, dtype=np.uint8)
        x = (
            ulaw_to_linear(codes)
            if tag == WAVE_MULAW
            else alaw_to_linear(codes)
        )
    elif tag == WAVE_IMA_ADPCM:
        if ch != 1:
            raise DecoderUnavailable("IMA ADPCM decode is mono-only")
        blocks = [
            data[i : i + block_align]
            for i in range(0, len(data), block_align)
        ]
        x = np.concatenate(
            [ima_adpcm_decode_block(b) for b in blocks if len(b) >= 4]
        )
        ch = 1
    else:
        raise DecoderUnavailable(f"WAV fmt tag 0x{tag:x} unsupported")
    if ch > 1:
        x = (
            x.reshape(-1, ch)
            .astype(np.int32)
            .mean(axis=1)
            .astype(np.int16)
        )
    return x.astype(np.int16), int(rate)


def encode_g711_wav(
    codes: np.ndarray, rate: int, *, law: str = "ulaw"
) -> bytes:
    """Raw 8-bit G.711 code bytes -> a canonical mono WAV container
    (fmt tag 6/7).  The codes are stored verbatim — this is a
    container writer, not a compander."""
    tag = WAVE_MULAW if law == "ulaw" else WAVE_ALAW
    body = np.asarray(codes, dtype=np.uint8).tobytes()
    fmt = struct.pack("<HHIIHH", tag, 1, int(rate), int(rate), 1, 8)
    chunks = b"".join(
        [
            b"fmt ", struct.pack("<I", len(fmt)), fmt,
            b"data", struct.pack("<I", len(body)),
            body + (b"\x00" if len(body) & 1 else b""),
        ]
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
