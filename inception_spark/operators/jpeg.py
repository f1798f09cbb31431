"""Baseline JPEG (ITU-T T.81) codec — pure Python + numpy, no PIL.

The last common training-corpus image format the codec layer could not
touch natively (reference scope: the embedding service leaves media
handling to callers; this engine's multimodal layer decodes what the
environment allows — BMP/netpbm/PNG/GIF/WAV are already native).  This
module adds **baseline sequential DCT** JPEG:

* :func:`decode_jpeg` — marker parse (DQT/SOF0/DHT/DRI/SOS), Huffman
  entropy decode with 0xFF00 un-stuffing and RSTn restart handling,
  dequantize → inverse zigzag → 8×8 IDCT (orthonormal DCT matrix,
  numpy), chroma upsampling for 4:2:0/4:2:2 by replication, YCbCr→RGB
  (BT.601 JPEG variant).  Grayscale (1 component) and 3-component
  images; progressive (SOF2), arithmetic coding, 12-bit precision and
  4-component CMYK refuse with :class:`DecoderUnavailable` — honest
  refusal, never a wrong pixel.
* :func:`encode_jpeg` — the proof harness for the decoder: 4:4:4
  baseline encoder with the T.81 Annex K quantization + Huffman tables
  (libjpeg quality scaling), used by the round-trip tests.

Both directions are additionally CROSS-VALIDATED against the real
system libjpeg (``libjpeg.so.62``, driven through a compiled shim in
``tests/test_jpeg_png_crossdecode.py``): libjpeg-encoded payloads
(4:4:4/4:2:0/4:2:2, grayscale, restart markers) decode within IDCT
tolerance of libjpeg's own decode, and :func:`encode_jpeg` payloads
decode under libjpeg — so the spec transcription is checked against
the reference implementation, not only against itself.

Scale shape: like every codec here, this is worker-side Python invoked
from the declared `mapInPandas` families — decode cost is per-payload
and embarrassingly parallel; nothing touches the driver.
"""

from __future__ import annotations

import struct

import numpy as np

from inception_spark.operators.multimodal import DecoderUnavailable

# ---------------------------------------------------------------------------
# T.81 Annex K tables
# ---------------------------------------------------------------------------

_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# zigzag order: _ZIGZAG[i] = raster index of the i-th zigzag coefficient
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# standard Huffman specs: (BITS[1..16], HUFFVAL)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# orthonormal 8-point DCT-II matrix: block_dct = C @ block @ C.T
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16) * (
            np.sqrt(0.25) if _k else np.sqrt(0.125)
        )


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality → table scaling."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (base * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


# ---------------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------------

def _huff_codes(bits, vals):
    """Canonical code assignment (T.81 C.2): {symbol: (code, length)}."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffDecoder:
    """MSB-first canonical Huffman decoder (per-length first-code table)."""

    def __init__(self, bits, vals):
        self.maxcode = [-1] * 17
        self.mincode = [0] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            if bits[ln - 1]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1
        self.vals = vals

    def decode(self, br) -> int:
        code = br.bit()
        ln = 1
        while code > self.maxcode[ln] or self.maxcode[ln] < 0:
            ln += 1
            if ln > 16:
                raise DecoderUnavailable("jpeg: corrupt Huffman stream")
            code = (code << 1) | br.bit()
        return self.vals[self.valptr[ln] + code - self.mincode[ln]]


class _BitReader:
    """MSB-first bit reader over entropy-coded data with FF00 unstuffing;
    stops at any non-RST0-7 marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise DecoderUnavailable("jpeg: truncated entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1
                else:
                    # marker inside entropy data: expose it, feed 0 bits
                    self.marker = nxt
                    b = 0
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self):
        """Skip to just past the next marker (for RSTn)."""
        self.nbits = 0
        self.marker = None
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                m = self.data[self.pos + 1]
                self.pos += 2
                return m
            self.pos += 1
        raise DecoderUnavailable("jpeg: missing restart marker")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1: map the t-bit received value to its signed DIFF."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG → uint8 array (h, w, 3) RGB (grayscale replicated).

    Refuses (DecoderUnavailable) progressive/arithmetic/12-bit/CMYK
    streams rather than guessing."""
    if payload[:2] != b"\xff\xd8":
        raise DecoderUnavailable("jpeg: missing SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    hdec: dict[tuple[int, int], _HuffDecoder] = {}
    restart = 0
    frame = None
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise DecoderUnavailable("jpeg: marker sync lost")
        m = payload[pos + 1]
        pos += 2
        if m == 0xD9:  # EOI
            break
        if m in (0x01,) or 0xD0 <= m <= 0xD7:
            continue  # parameterless
        seglen = struct.unpack(">H", payload[pos:pos + 2])[0]
        seg = payload[pos + 2:pos + seglen]
        if m == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq != 0:
                    raise DecoderUnavailable("jpeg: 16-bit quant tables")
                qtables[tq] = np.frombuffer(
                    seg[p:p + 64], dtype=np.uint8
                ).astype(np.int32)
                p += 64
        elif m == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17:p + 17 + nv])
                hdec[(tc, th)] = _HuffDecoder(bits, vals)
                p += 17 + nv
        elif m == 0xC0 or m == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise DecoderUnavailable("jpeg: 12-bit precision")
            if nc not in (1, 3):
                raise DecoderUnavailable(f"jpeg: {nc}-component (CMYK?)")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise DecoderUnavailable(
                "jpeg: progressive/extended/arithmetic coding unsupported"
            )
        elif m == 0xDD:  # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif m == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise DecoderUnavailable("jpeg: SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(
                    c for c in frame["comps"] if c["id"] == cs
                )
                scan.append((comp, tt >> 4, tt & 0xF))
            return _decode_scan(
                payload, pos + seglen, frame, scan, qtables, hdec, restart
            )
        pos += seglen
    raise DecoderUnavailable("jpeg: no scan data")


def _decode_scan(data, pos, frame, scan, qtables, hdec, restart):
    h, w = frame["h"], frame["w"]
    comps = [c for c, _, _ in scan]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise DecoderUnavailable("jpeg: sampling factors beyond 2x2")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes.append(np.zeros((ph, pw), dtype=np.float64))
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_i and mcu_i % restart == 0:
                m = br.align_to_marker()
                if not (0xD0 <= m <= 0xD7):
                    raise DecoderUnavailable("jpeg: expected RSTn")
                pred = [0] * len(comps)
            for ci, (c, td, ta) in enumerate(scan):
                q = qtables.get(c["tq"])
                if q is None:
                    raise DecoderUnavailable("jpeg: missing quant table")
                dc_t = hdec.get((0, td))
                ac_t = hdec.get((1, ta))
                if dc_t is None or ac_t is None:
                    raise DecoderUnavailable("jpeg: missing Huffman table")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        t = dc_t.decode(br)
                        pred[ci] += _extend(br.receive(t), t)
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = ac_t.decode(br)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise DecoderUnavailable(
                                    "jpeg: AC index overflow"
                                )
                            zz[k] = _extend(br.receive(s), s)
                            k += 1
                        # q arrives zigzag-ordered (DQT stream order),
                        # zz is zigzag too: dequantize elementwise, then
                        # scatter into raster positions
                        blk = np.zeros(64, dtype=np.float64)
                        blk[_ZIGZAG] = (zz * q).astype(np.float64)
                        spatial = _C.T @ blk.reshape(8, 8) @ _C
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = spatial
            mcu_i += 1
    # upsample to full MCU-padded resolution, crop, color-convert
    full = []
    for c, pl in zip(comps, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            pl = np.repeat(np.repeat(pl, ry, axis=0), rx, axis=1)
        full.append(pl[:h, :w] + 128.0)
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (4:4:4 baseline — the decoder's proof harness)
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self):
        if self.nbits:
            self.acc = (self.acc << (8 - self.nbits)) | ((1 << (8 - self.nbits)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


def _csize(v: int) -> int:
    t = 0
    a = abs(v)
    while a:
        t += 1
        a >>= 1
    return t


def _encode_block(bw, blk, q, dct, act, pred, ci):
    coef = _C @ blk @ _C.T
    # divide raster coefficients by the raster table, then reorder to
    # zigzag (the entropy-coding order)
    zz = np.round(coef.reshape(64) / q).astype(np.int64)[_ZIGZAG]
    diff = int(zz[0]) - pred[ci]
    pred[ci] = int(zz[0])
    t = _csize(diff)
    code, ln = dct[t]
    bw.put(code, ln)
    if t:
        bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c16, l16 = act[0xF0]
            bw.put(c16, l16)
            run -= 16
        s = _csize(v)
        code, ln = act[(run << 4) | s]
        bw.put(code, ln)
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = act[0x00]
        bw.put(code, ln)


def _pad_to(pl: np.ndarray, ph: int, pw: int) -> np.ndarray:
    h, w = pl.shape
    pp = np.empty((ph, pw))
    pp[:h, :w] = pl
    pp[h:, :w] = pl[-1:, :]
    pp[:, w:] = pp[:, w - 1:w]
    return pp


def encode_jpeg(
    img: np.ndarray,
    *,
    quality: int = 85,
    restart_interval: int = 0,
    subsample: bool = False,
) -> bytes:
    """Encode (h, w, 3) or (h, w) uint8 → baseline JFIF bytes.

    ``subsample=True`` writes 4:2:0 (luma 2×2, chroma box-averaged and
    coded at quarter resolution — the dominant real-world layout);
    default is 4:4:4.  ``restart_interval`` > 0 emits DRI + RSTn every
    that many MCUs (predictor reset, byte-aligned).  Both switches exist
    so the decoder's subsampled and restart paths are provable by
    round-trip without any third-party codec."""
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    h, w = img.shape[:2]
    r = img[..., 0].astype(np.float64)
    g = img[..., 1].astype(np.float64)
    b = img[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    if subsample:
        # box-average 2×2 (edge-replicate odd dims first)
        ch, cw = -(-h // 2) * 2, -(-w // 2) * 2
        cb = _pad_to(cb, ch, cw)
        cr = _pad_to(cr, ch, cw)
        cb = cb.reshape(ch // 2, 2, cw // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(ch // 2, 2, cw // 2, 2).mean(axis=(1, 3))
        hv = [(2, 2), (1, 1), (1, 1)]
    else:
        hv = [(1, 1), (1, 1), (1, 1)]
    qy = _quality_scale(_QT_LUMA, quality)
    qc = _quality_scale(_QT_CHROMA, quality)
    dcl, dcc = _huff_codes(*_DC_LUMA), _huff_codes(*_DC_CHROMA)
    acl, acc = _huff_codes(*_AC_LUMA), _huff_codes(*_AC_CHROMA)
    hmax = max(hh for hh, _ in hv)
    vmax = max(vv for _, vv in hv)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    comps = []
    for (pl, q, dct, act), (ch_, cv) in zip(
        [(y, qy, dcl, acl), (cb, qc, dcc, acc), (cr, qc, dcc, acc)], hv
    ):
        comps.append(
            {
                "pl": _pad_to(pl, mcuy * 8 * cv, mcux * 8 * ch_),
                "q": q, "dct": dct, "act": act, "h": ch_, "v": cv,
            }
        )

    bw = _BitWriter()
    pred = [0, 0, 0]
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.flush()
                bw.out += bytes(
                    [0xFF, 0xD0 + ((mcu_i // restart_interval - 1) % 8)]
                )
                pred = [0, 0, 0]
            mcu_i += 1
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        blk = c["pl"][y0:y0 + 8, x0:x0 + 8] - 128.0
                        _encode_block(
                            bw, blk, c["q"], c["dct"], c["act"], pred, ci
                        )
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(qy[_ZIGZAG].astype(np.uint8)))
    out += seg(0xDB, bytes([1]) + bytes(qc[_ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for i, (ch_, cv) in enumerate(hv):
        sof += bytes([i + 1, (ch_ << 4) | cv, 0 if i == 0 else 1])
    out += seg(0xC0, sof)
    for tc_th, (bits, vals) in (
        (0x00, _DC_LUMA), (0x01, _DC_CHROMA),
        (0x10, _AC_LUMA), (0x11, _AC_CHROMA),
    ):
        out += seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
