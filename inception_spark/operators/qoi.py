"""QOI (Quite OK Image) codec — pure-Python, zero-dependency.

Implements the complete public QOI specification (qoiformat.org,
``qoi-specification.pdf``, 2022 — one page: 14-byte header, six chunk
ops, 8-byte end marker).  QOI is the simplest widely-deployed lossless
image format and a common interchange format in dataset tooling, so the
multimodal pipeline decodes it natively next to BMP/netpbm/PNG/GIF/
JPEG/VP8L.

Both directions are implemented; the encoder exists so the decoder is
proven by round-trips over every op type (the GIF/JPEG/VP8L proof
pattern — see tests/test_qoi.py), not by trusting transcribed tables.

The reference has no image surface at all (SURVEY.md §2.5); this module
is part of the training-pipeline multimodal mandate.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"qoif"
_END = b"\x00" * 7 + b"\x01"

_OP_INDEX = 0x00
_OP_DIFF = 0x40
_OP_LUMA = 0x80
_OP_RUN = 0xC0
_OP_RGB = 0xFE
_OP_RGBA = 0xFF


class QoiFormatError(ValueError):
    """Raised on a structurally invalid QOI payload."""


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def decode_qoi(payload: bytes) -> np.ndarray:
    """QOI bytes → (H, W, channels) uint8 array (channels from the
    header: 3 = RGB, 4 = RGBA)."""
    if payload[:4] != _MAGIC:
        raise QoiFormatError("not a QOI payload")
    if len(payload) < 14 + len(_END):
        raise QoiFormatError("truncated QOI header")
    w, h = struct.unpack(">II", payload[4:12])
    channels, colorspace = payload[12], payload[13]
    if channels not in (3, 4):
        raise QoiFormatError(f"bad channel count {channels}")
    if colorspace not in (0, 1):
        raise QoiFormatError(f"bad colorspace {colorspace}")
    n_px = w * h
    if n_px == 0:
        raise QoiFormatError("zero-pixel image")
    out = np.empty((n_px, 4), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos, i = 14, 0
    data = payload
    end = len(data) - len(_END)
    if data[end:] != _END:
        raise QoiFormatError("missing QOI end marker")
    while i < n_px:
        if pos >= end:
            raise QoiFormatError("truncated QOI chunk stream")
        byte = data[pos]
        pos += 1
        if byte == _OP_RGB:
            if pos + 3 > end:  # operands must not eat the end marker
                raise QoiFormatError("truncated QOI chunk stream")
            r, g, b = data[pos], data[pos + 1], data[pos + 2]
            pos += 3
        elif byte == _OP_RGBA:
            if pos + 4 > end:
                raise QoiFormatError("truncated QOI chunk stream")
            r, g, b, a = data[pos], data[pos + 1], data[pos + 2], data[pos + 3]
            pos += 4
        else:
            op = byte & 0xC0
            if op == _OP_INDEX:
                r, g, b, a = index[byte & 0x3F]
            elif op == _OP_DIFF:
                r = (r + ((byte >> 4) & 0x03) - 2) & 0xFF
                g = (g + ((byte >> 2) & 0x03) - 2) & 0xFF
                b = (b + (byte & 0x03) - 2) & 0xFF
            elif op == _OP_LUMA:
                dg = (byte & 0x3F) - 32
                if pos + 1 > end:
                    raise QoiFormatError("truncated QOI chunk stream")
                nxt = data[pos]
                pos += 1
                r = (r + dg + ((nxt >> 4) & 0x0F) - 8) & 0xFF
                g = (g + dg) & 0xFF
                b = (b + dg + (nxt & 0x0F) - 8) & 0xFF
            else:  # _OP_RUN
                run = (byte & 0x3F) + 1
                if i + run > n_px:
                    raise QoiFormatError("QOI run overflows pixel count")
                out[i : i + run] = (r, g, b, a)
                i += run
                continue
        index[_hash(r, g, b, a)] = (r, g, b, a)
        out[i] = (r, g, b, a)
        i += 1
    return out.reshape(h, w, 4)[..., :channels].copy()


def encode_qoi(img: np.ndarray, *, channels: int | None = None) -> bytes:
    """(H, W, 3|4) uint8 array → QOI bytes.  A conforming (not maximally
    clever) encoder: emits RUN / INDEX / DIFF / LUMA when applicable,
    RGB/RGBA otherwise — every op type the decoder must handle."""
    if img.ndim != 3 or img.shape[2] not in (3, 4):
        raise ValueError("encode_qoi needs an (H, W, 3|4) array")
    h, w = img.shape[:2]
    if channels is None:
        channels = img.shape[2]
    px = np.empty((h * w, 4), dtype=np.uint8)
    px[:, :3] = img.reshape(-1, img.shape[2])[:, :3]
    px[:, 3] = img.reshape(-1, img.shape[2])[:, 3] if img.shape[2] == 4 else 255
    out = bytearray()
    out += _MAGIC + struct.pack(">II", w, h) + bytes([channels, 0])
    index = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    for r, g, b, a in map(tuple, px.tolist()):
        if (r, g, b, a) == (pr, pg, pb, pa):
            run += 1
            if run == 62:
                out.append(_OP_RUN | (run - 1))
                run = 0
            continue
        if run:
            out.append(_OP_RUN | (run - 1))
            run = 0
        hsh = _hash(r, g, b, a)
        if index[hsh] == (r, g, b, a):
            out.append(_OP_INDEX | hsh)
        elif a == pa:
            dr = (r - pr + 128) % 256 - 128
            dg = (g - pg + 128) % 256 - 128
            db = (b - pb + 128) % 256 - 128
            if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                out.append(_OP_DIFF | ((dr + 2) << 4) | ((dg + 2) << 2)
                           | (db + 2))
            elif (-32 <= dg <= 31 and -8 <= dr - dg <= 7
                  and -8 <= db - dg <= 7):
                out.append(_OP_LUMA | (dg + 32))
                out.append(((dr - dg + 8) << 4) | (db - dg + 8))
            else:
                out += bytes([_OP_RGB, r, g, b])
        else:
            out += bytes([_OP_RGBA, r, g, b, a])
        index[hsh] = (r, g, b, a)
        pr, pg, pb, pa = r, g, b, a
    if run:
        out.append(_OP_RUN | (run - 1))
    out += _END
    return bytes(out)
