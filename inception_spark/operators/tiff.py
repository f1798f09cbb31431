"""Baseline TIFF codec in pure numpy/stdlib — the next multimodal
format after BMP/netpbm/PNG/GIF/VP8L/QOI/JPEG (reference scope: the
reference pipeline is text-only, `/root/reference/inception/main.py`;
media columns extend it per the build brief).

Covers the training-corpus common case: 8-bit samples, grayscale /
RGB / palette, strip-organized, Compression 1 (none) or 5 (LZW, with
horizontal Predictor 2), both byte orders.  Tiles, 16-bit samples,
JPEG-in-TIFF and planar-separate layouts raise ``DecoderUnavailable``
honestly — the declared-not-hidden taxonomy multimodal.py uses.

TIFF LZW differs from GIF LZW everywhere it can: MSB-first bit
packing, fixed 9-bit initial width, Clear=256/EOI=257, and the
"early change" rule — the code width bumps one entry BEFORE the
table actually overflows the current width (TIFF6 spec, p.61).
Cross-validated bidirectionally against the system libtiff in
tests/test_tiff_crossdecode.py.
"""

from __future__ import annotations

import struct

import numpy as np

from inception_spark.operators.multimodal import DecoderUnavailable

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def _read_ifd_values(payload, entry, bo):
    """All values of one IFD entry (tag, type, count, value/offset)."""
    tag, typ, cnt = struct.unpack(bo + "HHI", entry[:8])
    size = _TYPE_SIZE.get(typ)
    if size is None:
        return tag, []
    total = size * cnt
    if total <= 4:
        raw = entry[8 : 8 + total]
    else:
        (off,) = struct.unpack(bo + "I", entry[8:12])
        raw = payload[off : off + total]
        if len(raw) < total:
            raise DecoderUnavailable("TIFF IFD value overruns payload")
    if typ == 3:
        vals = list(struct.unpack(bo + "H" * cnt, raw))
    elif typ == 4:
        vals = list(struct.unpack(bo + "I" * cnt, raw))
    elif typ in (1, 6, 7):
        vals = list(raw)
    elif typ == 5:
        vals = [
            struct.unpack(bo + "II", raw[i : i + 8]) for i in range(0, total, 8)
        ]
    else:
        vals = list(raw)
    return tag, vals


def _tiff_lzw(data: bytes, expect: int) -> bytes:
    """TIFF-variant LZW: MSB-first bits, 9-bit initial codes,
    Clear=256 / EOI=257, EARLY code-width change (the width grows when
    the table reaches 2^w - 1, one entry before a GIF decoder would)."""
    out = bytearray()
    table: list = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    acc = 0
    nacc = 0
    old: bytes | None = None
    pos = 0
    n = len(data)
    while len(out) < expect:
        while nacc < width:
            if pos >= n:
                raise DecoderUnavailable("truncated TIFF LZW stream")
            acc = (acc << 8) | data[pos]
            pos += 1
            nacc += 8
        code = (acc >> (nacc - width)) & ((1 << width) - 1)
        nacc -= width
        if code == 256:  # Clear
            reset()
            old = None
            continue
        if code == 257:  # EOI
            break
        if old is None:
            if code > 255:
                raise DecoderUnavailable("TIFF LZW: bad first code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(old + entry[:1])
        elif code == len(table):
            entry = old + old[:1]
            table.append(entry)
        else:
            raise DecoderUnavailable("TIFF LZW: code beyond table")
        out += entry
        old = entry
        # early change: grow WIDTH one entry before the table fills it
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1
    return bytes(out[:expect])


def decode_tiff(payload: bytes) -> np.ndarray:
    """TIFF → (h, w, 3) uint8 RGB.  First IFD only (multi-page TIFFs
    are treated as stills, the GIF first-frame convention)."""
    if payload[:4] == b"II*\x00":
        bo = "<"
    elif payload[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise DecoderUnavailable("not a TIFF payload")
    (ifd_off,) = struct.unpack(bo + "I", payload[4:8])
    if ifd_off + 2 > len(payload):
        raise DecoderUnavailable("truncated TIFF IFD")
    (n_ent,) = struct.unpack(bo + "H", payload[ifd_off : ifd_off + 2])
    tags: dict = {}
    for i in range(n_ent):
        e = payload[ifd_off + 2 + 12 * i : ifd_off + 14 + 12 * i]
        if len(e) < 12:
            raise DecoderUnavailable("truncated TIFF IFD entry")
        tag, vals = _read_ifd_values(payload, e, bo)
        tags[tag] = vals

    def one(tag, default=None):
        v = tags.get(tag)
        if not v:
            if default is None:
                raise DecoderUnavailable(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    w = one(256)
    h = one(257)
    comp = one(259, 1)
    photo = one(262)
    spp = one(277, 1)
    bits = tags.get(258, [8])
    planar = one(284, 1)
    predictor = one(317, 1)
    rps = one(278, 2**32 - 1)
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise DecoderUnavailable("TIFF missing strip offsets/counts")
    if any(b != 8 for b in bits):
        raise DecoderUnavailable(f"TIFF bits-per-sample {bits} unsupported")
    if planar != 1:
        raise DecoderUnavailable("TIFF planar-separate layout unsupported")
    if comp not in (1, 5):
        raise DecoderUnavailable(f"TIFF compression {comp} unsupported")
    if predictor not in (1, 2):
        raise DecoderUnavailable(f"TIFF predictor {predictor} unsupported")
    if photo not in (0, 1, 2, 3):
        raise DecoderUnavailable(f"TIFF photometric {photo} unsupported")
    if photo == 2 and spp < 3:
        raise DecoderUnavailable("TIFF RGB with <3 samples")

    row_bytes = w * spp
    rows = []
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        strip_rows = min(rps, h - si * rps)
        if strip_rows <= 0:
            break
        raw = payload[off : off + cnt]
        if len(raw) < cnt:
            raise DecoderUnavailable("TIFF strip overruns payload")
        if comp == 5:
            raw = _tiff_lzw(raw, strip_rows * row_bytes)
        elif len(raw) < strip_rows * row_bytes:
            raise DecoderUnavailable("TIFF strip shorter than raster")
        arr = np.frombuffer(
            raw[: strip_rows * row_bytes], dtype=np.uint8
        ).reshape(strip_rows, row_bytes)
        if predictor == 2:
            # horizontal differencing: cumulative sum per sample lane
            arr = (
                np.cumsum(
                    arr.reshape(strip_rows, w, spp).astype(np.int64), axis=1
                )
                % 256
            ).astype(np.uint8).reshape(strip_rows, row_bytes)
        rows.append(arr)
    raster = np.concatenate(rows, axis=0)
    if raster.shape[0] != h:
        raise DecoderUnavailable("TIFF strips don't cover the image")
    px = raster.reshape(h, w, spp)
    if photo == 2:
        return np.ascontiguousarray(px[:, :, :3])
    if photo == 3:
        cmap = tags.get(320)
        if not cmap or len(cmap) < 3 * 256:
            # palette size is 3 * 2^bits; bits == 8 here
            raise DecoderUnavailable("TIFF palette image without ColorMap")
        pal16 = np.asarray(cmap[: 3 * 256], dtype=np.uint16).reshape(3, 256)
        pal = (pal16 >> 8).astype(np.uint8).T  # (256, 3), 16->8 bit
        return np.ascontiguousarray(pal[px[:, :, 0]])
    g = px[:, :, 0]
    if photo == 0:  # WhiteIsZero
        g = (255 - g.astype(np.int16)).astype(np.uint8)
    return np.ascontiguousarray(np.repeat(g[:, :, None], 3, axis=2))


def encode_tiff(img: np.ndarray, *, rows_per_strip: int = 16) -> bytes:
    """(h, w, 3) uint8 RGB or (h, w) gray → little-endian baseline TIFF
    (uncompressed, strip-organized).  Exists so decode_tiff has a
    real round-trip partner and so libtiff can cross-decode payloads
    WE produced (tests/test_tiff_crossdecode.py)."""
    if img.ndim == 2:
        spp, photo = 1, 1
        flat = np.ascontiguousarray(img, dtype=np.uint8)
    elif img.ndim == 3 and img.shape[2] == 3:
        spp, photo = 3, 2
        flat = np.ascontiguousarray(img, dtype=np.uint8)
    else:
        raise ValueError("encode_tiff expects (h,w) gray or (h,w,3) RGB")
    h, w = img.shape[:2]
    rps = max(1, min(rows_per_strip, h))
    n_strips = (h + rps - 1) // rps
    row_bytes = w * spp
    strips = [
        flat[i * rps : min(h, (i + 1) * rps)].tobytes()
        for i in range(n_strips)
    ]

    entries = []  # (tag, type, count, packed-value-or-None, payload)

    def short(tag, v):
        entries.append((tag, 3, 1, struct.pack("<HH", v, 0), b""))

    def long_(tag, v):
        entries.append((tag, 4, 1, struct.pack("<I", v), b""))

    short(256, w) if w < 65536 else long_(256, w)
    short(257, h) if h < 65536 else long_(257, h)
    if spp == 3:
        entries.append((258, 3, 3, None, struct.pack("<HHH", 8, 8, 8)))
    else:
        short(258, 8)
    short(259, 1)           # no compression
    short(262, photo)
    short(277, spp)
    short(278, rps)
    short(284, 1)           # contiguous planar
    # strip offsets/counts: filled after layout
    if n_strips == 1:
        long_(273, 0)       # patched below
        long_(279, len(strips[0]))
    else:
        entries.append((273, 4, n_strips, None, b"\x00" * 4 * n_strips))
        entries.append(
            (279, 4, n_strips, None,
             b"".join(struct.pack("<I", len(s)) for s in strips))
        )
    entries.sort(key=lambda e: e[0])

    # layout: header(8) + IFD + out-of-line values + strip data
    ifd_off = 8
    ifd_len = 2 + 12 * len(entries) + 4
    val_off = ifd_off + ifd_len
    oversize = []
    for tag, typ, cnt, inline, payload_v in entries:
        if inline is None:
            oversize.append((tag, val_off, payload_v))
            val_off += len(payload_v)
    data_off = val_off
    strip_offs = []
    pos = data_off
    for s in strips:
        strip_offs.append(pos)
        pos += len(s)

    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += struct.pack("<H", len(entries))
    ov = {t: o for t, o, _ in oversize}
    for tag, typ, cnt, inline, payload_v in entries:
        if tag == 273 and n_strips == 1:
            inline = struct.pack("<I", strip_offs[0])
        if tag == 273 and n_strips > 1:
            payload_v = b"".join(struct.pack("<I", o) for o in strip_offs)
            ov_off = ov[tag]
            out_entry = struct.pack("<HHI", tag, typ, cnt) + struct.pack(
                "<I", ov_off
            )
            out += out_entry
            # replace the stored payload for the write pass below
            oversize = [
                (t, o, payload_v if t == tag else p) for t, o, p in oversize
            ]
            continue
        out += struct.pack("<HHI", tag, typ, cnt)
        out += inline if inline is not None else struct.pack("<I", ov[tag])
    out += struct.pack("<I", 0)  # next-IFD pointer: none
    for _, off, payload_v in oversize:
        assert len(out) == off, (len(out), off)
        out += payload_v
    for s, off in zip(strips, strip_offs):
        assert len(out) == off
        out += s
    return bytes(out)
