"""Pure-Python Snappy block codec, cross-validated against the real
snappy implementation bundled with pyarrow (``pa.compress`` /
``pa.decompress``) — the liblz4/libzstd protocol applied to the
legacy-lake codec (pre-zstd parquet/orc/sequence-file default).

Format (public spec, google/snappy format_description.txt): a varint
uncompressed-length preamble, then tagged elements —

* tag ``00``: literal; length-1 in the tag's high 6 bits for lengths
  1..60, values 60..63 select 1..4 little-endian extra length bytes;
* tag ``01``: copy, 1-byte offset: length 4..11 from the tag's bits
  2-4, 11-bit offset from bits 5-7 + the next byte;
* tag ``10``: copy, 2-byte little-endian offset, length 1..64;
* tag ``11``: copy, 4-byte little-endian offset, length 1..64.

Copies may overlap (RLE-style); offset 0 is invalid.
"""

from __future__ import annotations

import struct

__all__ = [
    "SnappyFormatError",
    "decode_snappy",
    "encode_snappy",
]


class SnappyFormatError(ValueError):
    """Malformed snappy payload."""


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise SnappyFormatError("truncated varint")
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 35:
            raise SnappyFormatError("varint too long")


def decode_snappy(data: bytes) -> bytes:
    """Decode one snappy block."""
    n, pos = _read_varint(data, 0)
    out = bytearray()
    end = len(data)
    while pos < end:
        tag = data[pos]
        pos += 1
        ttype = tag & 3
        if ttype == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nbytes = ln - 59
                if pos + nbytes > end:
                    raise SnappyFormatError("truncated literal length")
                ln = int.from_bytes(data[pos : pos + nbytes], "little")
                pos += nbytes
            ln += 1
            if pos + ln > end:
                raise SnappyFormatError("truncated literal")
            out += data[pos : pos + ln]
            pos += ln
            continue
        if ttype == 1:  # copy, 1-byte offset
            ln = ((tag >> 2) & 0x07) + 4
            if pos >= end:
                raise SnappyFormatError("truncated copy-1 offset")
            offset = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif ttype == 2:  # copy, 2-byte offset
            ln = (tag >> 2) + 1
            if pos + 2 > end:
                raise SnappyFormatError("truncated copy-2 offset")
            offset = data[pos] | (data[pos + 1] << 8)
            pos += 2
        else:  # copy, 4-byte offset
            ln = (tag >> 2) + 1
            if pos + 4 > end:
                raise SnappyFormatError("truncated copy-4 offset")
            (offset,) = struct.unpack_from("<I", data, pos)
            pos += 4
        if offset == 0 or offset > len(out):
            raise SnappyFormatError("copy offset outside window")
        start = len(out) - offset
        if offset >= ln:
            out += out[start : start + ln]
        else:  # overlapping copy: byte-at-a-time semantics
            for i in range(ln):
                out.append(out[start + i])
    if len(out) != n:
        raise SnappyFormatError(
            f"preamble says {n} bytes, decoded {len(out)}"
        )
    return bytes(out)


def _emit_varint(out: bytearray, n: int) -> None:
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)


def _emit_literal(out: bytearray, chunk: bytes) -> None:
    n = len(chunk)
    while n > 0:
        take = min(n, 1 << 16)
        ln = take - 1
        if ln < 60:
            out.append(ln << 2)
        elif ln < (1 << 8):
            out.append(60 << 2)
            out.append(ln)
        else:
            out.append(61 << 2)
            out += ln.to_bytes(2, "little")
        out += chunk[:take]
        chunk = chunk[take:]
        n -= take


def encode_snappy(data: bytes) -> bytes:
    """Greedy snappy compressor (hash table on 4-byte prefixes,
    2-byte-offset copies).  Every payload this emits round-trips under
    the real snappy (pinned in tests)."""
    out = bytearray()
    _emit_varint(out, len(data))
    n = len(data)
    if n == 0:
        return bytes(out)
    table: dict[bytes, int] = {}
    anchor = 0
    pos = 0
    while pos + 4 <= n:
        key = data[pos : pos + 4]
        ref = table.get(key)
        table[key] = pos
        if ref is None or pos - ref > 0xFFFF:
            pos += 1
            continue
        mlen = 4
        while pos + mlen < n and data[ref + mlen] == data[pos + mlen]:
            mlen += 1
        if anchor < pos:
            _emit_literal(out, data[anchor:pos])
        offset = pos - ref
        rem = mlen
        while rem > 0:
            take = min(rem, 64)  # type-10 copies carry lengths 1..64
            out.append(((take - 1) << 2) | 2)
            out += offset.to_bytes(2, "little")
            rem -= take
        pos += mlen
        anchor = pos
    if anchor < n:
        _emit_literal(out, data[anchor:])
    return bytes(out)
