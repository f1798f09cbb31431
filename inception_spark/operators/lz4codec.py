"""Pure-Python LZ4 block + frame codec, cross-validated against the
system ``liblz4.so.1`` (the libjpeg/giflib/audioop protocol applied to
a compression format).

Why an engine needs this: web-scale shards arrive lz4-framed (WARC
sidecars, tar.lz4, parquet-external blobs), and a 1000-executor
ingest cannot assume a Python ``lz4`` binding exists on every worker
image.  The decoder here is stdlib+bytes only, so the shard readers
can inline it the way ``sources/warc.py`` inlines gzip.

Format references (public spec, lz4/lz4 GitHub):
  - lz4_Block_format.md  — token/LSIC sequences, overlap copies,
    end-of-block rules (last 5 bytes literal, no match starting
    within the last 12 bytes).
  - lz4_Frame_format.md  — magic 0x184D2204, FLG/BD descriptor with
    xxh32 header checksum, 4-byte block headers with the bit-31
    "stored" flag, optional block/content checksums, linked blocks.

xxHash32 is re-implemented here (liblz4 does not export XXH32) and
pinned against the published reference vectors in
``tests/test_lz4_crossdecode.py``.
"""

from __future__ import annotations

import struct

__all__ = [
    "Lz4FormatError",
    "xxh32",
    "decode_lz4_block",
    "encode_lz4_block",
    "decode_lz4_frame",
    "encode_lz4_frame",
]


class Lz4FormatError(ValueError):
    """Malformed LZ4 payload (bad magic, truncated sequence, offset
    outside the window, checksum mismatch, ...)."""


# ---------------------------------------------------------------------------
# xxHash32 — needed for the frame header checksum byte and the optional
# block/content checksums.  Straight transcription of the public spec.
# ---------------------------------------------------------------------------

_P1 = 2654435761
_P2 = 2246822519
_P3 = 3266489917
_P4 = 668265263
_P5 = 374761393
_M32 = 0xFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """xxHash32 of ``data`` — matches the reference implementation
    (pinned against the spec's published vectors in tests)."""
    n = len(data)
    pos = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        limit = n - 16
        while pos <= limit:
            l1, l2, l3, l4 = struct.unpack_from("<IIII", data, pos)
            v1 = (_rotl((v1 + l1 * _P2) & _M32, 13) * _P1) & _M32
            v2 = (_rotl((v2 + l2 * _P2) & _M32, 13) * _P1) & _M32
            v3 = (_rotl((v3 + l3 * _P2) & _M32, 13) * _P1) & _M32
            v4 = (_rotl((v4 + l4 * _P2) & _M32, 13) * _P1) & _M32
            pos += 16
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M32
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while pos + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, pos)
        h = (_rotl((h + lane * _P3) & _M32, 17) * _P4) & _M32
        pos += 4
    while pos < n:
        h = (_rotl((h + data[pos] * _P5) & _M32, 11) * _P1) & _M32
        pos += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


# ---------------------------------------------------------------------------
# Block format
# ---------------------------------------------------------------------------


def decode_lz4_block(
    data: bytes, max_size: int, *, prefix: bytes = b""
) -> bytes:
    """Decode one LZ4 block into at most ``max_size`` bytes.

    ``prefix`` is the already-decoded history a *linked* frame block
    may copy matches from (empty for independent blocks); only the
    NEW bytes are returned.
    """
    out = bytearray(prefix)
    base = len(prefix)
    pos, n = 0, len(data)
    if n == 0:
        raise Lz4FormatError("empty block")
    while True:
        if pos >= n:
            raise Lz4FormatError("truncated block: missing token")
        token = data[pos]
        pos += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                if pos >= n:
                    raise Lz4FormatError("truncated literal-length")
                b = data[pos]
                pos += 1
                lit_len += b
                if b != 255:
                    break
        if pos + lit_len > n:
            raise Lz4FormatError("truncated literals")
        out += data[pos : pos + lit_len]
        pos += lit_len
        if len(out) - base > max_size:
            raise Lz4FormatError("block decodes past max_size")
        if pos == n:
            # last sequence carries literals only
            return bytes(out[base:])
        if pos + 2 > n:
            raise Lz4FormatError("truncated match offset")
        offset = data[pos] | (data[pos + 1] << 8)
        pos += 2
        if offset == 0:
            raise Lz4FormatError("invalid zero match offset")
        if offset > len(out):
            raise Lz4FormatError("match offset outside window")
        match_len = token & 0x0F
        if match_len == 15:
            while True:
                if pos >= n:
                    raise Lz4FormatError("truncated match-length")
                b = data[pos]
                pos += 1
                match_len += b
                if b != 255:
                    break
        match_len += 4
        if len(out) - base + match_len > max_size:
            raise Lz4FormatError("block decodes past max_size")
        start = len(out) - offset
        if offset >= match_len:
            out += out[start : start + match_len]
        else:
            # overlap copy: byte-at-a-time semantics (RLE-style runs)
            for i in range(match_len):
                out.append(out[start + i])


def encode_lz4_block(data: bytes) -> bytes:
    """Greedy single-pass LZ4 block compressor (hash-table on 4-byte
    prefixes).  Honors the spec's end rules: the final 5 bytes are
    literals and no match starts within the last 12 bytes — liblz4's
    ``LZ4_decompress_safe`` accepts every payload this emits (pinned
    bidirectionally in tests)."""
    n = len(data)
    out = bytearray()
    if n == 0:
        # a single empty-literal token is the canonical empty block
        return b"\x00"
    table: dict[bytes, int] = {}
    anchor = 0
    pos = 0
    match_limit = n - 12  # no match may start past here
    while pos < match_limit:
        key = data[pos : pos + 4]
        ref = table.get(key)
        table[key] = pos
        if ref is None or pos - ref > 65535 or data[ref : ref + 4] != key:
            pos += 1
            continue
        # extend the match forward (but keep the last 5 bytes literal)
        end_cap = n - 5
        mlen = 4
        while pos + mlen < end_cap and data[ref + mlen] == data[pos + mlen]:
            mlen += 1
        _emit_sequence(out, data, anchor, pos, pos - ref, mlen)
        pos += mlen
        anchor = pos
    _emit_literals(out, data, anchor, n)
    return bytes(out)


def _emit_sequence(
    out: bytearray,
    data: bytes,
    anchor: int,
    pos: int,
    offset: int,
    mlen: int,
) -> None:
    lit_len = pos - anchor
    ml = mlen - 4
    token = (min(lit_len, 15) << 4) | min(ml, 15)
    out.append(token)
    if lit_len >= 15:
        rem = lit_len - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)
    out += data[anchor:pos]
    out += struct.pack("<H", offset)
    if ml >= 15:
        rem = ml - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)


def _emit_literals(out: bytearray, data: bytes, anchor: int, end: int) -> None:
    lit_len = end - anchor
    out.append(min(lit_len, 15) << 4)
    if lit_len >= 15:
        rem = lit_len - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)
    out += data[anchor:end]


# ---------------------------------------------------------------------------
# Frame format
# ---------------------------------------------------------------------------

_MAGIC = 0x184D2204
_BD_SIZES = {4: 1 << 16, 5: 1 << 18, 6: 1 << 20, 7: 1 << 22}


def decode_lz4_frame(data: bytes) -> bytes:
    """Decode one LZ4 frame (as produced by ``lz4 -z`` / LZ4F):
    independent OR linked blocks, stored blocks, block checksums,
    content size and content checksum all verified.  Frames declaring
    an external dictionary raise (no dict plumbing here)."""
    if len(data) < 7:
        raise Lz4FormatError("truncated frame header")
    (magic,) = struct.unpack_from("<I", data, 0)
    if magic != _MAGIC:
        raise Lz4FormatError(f"bad magic 0x{magic:08X}")
    flg = data[4]
    bd = data[5]
    version = flg >> 6
    if version != 1:
        raise Lz4FormatError(f"unsupported frame version {version}")
    b_indep = bool(flg & 0x20)
    b_checksum = bool(flg & 0x10)
    c_size = bool(flg & 0x08)
    c_checksum = bool(flg & 0x04)
    dict_id = bool(flg & 0x01)
    bs_code = (bd >> 4) & 0x07
    if bs_code not in _BD_SIZES:
        raise Lz4FormatError(f"reserved block-size code {bs_code}")
    block_max = _BD_SIZES[bs_code]
    pos = 6
    content_size = None
    need = pos + (8 if c_size else 0) + (4 if dict_id else 0) + 1
    if len(data) < need:
        raise Lz4FormatError("truncated frame descriptor")
    if c_size:
        (content_size,) = struct.unpack_from("<Q", data, pos)
        pos += 8
    if dict_id:
        # LZ4F external-dictionary frames are not decodable without the
        # dictionary — reject honestly (the zstdcodec discipline) rather
        # than fail later with a misleading offset error
        did = int.from_bytes(data[pos : pos + 4], "little")
        raise Lz4FormatError(
            f"frame requires external dictionary {did} (unsupported)"
        )
    hc = data[pos]
    expect_hc = (xxh32(data[4:pos]) >> 8) & 0xFF
    if hc != expect_hc:
        raise Lz4FormatError("frame descriptor checksum mismatch")
    pos += 1

    out = bytearray()
    while True:
        if pos + 4 > len(data):
            raise Lz4FormatError("truncated block header")
        (word,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if word == 0:  # EndMark
            break
        stored = bool(word & 0x80000000)
        bsize = word & 0x7FFFFFFF
        if bsize > block_max:
            raise Lz4FormatError("block larger than declared maximum")
        if pos + bsize > len(data):
            raise Lz4FormatError("truncated block body")
        body = data[pos : pos + bsize]
        pos += bsize
        if b_checksum:
            if pos + 4 > len(data):
                raise Lz4FormatError("truncated block checksum")
            (bsum,) = struct.unpack_from("<I", data, pos)
            pos += 4
            if xxh32(body) != bsum:
                raise Lz4FormatError("block checksum mismatch")
        if stored:
            out += body
        else:
            prefix = b"" if b_indep else bytes(out[-65536:])
            out += decode_lz4_block(body, block_max, prefix=prefix)
    if c_checksum:
        if pos + 4 > len(data):
            raise Lz4FormatError("truncated content checksum")
        (csum,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if xxh32(bytes(out)) != csum:
            raise Lz4FormatError("content checksum mismatch")
    if content_size is not None and content_size != len(out):
        raise Lz4FormatError(
            f"content size mismatch: header {content_size}, got {len(out)}"
        )
    return bytes(out)


def encode_lz4_frame(data: bytes, *, block_checksum: bool = False) -> bytes:
    """One-shot LZ4 frame writer: independent 64 KiB blocks, content
    size + content checksum always present (what ``LZ4F_compressFrame``
    emits with contentChecksumFlag=1).  Incompressible blocks are
    stored raw, per spec."""
    flg = (1 << 6) | 0x20 | 0x08 | 0x04 | (0x10 if block_checksum else 0)
    bd = 4 << 4  # 64 KiB max block size
    header = bytearray(struct.pack("<I", _MAGIC))
    header.append(flg)
    header.append(bd)
    header += struct.pack("<Q", len(data))
    header.append((xxh32(bytes(header[4:])) >> 8) & 0xFF)

    out = bytearray(header)
    block_max = _BD_SIZES[4]
    for off in range(0, len(data), block_max):
        chunk = data[off : off + block_max]
        comp = encode_lz4_block(chunk)
        if len(comp) < len(chunk):
            out += struct.pack("<I", len(comp))
            body = comp
        else:
            out += struct.pack("<I", 0x80000000 | len(chunk))
            body = chunk
        out += body
        if block_checksum:
            out += struct.pack("<I", xxh32(body))
    out += struct.pack("<I", 0)  # EndMark
    out += struct.pack("<I", xxh32(data))
    return bytes(out)
