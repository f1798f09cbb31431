"""Pure-Python Brotli DECODER (RFC 7932), cross-validated against the
system libbrotli (the liblz4/libzstd protocol applied to the
web-content codec — ``Content-Encoding: br``, WOFF2, crawl payloads).

The decoder logic — bit stream, prefix-code reading (simple and
complex forms with the fixed code-length code), block switching,
context modeling, the insert-and-copy command loop, distance ring
buffer, and the 121 static-dictionary word transforms — is a pure
transcription of the RFC.  Three data artifacts the format requires
are NOT transcribed but loaded at runtime from ``libbrotlicommon``
(data, not code: the 122 KB static dictionary, the transform table,
and the 2 KiB context-lookup table), with an honest
``BrotliUnavailable`` where the library is absent.  The transform
APPLICATION is ours; ``tests/test_brotli_crossdecode.py`` pins it
per-transform against ``BrotliTransformDictionaryWord`` and the full
decoder differentially against real libbrotli output across quality
levels, window sizes, and content classes.
"""

from __future__ import annotations

import struct

__all__ = [
    "BrotliFormatError",
    "BrotliUnavailable",
    "decode_brotli",
]


class BrotliFormatError(ValueError):
    """Malformed brotli payload."""


class BrotliUnavailable(RuntimeError):
    """libbrotlicommon (the static dictionary / context tables) is not
    present on this machine — the decoder cannot run without its data
    tables."""


# ---------------------------------------------------------------------------
# Runtime data tables from libbrotlicommon (data, not code)
# ---------------------------------------------------------------------------

_TABLES = None


def _load_tables():
    """(dict_data, size_bits_by_length, offsets_by_length,
    transforms list [(prefix, type, suffix)], context_lut[2048])."""
    global _TABLES
    if _TABLES is not None:
        return _TABLES
    import ctypes

    try:
        lib = ctypes.CDLL("libbrotlicommon.so.1")
    except OSError as exc:
        raise BrotliUnavailable(
            "libbrotlicommon.so.1 not found — brotli data tables "
            "unavailable"
        ) from exc

    class _Dict(ctypes.Structure):
        _fields_ = [
            ("size_bits_by_length", ctypes.c_uint8 * 32),
            ("offsets_by_length", ctypes.c_uint32 * 32),
            ("data_size", ctypes.c_size_t),
            ("data", ctypes.POINTER(ctypes.c_uint8)),
        ]

    class _Transforms(ctypes.Structure):
        _fields_ = [
            ("prefix_suffix_size", ctypes.c_uint16),
            ("prefix_suffix", ctypes.POINTER(ctypes.c_uint8)),
            ("prefix_suffix_map", ctypes.POINTER(ctypes.c_uint16)),
            ("num_transforms", ctypes.c_uint32),
            ("transforms", ctypes.POINTER(ctypes.c_uint8)),
            ("params", ctypes.POINTER(ctypes.c_uint8)),
            ("cutOffTransforms", ctypes.c_int16 * 10),
        ]

    lib.BrotliGetDictionary.restype = ctypes.POINTER(_Dict)
    lib.BrotliGetTransforms.restype = ctypes.POINTER(_Transforms)
    d = lib.BrotliGetDictionary().contents
    dict_data = ctypes.string_at(d.data, d.data_size)
    size_bits = list(d.size_bits_by_length)
    offsets = list(d.offsets_by_length)
    t = lib.BrotliGetTransforms().contents
    ps = ctypes.string_at(t.prefix_suffix, t.prefix_suffix_size)
    raw = ctypes.string_at(t.transforms, t.num_transforms * 3)
    max_id = max(raw)
    pmap = [t.prefix_suffix_map[i] for i in range(max_id + 1)]

    def _ps_str(i: int) -> bytes:
        off = pmap[i]
        return ps[off + 1 : off + 1 + ps[off]]

    transforms = [
        (_ps_str(raw[3 * i]), raw[3 * i + 1], _ps_str(raw[3 * i + 2]))
        for i in range(t.num_transforms)
    ]
    # context lookup table: locate by the mode-0 (LSB6) pattern inside
    # the shared library image.  The library is already LOADED via
    # CDLL above, so its real path is in this process's maps — that
    # works on any Linux distro/arch, unlike hardcoded multiarch dirs.
    candidates = []
    try:
        with open("/proc/self/maps") as fh:
            for line in fh:
                if "libbrotlicommon" in line:
                    p = line.split(None, 5)[-1].strip()
                    if p and p not in candidates:
                        candidates.append(p)
    except OSError:
        pass
    candidates += [
        "/lib/x86_64-linux-gnu/libbrotlicommon.so.1",
        "/usr/lib/x86_64-linux-gnu/libbrotlicommon.so.1",
    ]
    def _lut_valid(lut: bytes) -> bool:
        """Reject a coincidental LSB6-pattern match (ADVICE r11): the
        real 2048-byte table's other sub-tables are pinned by RFC 7932
        §7.1 — LSB6/MSB6 second-byte halves are all-zero, MSB6 first
        half is i>>2, UTF8 splits into a multiple-of-4 Lut0 and a 0-3
        Lut1, SIGNED into a multiple-of-8 Lut0 (0..56, ending 56) and a
        0-7 Lut1 (ending 7), both monotone in the byte value."""
        if len(lut) != 2048:
            return False
        if lut[256:512] != b"\0" * 256 or lut[768:1024] != b"\0" * 256:
            return False
        if lut[512:768] != bytes(i >> 2 for i in range(256)):
            return False
        utf8_0, utf8_1 = lut[1024:1280], lut[1280:1536]
        # ASCII rows carry multiple-of-4 class codes; non-ASCII rows
        # (UTF-8 lead/continuation bytes) carry the 1/2/3 codes directly
        if not all(v < 64 and (v % 4 == 0 or v < 4) for v in utf8_0):
            return False
        if not all(v < 4 for v in utf8_1):
            return False
        sg0, sg1 = lut[1536:1792], lut[1792:2048]
        if sg0[0] != 0 or sg0[255] != 56 or sg1[0] != 0 or sg1[255] != 7:
            return False
        if not all(v % 8 == 0 and v <= 56 for v in sg0):
            return False
        if not all(v <= 7 for v in sg1):
            return False
        if list(sg0) != sorted(sg0) or list(sg1) != sorted(sg1):
            return False
        return True

    path = None
    pat = bytes(i & 63 for i in range(256))
    for cand in candidates:
        try:
            with open(cand, "rb") as fh:
                img = fh.read()
        except OSError:
            continue
        idx = img.find(pat)
        while idx >= 0:  # keep scanning past coincidental matches
            lut = img[idx : idx + 2048]
            if _lut_valid(lut):
                path = cand
                ctx_lut = lut
                break
            idx = img.find(pat, idx + 1)
        if path is not None:
            break
    if path is None:
        raise BrotliUnavailable("brotli context-lookup table not found")
    _TABLES = (dict_data, size_bits, offsets, transforms, ctx_lut)
    return _TABLES


# ---------------------------------------------------------------------------
# Static-dictionary word transforms (RFC 7932 §8 + Appendix B)
# ---------------------------------------------------------------------------

_T_IDENTITY = 0
_T_OMIT_LAST_BASE = 0       # types 1..9  = OmitLast1..9
_T_UPPERCASE_FIRST = 10
_T_UPPERCASE_ALL = 11
_T_OMIT_FIRST_BASE = 11     # types 12..20 = OmitFirst1..9


def _ferment(word: bytearray, pos: int) -> int:
    """Uppercase one (possibly multi-byte) character in place; returns
    the number of bytes consumed — the RFC's byte-level rule."""
    c = word[pos]
    if c < 192:
        if 97 <= c <= 122:
            word[pos] = c ^ 32
        return 1
    if c < 224:
        if pos + 1 < len(word):
            word[pos + 1] ^= 32
        return 2
    if pos + 2 < len(word):
        word[pos + 2] ^= 5
    return 3


def _apply_transform(word: bytes, transform: tuple) -> bytes:
    prefix, ttype, suffix = transform
    if 12 <= ttype <= 20:  # OmitFirst1..9
        cut = ttype - _T_OMIT_FIRST_BASE
        word = word[cut:] if cut <= len(word) else b""
    elif 1 <= ttype <= 9:  # OmitLast1..9
        cut = ttype
        word = word[:-cut] if cut < len(word) else b""
    mid = bytearray(word)
    if ttype == _T_UPPERCASE_FIRST:
        if mid:
            _ferment(mid, 0)
    elif ttype == _T_UPPERCASE_ALL:
        i = 0
        while i < len(mid):
            i += _ferment(mid, i)
    return prefix + bytes(mid) + suffix


# ---------------------------------------------------------------------------
# LSB-first bit reader
# ---------------------------------------------------------------------------


class _Bits:
    """LSB-first reader: 64-bit-ish accumulator refilled bytewise —
    no per-read slicing (the hot path runs once per literal)."""

    __slots__ = ("data", "nbytes", "bytepos", "acc", "navail")

    def __init__(self, data: bytes):
        self.data = data
        self.nbytes = len(data)
        self.bytepos = 0
        self.acc = 0
        self.navail = 0

    def read(self, n: int) -> int:
        acc = self.acc
        navail = self.navail
        while navail < n:
            if self.bytepos >= self.nbytes:
                raise BrotliFormatError("bitstream exhausted")
            acc |= self.data[self.bytepos] << navail
            self.bytepos += 1
            navail += 8
        self.acc = acc >> n
        self.navail = navail - n
        return acc & ((1 << n) - 1)

    def peek16(self) -> int:
        """Next ≤16 bits, zero-padded past the stream end."""
        acc = self.acc
        navail = self.navail
        bytepos = self.bytepos
        while navail < 16 and bytepos < self.nbytes:
            acc |= self.data[bytepos] << navail
            bytepos += 1
            navail += 8
        self.acc = acc
        self.navail = navail
        self.bytepos = bytepos
        return acc & 0xFFFF

    def skip(self, n: int) -> None:
        if n > self.navail:
            raise BrotliFormatError("bitstream exhausted (skip)")
        self.acc >>= n
        self.navail -= n

    def align(self) -> None:
        rem = self.navail & 7
        if rem:
            if self.read(rem) != 0:
                raise BrotliFormatError("non-zero padding at byte align")

    def read_bytes(self, n: int) -> bytes:
        # after align(), navail is a whole number of buffered bytes
        assert self.navail & 7 == 0
        out = bytearray()
        while self.navail and n:
            out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.navail -= 8
            n -= 1
        if n:
            if self.bytepos + n > self.nbytes:
                raise BrotliFormatError("bitstream exhausted (bytes)")
            out += self.data[self.bytepos : self.bytepos + n]
            self.bytepos += n
        return bytes(out)


# ---------------------------------------------------------------------------
# Prefix (Huffman) codes — canonical, MSB-of-code-first bit-by-bit
# ---------------------------------------------------------------------------


class _Prefix:
    """Canonical prefix decoder from code lengths (≤ 15 bits): one
    8-bit LUT fast path (covers all short codes in one peek+skip), a
    (length, code)-keyed walk for the rare longer codes."""

    __slots__ = ("single", "table", "max_len", "lut")

    def __init__(self, lengths: list[int]):
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if len(nz) == 1:
            self.single = nz[0][1]
            self.table = None
            self.max_len = 0
            self.lut = None
            return
        self.single = None
        bl_count: dict[int, int] = {}
        for l, _ in nz:
            bl_count[l] = bl_count.get(l, 0) + 1
        code = 0
        next_code: dict[int, int] = {}
        self.max_len = max(bl_count)
        for l in range(1, self.max_len + 1):
            code = (code + bl_count.get(l - 1, 0)) << 1
            next_code[l] = code
        table: dict[tuple[int, int], int] = {}
        lut = [-1] * 256
        for s, l in enumerate(lengths):
            if l > 0:
                c = next_code[l]
                table[(l, c)] = s
                next_code[l] += 1
                if l <= 8:
                    # stream bits are the code's bits MSB-first, packed
                    # LSB-first: LUT index pattern = bit-reverse(c, l)
                    p = 0
                    for i in range(l):
                        p |= ((c >> (l - 1 - i)) & 1) << i
                    entry = (s << 4) | l
                    for v in range(p, 256, 1 << l):
                        lut[v] = entry
        self.table = table
        self.lut = lut

    def decode(self, bits: _Bits) -> int:
        if self.single is not None:
            return self.single
        v = bits.peek16()
        e = self.lut[v & 0xFF]
        if e >= 0:
            bits.skip(e & 15)
            return e >> 4
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | ((v >> (ln - 1)) & 1)
            sym = self.table.get((ln, code))
            if sym is not None:
                bits.skip(ln)
                return sym
        raise BrotliFormatError("invalid prefix code word")


# fixed code for code-length code lengths (RFC 7932 §3.5): peek 4 bits
_CLC_LEN = [2, 2, 2, 3, 2, 2, 2, 4, 2, 2, 2, 3, 2, 2, 2, 4]
_CLC_VAL = [0, 4, 3, 2, 0, 4, 3, 1, 0, 4, 3, 2, 0, 4, 3, 5]
_CL_ORDER = [1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def _read_prefix_code(bits: _Bits, alphabet_size: int) -> _Prefix:
    ident = bits.read(2)
    if ident == 1:  # simple code
        nsym = bits.read(2) + 1
        abits = max((alphabet_size - 1).bit_length(), 1)
        syms = []
        for _ in range(nsym):
            s = bits.read(abits)
            if s >= alphabet_size or s in syms:
                raise BrotliFormatError("bad simple-code symbol")
            syms.append(s)
        lengths = [0] * alphabet_size
        if nsym == 1:
            lengths[syms[0]] = 1
            p = _Prefix(lengths)
            p.single = syms[0]
            return p
        if nsym == 2:
            syms.sort()
            lengths[syms[0]] = lengths[syms[1]] = 1
        elif nsym == 3:
            syms[1:] = sorted(syms[1:])
            lengths[syms[0]] = 1
            lengths[syms[1]] = lengths[syms[2]] = 2
        else:
            tree_select = bits.read(1)
            if tree_select:
                # lengths (1,2,3,3): the stream ORDER of the first two
                # symbols is preserved; only the two length-3 symbols
                # are sorted (reference BuildSimpleHuffmanTable)
                if syms[3] < syms[2]:
                    syms[2], syms[3] = syms[3], syms[2]
                lengths[syms[0]] = 1
                lengths[syms[1]] = 2
                lengths[syms[2]] = lengths[syms[3]] = 3
            else:
                syms.sort()
                for s in syms:
                    lengths[s] = 2
        return _Prefix(lengths)

    # complex code: ident ∈ {0, 2, 3} is HSKIP
    hskip = ident
    cl_lengths = [0] * 18
    space = 32
    num_codes = 0
    for i in range(hskip, 18):
        idx = bits.peek16() & 0x0F  # zero-padded 4-bit peek
        ln = _CLC_LEN[idx]
        bits.skip(ln)
        clen = _CLC_VAL[idx]
        cl_lengths[_CL_ORDER[i]] = clen
        if clen:
            space -= 32 >> clen
            num_codes += 1
            if space <= 0:
                break
    if num_codes != 1 and space != 0:
        raise BrotliFormatError("code-length code does not fill space")
    cl_code = _Prefix(cl_lengths)

    lengths = [0] * alphabet_size
    symbol = 0
    space = 32768
    prev_nonzero = 8
    repeat = 0
    repeat_len = 0  # the length being repeated by code 16
    prev_repeat_code = 0
    while symbol < alphabet_size and space > 0:
        cl = cl_code.decode(bits)
        if cl < 16:
            repeat = 0
            prev_repeat_code = 0
            lengths[symbol] = cl
            symbol += 1
            if cl:
                prev_nonzero = cl
                space -= 32768 >> cl
        else:
            extra = 2 if cl == 16 else 3
            new_len = prev_nonzero if cl == 16 else 0
            if prev_repeat_code != cl:
                repeat = 0
                repeat_len = new_len
            prev_repeat_code = cl
            old = repeat
            if repeat > 0:
                repeat = (repeat - 2) << extra
            repeat += bits.read(extra) + 3
            delta = repeat - old
            if symbol + delta > alphabet_size:
                raise BrotliFormatError("repeat past alphabet end")
            for _ in range(delta):
                lengths[symbol] = repeat_len
                symbol += 1
            if repeat_len:
                space -= delta * (32768 >> repeat_len)
    if space != 0:
        raise BrotliFormatError("prefix code does not fill space")
    return _Prefix(lengths)


# ---------------------------------------------------------------------------
# Variable-length counts and block switching
# ---------------------------------------------------------------------------


def _decode_varlen_uint8(bits: _Bits) -> int:
    if bits.read(1) == 0:
        return 0
    n = bits.read(3)
    if n == 0:
        return 1
    return (1 << n) + bits.read(n)


_BLOCK_COUNT_BASE = [
    1, 5, 9, 13, 17, 25, 33, 41, 49, 65, 81, 97, 113, 145, 177, 209,
    241, 305, 369, 497, 753, 1265, 2289, 4337, 8433, 16625,
]
_BLOCK_COUNT_EXTRA = [
    2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 6, 6, 7, 8, 9, 10,
    11, 12, 13, 24,
]


def _read_block_count(bits: _Bits, tree: _Prefix) -> int:
    code = tree.decode(bits)
    return _BLOCK_COUNT_BASE[code] + bits.read(_BLOCK_COUNT_EXTRA[code])


class _BlockState:
    __slots__ = ("ntypes", "type_tree", "count_tree", "btype", "prev",
                 "count")

    def __init__(self, bits: _Bits):
        self.ntypes = _decode_varlen_uint8(bits) + 1
        self.btype = 0
        self.prev = 1
        if self.ntypes > 1:
            self.type_tree = _read_prefix_code(bits, self.ntypes + 2)
            self.count_tree = _read_prefix_code(bits, 26)
            self.count = _read_block_count(bits, self.count_tree)
        else:
            self.type_tree = None
            self.count_tree = None
            self.count = 1 << 60  # effectively infinite

    def maybe_switch(self, bits: _Bits) -> None:
        if self.count == 0:
            sym = self.type_tree.decode(bits)
            if sym == 0:
                new = self.prev
            elif sym == 1:
                new = (self.btype + 1) % self.ntypes
            else:
                new = sym - 2
            self.prev = self.btype
            self.btype = new
            self.count = _read_block_count(bits, self.count_tree)


def _read_context_map(bits: _Bits, n_trees: int, size: int) -> list[int]:
    if n_trees == 1:
        return [0] * size
    rlemax = 0
    if bits.read(1):
        rlemax = bits.read(4) + 1
    tree = _read_prefix_code(bits, rlemax + n_trees)
    cmap = []
    while len(cmap) < size:
        sym = tree.decode(bits)
        if sym == 0:
            cmap.append(0)
        elif sym <= rlemax:
            reps = (1 << sym) + bits.read(sym)
            if len(cmap) + reps > size:
                raise BrotliFormatError("context-map RLE overrun")
            cmap.extend([0] * reps)
        else:
            cmap.append(sym - rlemax)
    if bits.read(1):  # inverse move-to-front
        mtf = list(range(256))
        for i, v in enumerate(cmap):
            val = mtf[v]
            cmap[i] = val
            if v:
                del mtf[v]
                mtf.insert(0, val)
    return cmap


# ---------------------------------------------------------------------------
# Insert / copy length codes (RFC 7932 §5)
# ---------------------------------------------------------------------------

_INSERT_BASE = [0, 1, 2, 3, 4, 5, 6, 8, 10, 14, 18, 26, 34, 50, 66, 98,
                130, 194, 322, 578, 1090, 2114, 6210, 22594]
_INSERT_EXTRA = [0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 7,
                 8, 9, 10, 12, 14, 24]
_COPY_BASE = [2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 18, 22, 30, 38, 54,
              70, 102, 134, 198, 326, 582, 1094, 2118]
_COPY_EXTRA = [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6,
               7, 8, 9, 10, 24]
_INSERT_RANGE_LUT = [0, 0, 8, 8, 0, 16, 8, 16, 16]
_COPY_RANGE_LUT = [0, 8, 0, 8, 16, 0, 16, 8, 16]


def _decode_window_bits(bits: _Bits) -> int:
    if bits.read(1) == 0:
        return 16
    n = bits.read(3)
    if n != 0:
        return 17 + n
    n = bits.read(3)
    if n != 0:
        if n == 1:
            raise BrotliFormatError("reserved / large-window WBITS")
        return 8 + n
    return 17


# ---------------------------------------------------------------------------
# Main decoder
# ---------------------------------------------------------------------------


def decode_brotli(data: bytes, *, max_output: int = 1 << 31) -> bytes:
    """Decode one brotli stream to bytes."""
    try:
        return _decode_brotli(data, max_output=max_output)
    except (IndexError, struct.error) as exc:
        # out-of-range table/buffer reads on corrupt input must surface
        # as the typed error the lenient HTTP/crawl paths catch
        raise BrotliFormatError(f"corrupt stream: {exc}") from exc


def _decode_brotli(data: bytes, *, max_output: int) -> bytes:
    dict_data, size_bits, dict_offsets, transforms, ctx_lut = _load_tables()
    bits = _Bits(data)
    wbits = _decode_window_bits(bits)
    window = (1 << wbits) - 16
    out = bytearray()
    # rotating distance ring buffer (reference semantics): rb_idx
    # points one past the newest entry, so "last" = rb[(idx+3)&3];
    # the INITIAL last distance is therefore 4, not 16
    rb = [16, 15, 11, 4]
    rb_idx = 0

    while True:
        islast = bits.read(1)
        if islast and bits.read(1):  # ISLASTEMPTY
            break
        nib_sel = bits.read(2)
        if nib_sel == 3:  # metadata block
            if bits.read(1):
                raise BrotliFormatError("reserved metadata bit set")
            skip_bytes = bits.read(2)
            if skip_bytes:
                val = bits.read(8 * skip_bytes)
                if skip_bytes > 1 and (val >> (8 * (skip_bytes - 1))) == 0:
                    raise BrotliFormatError("non-minimal metadata length")
                skip = val + 1
            else:
                skip = 0
            bits.align()
            bits.read_bytes(skip)
            if islast:
                raise BrotliFormatError("metadata block cannot be last")
            continue
        nibbles = 4 + nib_sel
        mlen = bits.read(4 * nibbles) + 1
        if nibbles > 4 and (mlen - 1) >> (4 * (nibbles - 1)) == 0:
            raise BrotliFormatError("non-minimal MLEN nibble count")
        if len(out) + mlen > max_output:
            raise BrotliFormatError("output exceeds max_output")
        if not islast and bits.read(1):  # ISUNCOMPRESSED
            bits.align()
            out += bits.read_bytes(mlen)
            continue

        lit_bs = _BlockState(bits)
        cmd_bs = _BlockState(bits)
        dst_bs = _BlockState(bits)
        npostfix = bits.read(2)
        ndirect = bits.read(4) << npostfix
        postfix_mask = (1 << npostfix) - 1
        ctx_modes = [bits.read(2) for _ in range(lit_bs.ntypes)]
        ntrees_l = _decode_varlen_uint8(bits) + 1
        cmap_l = _read_context_map(bits, ntrees_l, 64 * lit_bs.ntypes)
        ntrees_d = _decode_varlen_uint8(bits) + 1
        cmap_d = _read_context_map(bits, ntrees_d, 4 * dst_bs.ntypes)
        lit_trees = [_read_prefix_code(bits, 256) for _ in range(ntrees_l)]
        cmd_trees = [
            _read_prefix_code(bits, 704) for _ in range(cmd_bs.ntypes)
        ]
        dist_alpha = 16 + ndirect + (48 << npostfix)
        dist_trees = [
            _read_prefix_code(bits, dist_alpha) for _ in range(ntrees_d)
        ]

        mpos = 0
        while mpos < mlen:
            cmd_bs.maybe_switch(bits)
            cmd_bs.count -= 1
            cmd = cmd_trees[cmd_bs.btype].decode(bits)
            range_idx = cmd >> 6
            implicit_d0 = range_idx < 2
            if range_idx >= 2:
                range_idx -= 2
            icode = _INSERT_RANGE_LUT[range_idx] + ((cmd >> 3) & 7)
            ccode = _COPY_RANGE_LUT[range_idx] + (cmd & 7)
            ilen = _INSERT_BASE[icode] + bits.read(_INSERT_EXTRA[icode])
            clen = _COPY_BASE[ccode] + bits.read(_COPY_EXTRA[ccode])
            if mpos + ilen > mlen:
                raise BrotliFormatError("insert runs past meta-block length")

            mode_off = None
            for _ in range(ilen):
                lit_bs.maybe_switch(bits)
                lit_bs.count -= 1
                mode_off = ctx_modes[lit_bs.btype] << 9
                p1 = out[-1] if out else 0
                p2 = out[-2] if len(out) >= 2 else 0
                ctx = ctx_lut[mode_off + p1] | ctx_lut[mode_off + 256 + p2]
                tree = lit_trees[cmap_l[(lit_bs.btype << 6) + ctx]]
                out.append(tree.decode(bits))
                mpos += 1
            if mpos >= mlen:
                break

            max_dist = min(len(out), window)
            if implicit_d0:
                dcode = 0
            else:
                dst_bs.maybe_switch(bits)
                dst_bs.count -= 1
                dctx = min(clen, 5) - 2
                tree = dist_trees[cmap_d[(dst_bs.btype << 2) + dctx]]
                dcode = tree.decode(bits)
            if dcode == 0:
                # reference semantics: code 0 PRE-decrements the ring
                # index; the unconditional push on the copy path below
                # rewrites the same slot (net no-op) — but a DICTIONARY
                # reference skips the push, so the ring net-rolls back
                # one slot ("compensate double distance-ring-buffer
                # roll for dictionary items")
                rb_idx -= 1
                distance = rb[rb_idx & 3]
            else:
                if dcode < 4:
                    # 1 → second-to-last, 2 → third, 3 → fourth
                    distance = rb[(rb_idx + 3 - dcode) & 3]
                elif dcode < 16:
                    # 4..9: last ±1..3;  10..15: second-to-last ±1..3
                    base = rb[(rb_idx + (3 if dcode < 10 else 2)) & 3]
                    k = dcode - 4 if dcode < 10 else dcode - 10
                    delta = (k >> 1) + 1
                    distance = base + (delta if k & 1 else -delta)
                    if distance <= 0:
                        raise BrotliFormatError("non-positive ring distance")
                elif dcode < 16 + ndirect:
                    distance = dcode - 15
                else:
                    dc = dcode - ndirect - 16
                    ndistbits = 1 + (dc >> (npostfix + 1))
                    dextra = bits.read(ndistbits)
                    hcode = dc >> npostfix
                    lcode = dc & postfix_mask
                    offset = ((2 + (hcode & 1)) << ndistbits) - 4
                    distance = (
                        ((offset + dextra) << npostfix)
                        + lcode + ndirect + 1
                    )

            if distance > max_dist:
                # static dictionary reference
                if not (4 <= clen <= 24) or size_bits[clen] == 0:
                    raise BrotliFormatError(
                        f"dictionary reference with copy length {clen}"
                    )
                word_id = distance - max_dist - 1
                shift = size_bits[clen]
                word_idx = word_id & ((1 << shift) - 1)
                tid = word_id >> shift
                if tid >= len(transforms):
                    raise BrotliFormatError("transform id out of range")
                base_off = dict_offsets[clen] + clen * word_idx
                word = dict_data[base_off : base_off + clen]
                piece = _apply_transform(word, transforms[tid])
                out += piece
                mpos += len(piece)
            else:
                if distance <= 0:
                    raise BrotliFormatError("non-positive distance")
                start = len(out) - distance
                if distance >= clen:
                    out += out[start : start + clen]
                else:
                    for i in range(clen):
                        out.append(out[start + i])
                mpos += clen
                # unconditional on the copy path: for code 0 this
                # rewrites the pre-decremented slot with its own value
                rb[rb_idx & 3] = distance
                rb_idx += 1
            if mpos > mlen:
                raise BrotliFormatError("copy ran past meta-block length")
        if islast:
            break
    return bytes(out)
