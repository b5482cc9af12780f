"""Lossless WebP (VP8L) codec — pure stdlib + numpy, no image library.

Implements the public "WebP Lossless Bitstream Specification" (Google,
RFC-style spec shipped with libwebp). The DECODER is general: LSB-first
bit reading, simple and normal prefix codes (code-length codes with
16/17/18 repeats and the max-symbol shortcut), color cache, meta prefix
(entropy) images, LZ77 backward references with the 120-entry 2D
distance map, and all four transforms — PREDICTOR (14 modes, linear
neighbor semantics), cross-COLOR, SUBTRACT-GREEN, and COLOR-INDEXING
incl. sub-byte packed indices. The ENCODER emits conformant literal
streams (per-channel prefix codes, optional subtract-green, optional
color cache, optional dist-1 LZ77 run collapsing) — every file it
writes is a valid .webp any stock viewer accepts.

Round-3 parity move: replaces the last NotImplementedError image stub
(fmt=webp) in operators/images.py, same upgrade as JPEG; undecodable
rows keep quarantining (OsmJoin.java:176-179).
"""

from __future__ import annotations

import numpy as np

# ----------------------------------------------------------------- bit I/O


class _BitReader:
    """LSB-first (DEFLATE-style) buffered bit reader with peek support.
    Peeks past the stream end see zero padding (prefix-LUT reads near
    the end legitimately over-peek); CONSUMING meaningfully past the end
    raises."""

    __slots__ = ("data", "pos", "acc", "n", "over")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0
        self.over = 0

    def _fill(self, need: int):
        while self.n < need:
            if self.pos < len(self.data):
                self.acc |= self.data[self.pos] << self.n
                self.pos += 1
            else:
                self.over += 1
                if self.over > 8:
                    raise ValueError("VP8L bitstream truncated")
            self.n += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        v = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.n -= n
        return v

    def peek(self, n: int) -> int:
        self._fill(n)
        return self.acc & ((1 << n) - 1)

    def skip(self, n: int):
        self.acc >>= n
        self.n -= n


class _BitWriter:
    __slots__ = ("out", "acc", "n")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, bits: int):
        """Append ``bits`` of v, LSB first (plain ReadBits payloads)."""
        for i in range(bits):
            self.acc |= ((v >> i) & 1) << self.n
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.n = 0

    def write_code(self, code: int, length: int):
        """Append a prefix code MSB-of-code first (DEFLATE packing)."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def write_tokens(self, codes: np.ndarray, lens: np.ndarray):
        """Vectorized batch append: each (code, len) written MSB-first
        (len 0 tokens are skipped). ~15 numpy passes instead of a
        Python loop per bit — the encoder hot path."""
        m0 = lens > 0
        codes, lens = codes[m0], lens[m0]
        total = int(lens.sum())
        if total == 0:
            return
        cum = np.cumsum(lens)
        starts = cum - lens
        bits = np.zeros(total, dtype=np.uint8)
        for j in range(int(lens.max())):
            m = lens > j
            bits[starts[m] + j] = (codes[m] >> (lens[m] - 1 - j)) & 1
        # splice with any pending partial byte
        if self.n:
            pre = np.array([(self.acc >> j) & 1 for j in range(self.n)],
                           dtype=np.uint8)
            bits = np.concatenate([pre, bits])
            self.acc, self.n = 0, 0
        nfull = len(bits) // 8
        if nfull:
            self.out += np.packbits(
                bits[:nfull * 8], bitorder="little").tobytes()
        for j, b in enumerate(bits[nfull * 8:].tolist()):
            self.acc |= b << j
            self.n += 1

    def bytes(self) -> bytes:
        if self.n:
            self.out.append(self.acc)
            self.acc, self.n = 0, 0
        return bytes(self.out)


# ------------------------------------------------------------ prefix codes

_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


class _PrefixCode:
    """Canonical prefix code decoded via a peek-k-bits LUT (DEFLATE
    packing: code bits MSB-first in the LSB-first stream, so the LUT
    index is the BIT-REVERSED code plus arbitrary high filler bits)."""

    __slots__ = ("single", "bits", "lut_sym", "lut_len")

    def __init__(self, lengths: list[int]):
        used = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not used:
            raise ValueError("empty prefix code")
        if len(used) == 1:
            self.single = used[0][1]
            self.bits = 0
            self.lut_sym = self.lut_len = None
            return
        self.single = None
        used.sort()
        if sum(2.0 ** -ln for ln, _ in used) != 1.0:
            raise ValueError("prefix code not complete")
        self.bits = used[-1][0]
        if self.bits > 15:
            raise ValueError("prefix code longer than 15 bits")
        size = 1 << self.bits
        lut_sym = np.zeros(size, dtype=np.int32)
        lut_len = np.zeros(size, dtype=np.int32)
        code = 0
        prev_len = used[0][0]
        for ln, sym in used:
            code <<= (ln - prev_len)
            prev_len = ln
            rev = int(f"{code:0{ln}b}"[::-1], 2)  # bit-reverse within ln
            lut_sym[rev::1 << ln] = sym
            lut_len[rev::1 << ln] = ln
            code += 1
        self.lut_sym = lut_sym.tolist()
        self.lut_len = lut_len.tolist()

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        idx = br.peek(self.bits)
        br.skip(self.lut_len[idx])
        return self.lut_sym[idx]


def canonical_codes(lengths: list[int]) -> dict[int, tuple]:
    """symbol → (code, length) for a complete canonical code."""
    used = sorted((ln, sym) for sym, ln in enumerate(lengths) if ln > 0)
    out = {}
    code, prev = 0, used[0][0]
    for ln, sym in used:
        code <<= (ln - prev)
        prev = ln
        out[sym] = (code, ln)
        code += 1
    return out


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        if br.read(1):  # first symbol is 8 bits
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        lengths = [0] * alphabet_size
        if num_symbols == 1:
            lengths[sym0] = 1  # placeholder; handled as single-symbol
            pc = _PrefixCode.__new__(_PrefixCode)
            pc.single = sym0
            pc.bits = 0
            pc.lut_sym = pc.lut_len = None
            return pc
        sym1 = br.read(8)
        if sym0 == sym1 or sym0 >= alphabet_size or sym1 >= alphabet_size:
            raise ValueError("bad simple prefix code symbols")
        lengths[sym0] = 1
        lengths[sym1] = 1
        return _PrefixCode(lengths)
    # normal code: code-length code first
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_code = _PrefixCode(cl_lengths) if sum(cl_lengths) else None
    if cl_code is None:
        raise ValueError("empty code-length code")
    if br.read(1):  # use max_symbol (token budget)
        length_nbits = 2 + 2 * br.read(3)
        max_tokens = 2 + br.read(length_nbits)
    else:
        max_tokens = alphabet_size
    lengths = [0] * alphabet_size
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size:
        if max_tokens <= 0:
            break
        max_tokens -= 1
        cl = cl_code.read(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl:
                prev_len = cl
        elif cl == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if symbol < alphabet_size:
                    lengths[symbol] = prev_len
                    symbol += 1
        elif cl == 17:
            symbol += 3 + br.read(3)
        else:  # 18
            symbol += 11 + br.read(7)
    return _PrefixCode(lengths)


# ------------------------------------------------------- LZ77 value coding


def _lz77_value(br: _BitReader, sym: int) -> int:
    """length/distance prefix symbol (0-39ish) + extra bits → value."""
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + br.read(extra) + 1


def _lz77_symbol(value: int) -> tuple:
    """value → (prefix symbol, extra_bits_value, extra_bits_count);
    exact inverse of :func:`_lz77_value`."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    extra = v.bit_length() - 2
    bit = (v >> extra) & 1
    sym = 2 * extra + 2 + bit
    offset = (2 + bit) << extra
    return sym, v - offset, extra


# 2D distance map: codes 1..120 → (dx, dy); from the public spec table.
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


def _plane_dist(code: int, xsize: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    d = dy * xsize + dx
    return d if d >= 1 else 1


# -------------------------------------------------------- image substream


def _cache_key(argb: int, bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - bits)


def _read_image_stream(br: _BitReader, w: int, h: int,
                       is_level0: bool) -> np.ndarray:
    """Decode one entropy-coded ARGB image (w*h uint32, row-major).
    At level 0 also reads transforms and the entropy image; subimages
    (transform data, palettes, entropy image itself) recurse with
    is_level0=False."""
    transforms = []
    xsize = w
    if is_level0:
        while br.read(1):
            ttype = br.read(2)
            if any(t[0] == ttype for t in transforms):
                raise ValueError("duplicate VP8L transform")
            if ttype == 0:  # PREDICTOR
                size_bits = br.read(3) + 2
                bw_, bh_ = _sub_size(xsize, size_bits), _sub_size(h, size_bits)
                sub = _read_image_stream(br, bw_, bh_, False)
                transforms.append((0, size_bits, sub))
            elif ttype == 1:  # cross-COLOR
                size_bits = br.read(3) + 2
                bw_, bh_ = _sub_size(xsize, size_bits), _sub_size(h, size_bits)
                sub = _read_image_stream(br, bw_, bh_, False)
                transforms.append((1, size_bits, sub))
            elif ttype == 2:  # SUBTRACT-GREEN
                transforms.append((2, None, None))
            else:  # 3 = COLOR-INDEXING
                n_colors = br.read(8) + 1
                pal = _read_image_stream(br, n_colors, 1, False)
                # palette entries are delta-coded per channel
                p = pal.astype(np.uint32)
                for i in range(1, n_colors):
                    a = (p[i] >> 24) + (p[i - 1] >> 24)
                    r = ((p[i] >> 16) & 0xFF) + ((p[i - 1] >> 16) & 0xFF)
                    g = ((p[i] >> 8) & 0xFF) + ((p[i - 1] >> 8) & 0xFF)
                    b = (p[i] & 0xFF) + (p[i - 1] & 0xFF)
                    p[i] = ((a & 0xFF) << 24) | ((r & 0xFF) << 16) \
                        | ((g & 0xFF) << 8) | (b & 0xFF)
                if n_colors <= 2:
                    width_bits = 3
                elif n_colors <= 4:
                    width_bits = 2
                elif n_colors <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                transforms.append((3, (p, width_bits, xsize)))
                if width_bits:
                    xsize = _sub_size(xsize, width_bits)

    # color cache
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"bad color cache bits {cache_bits}")
    cache = [0] * (1 << cache_bits) if cache_bits else None

    # entropy (meta prefix) image
    meta = None
    meta_bits = 0
    n_groups = 1
    if is_level0 and br.read(1):
        meta_bits = br.read(3) + 2
        mw, mh = _sub_size(xsize, meta_bits), _sub_size(h, meta_bits)
        meta = _read_image_stream(br, mw, mh, False)
        ids = ((meta >> 8) & 0xFFFF).astype(np.int64)
        n_groups = int(ids.max()) + 1
        meta_ids = ids.reshape(mh, mw)
    green_alpha = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        groups.append((
            _read_prefix_code(br, green_alpha),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 40),
        ))

    n_px = xsize * h
    out = np.zeros(n_px, dtype=np.uint32)
    pos = 0
    while pos < n_px:
        x, y = pos % xsize, pos // xsize
        if meta is not None:
            gid = int(meta_ids[y >> meta_bits, x >> meta_bits])
            g_code, r_code, b_code, a_code, d_code = groups[gid]
        else:
            g_code, r_code, b_code, a_code, d_code = groups[0]
        s = g_code.read(br)
        if s < 256:
            r = r_code.read(br)
            b = b_code.read(br)
            a = a_code.read(br)
            px = (a << 24) | (r << 16) | (s << 8) | b
            out[pos] = px
            if cache is not None:
                cache[_cache_key(px, cache_bits)] = px
            pos += 1
        elif s < 280:
            length = _lz77_value(br, s - 256)
            dsym = d_code.read(br)
            dist = _plane_dist(_lz77_value(br, dsym), xsize)
            if dist > pos:
                raise ValueError("LZ77 distance before stream start")
            for _ in range(length):
                if pos >= n_px:
                    raise ValueError("LZ77 copy past image end")
                px = int(out[pos - dist])
                out[pos] = px
                if cache is not None:
                    cache[_cache_key(px, cache_bits)] = px
                pos += 1
        else:
            if cache is None:
                raise ValueError("cache symbol without color cache")
            out[pos] = cache[s - 280]
            pos += 1

    # apply inverse transforms in reverse order of reading
    for t in reversed(transforms):
        if t[0] == 2:
            out = _inv_subtract_green(out)
        elif t[0] == 0:
            out = _inv_predictor(out, xsize, h, t[1], t[2])
        elif t[0] == 1:
            out = _inv_color(out, xsize, h, t[1], t[2])
        else:
            pal, width_bits, full_w = t[1]
            out = _inv_color_index(out, xsize, h, pal, width_bits, full_w)
            xsize = full_w
    return out


def _sub_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _inv_subtract_green(px: np.ndarray) -> np.ndarray:
    g = (px >> 8) & 0xFF
    r = (((px >> 16) & 0xFF) + g) & 0xFF
    b = ((px & 0xFF) + g) & 0xFF
    return (px & np.uint32(0xFF00FF00)) | (r << np.uint32(16)) | b


def _avg2(a: int, b: int) -> int:
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _select(t: int, l: int, tl: int) -> int:
    p_alpha = ((t >> 24) & 0xFF) + ((l >> 24) & 0xFF) - ((tl >> 24) & 0xFF)
    p_red = ((t >> 16) & 0xFF) + ((l >> 16) & 0xFF) - ((tl >> 16) & 0xFF)
    p_green = ((t >> 8) & 0xFF) + ((l >> 8) & 0xFF) - ((tl >> 8) & 0xFF)
    p_blue = (t & 0xFF) + (l & 0xFF) - (tl & 0xFF)
    pl = (abs(p_alpha - ((l >> 24) & 0xFF)) + abs(p_red - ((l >> 16) & 0xFF))
          + abs(p_green - ((l >> 8) & 0xFF)) + abs(p_blue - (l & 0xFF)))
    pt = (abs(p_alpha - ((t >> 24) & 0xFF)) + abs(p_red - ((t >> 16) & 0xFF))
          + abs(p_green - ((t >> 8) & 0xFF)) + abs(p_blue - (t & 0xFF)))
    return l if pl < pt else t


def _clamp(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _cas_full(l: int, t: int, tl: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        v = ((l >> shift) & 0xFF) + ((t >> shift) & 0xFF) - ((tl >> shift) & 0xFF)
        out |= _clamp(v) << shift
    return out


def _cas_half(ave: int, tl: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        a = (ave >> shift) & 0xFF
        b = (tl >> shift) & 0xFF
        d = a - b
        # spec pseudo-C: a + (a - b) / 2 with TRUNCATING division
        v = a + (d // 2 if d >= 0 else -((-d) // 2))
        out |= _clamp(v) << shift
    return out


def _inv_predictor(res: np.ndarray, w: int, h: int, size_bits: int,
                   sub: np.ndarray) -> np.ndarray:
    sw = _sub_size(w, size_bits)
    modes = ((sub >> 8) & 0xFF).reshape(_sub_size(h, size_bits), sw)
    out = res.astype(np.uint32).copy()
    for i in range(w * h):
        x, y = i % w, i // w
        if i == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = int(out[i - 1])      # L
        elif x == 0:
            pred = int(out[i - w])      # T
        else:
            mode = int(modes[y >> size_bits, x >> size_bits])
            L = int(out[i - 1])
            T = int(out[i - w])
            TL = int(out[i - w - 1])
            TR = int(out[i - w + 1])    # linear wrap at row end, per spec
            if mode == 0:
                pred = 0xFF000000
            elif mode == 1:
                pred = L
            elif mode == 2:
                pred = T
            elif mode == 3:
                pred = TR
            elif mode == 4:
                pred = TL
            elif mode == 5:
                pred = _avg2(_avg2(L, TR), T)
            elif mode == 6:
                pred = _avg2(L, TL)
            elif mode == 7:
                pred = _avg2(L, T)
            elif mode == 8:
                pred = _avg2(TL, T)
            elif mode == 9:
                pred = _avg2(T, TR)
            elif mode == 10:
                pred = _avg2(_avg2(L, TL), _avg2(T, TR))
            elif mode == 11:
                pred = _select(T, L, TL)
            elif mode == 12:
                pred = _cas_full(L, T, TL)
            elif mode == 13:
                pred = _cas_half(_avg2(L, T), TL)
            else:
                raise ValueError(f"bad predictor mode {mode}")
        # per-channel modular add
        s = int(res[i])
        v = 0
        for shift in (24, 16, 8, 0):
            v |= (((s >> shift) + (pred >> shift)) & 0xFF) << shift
        out[i] = v
    return out


def _ctd(t: int, c: int) -> int:
    """ColorTransformDelta: signed-int8 multiply, arithmetic >> 5."""
    t8 = t - 256 if t >= 128 else t
    c8 = c - 256 if c >= 128 else c
    return (t8 * c8) >> 5


def _inv_color(res: np.ndarray, w: int, h: int, size_bits: int,
               sub: np.ndarray) -> np.ndarray:
    sw = _sub_size(w, size_bits)
    elems = sub.reshape(_sub_size(h, size_bits), sw)
    out = res.astype(np.uint32).copy()
    for i in range(w * h):
        x, y = i % w, i // w
        e = int(elems[y >> size_bits, x >> size_bits])
        g2r = e & 0xFF
        g2b = (e >> 8) & 0xFF
        r2b = (e >> 16) & 0xFF
        px = int(out[i])
        a = (px >> 24) & 0xFF
        r = (px >> 16) & 0xFF
        g = (px >> 8) & 0xFF
        b = px & 0xFF
        r = (r + _ctd(g2r, g)) & 0xFF
        b = (b + _ctd(g2b, g) + _ctd(r2b, r)) & 0xFF
        out[i] = (a << 24) | (r << 16) | (g << 8) | b
    return out


def _inv_color_index(px: np.ndarray, packed_w: int, h: int, pal: np.ndarray,
                     width_bits: int, full_w: int) -> np.ndarray:
    n_colors = len(pal)
    if width_bits == 0:
        idx = (px >> 8) & 0xFF
        if int(idx.max(initial=0)) >= n_colors:
            raise ValueError("palette index out of range")
        return pal[idx.astype(np.int64)]
    per = 1 << width_bits            # pixels packed per green byte
    bits = 8 >> width_bits           # bits per index
    out = np.zeros(full_w * h, dtype=np.uint32)
    greens = ((px >> 8) & 0xFF).reshape(h, packed_w)
    for y in range(h):
        for xp in range(packed_w):
            g = int(greens[y, xp])
            for k in range(per):
                x = xp * per + k
                if x >= full_w:
                    break
                idx = (g >> (k * bits)) & ((1 << bits) - 1)
                if idx >= n_colors:
                    raise ValueError("palette index out of range")
                out[y * full_w + x] = pal[idx]
    return out


# ----------------------------------------------------------------- decoder


def decode_webp(buf: bytes) -> np.ndarray:
    """Decode a lossless (VP8L) .webp → (h, w, 3) uint8 RGB (alpha
    dropped). Lossy VP8 raises ValueError (out of scope: that is a full
    video-intra codec)."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP file")
    pos = 12
    payload = None
    while pos + 8 <= len(buf):
        fourcc = buf[pos:pos + 4]
        size = int.from_bytes(buf[pos + 4:pos + 8], "little")
        if fourcc == b"VP8L":
            payload = buf[pos + 8:pos + 8 + size]
            break
        if fourcc == b"VP8 " or fourcc == b"VP8X":
            if fourcc == b"VP8 ":
                raise ValueError("lossy VP8 webp not supported (VP8L only)")
        pos += 8 + size + (size % 2)
    if payload is None:
        raise ValueError("no VP8L chunk")
    if payload[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)   # alpha hint
    if br.read(3) != 0:
        raise ValueError("unsupported VP8L version")
    argb = _read_image_stream(br, w, h, True)
    r = ((argb >> 16) & 0xFF).astype(np.uint8)
    g = ((argb >> 8) & 0xFF).astype(np.uint8)
    b = (argb & 0xFF).astype(np.uint8)
    return np.stack([r, g, b], axis=-1).reshape(h, w, 3)


# ----------------------------------------------------------------- encoder


def _huffman_lengths(freqs: list[int], max_len: int = 15) -> list[int]:
    """Length-limited canonical-code lengths with Kraft equality == 1
    (VP8L requires COMPLETE codes). Heap Huffman for the shape, clamp to
    ``max_len``, then exact-fit adjustment; if the greedy adjustment
    cannot land exactly on Kraft == 1, fall back to the always-valid
    two-level flat code (lengths b and b-1 over the used symbols, long
    codes on the rarest symbols)."""
    import heapq

    n = len(freqs)
    used = [i for i, f in enumerate(freqs) if f > 0]
    lengths = [0] * n
    if not used:
        return lengths
    if len(used) == 1:
        lengths[used[0]] = 1
        return lengths

    heap = [(f, i) for i, f in enumerate(freqs) if f > 0]
    heapq.heapify(heap)
    nxt = n
    parent: dict[int, int] = {}
    while len(heap) > 1:
        f1, i1 = heapq.heappop(heap)
        f2, i2 = heapq.heappop(heap)
        parent[i1] = nxt
        parent[i2] = nxt
        heapq.heappush(heap, (f1 + f2, nxt))
        nxt += 1
    for sym in used:
        d, node = 0, sym
        while node in parent:
            node = parent[node]
            d += 1
        lengths[sym] = min(d, max_len)

    target = 1 << max_len

    def kraft():
        return sum(1 << (max_len - lengths[s]) for s in used)

    # overfull after clamping: deepen rarest symbols
    guard = 0
    while kraft() > target and guard < 10_000:
        guard += 1
        cands = [s for s in used if lengths[s] < max_len]
        if not cands:
            break
        s = min(cands, key=lambda x: (freqs[x], x))
        lengths[s] += 1
    # underfull: shorten deepest symbols where the gain still fits
    guard = 0
    while kraft() < target and guard < 10_000:
        guard += 1
        k = kraft()
        for s in sorted(used, key=lambda x: (-lengths[x], x)):
            gain = 1 << (max_len - lengths[s])
            if lengths[s] > 1 and k + gain <= target:
                lengths[s] -= 1
                break
        else:
            break
    if kraft() == target:
        return lengths

    # flat fallback: m symbols → long_cnt codes of b bits, rest b-1
    m = len(used)
    b = max(1, (m - 1).bit_length())
    long_cnt = 2 * m - (1 << b)
    by_rarity = sorted(used, key=lambda s: (freqs[s], s))
    lengths = [0] * n
    for i, sym in enumerate(by_rarity):
        lengths[sym] = b if i < long_cnt else b - 1
    if any(lengths[s] == 0 for s in used):  # m a power of two → all b
        for sym in used:
            lengths[sym] = b
    return lengths


def _write_prefix_code(bw: _BitWriter, lengths: list[int]):
    """Serialize code lengths: simple code when ≤2 symbols, else the
    code-length-code path with {8,16,17,18}-style tokens."""
    used = [s for s, ln in enumerate(lengths) if ln > 0]
    if len(used) <= 2 and all(lengths[s] == 1 for s in used) \
            and (len(used) < 2 or used[1] < 256):
        bw.write(1, 1)                      # simple
        bw.write(len(used) - 1, 1)
        if used[0] >= 2:
            bw.write(1, 1)                  # 8-bit first symbol
            bw.write(used[0], 8)
        else:
            bw.write(0, 1)
            bw.write(used[0], 1)
        if len(used) == 2:
            bw.write(used[1], 8)
        return
    bw.write(0, 1)                          # normal
    # tokenise lengths with zero-runs (17/18); literal otherwise
    tokens = []
    i = 0
    n = len(lengths)
    while i < n:
        if lengths[i] == 0:
            run = 1
            while i + run < n and lengths[i + run] == 0:
                run += 1
            left = run
            while left >= 11:
                take = min(left, 138)
                tokens.append((18, take - 11, 7))
                left -= take
            while left >= 3:
                take = min(left, 10)
                tokens.append((17, take - 3, 3))
                left -= take
            for _ in range(left):
                tokens.append((0, 0, 0))
            i += run
        else:
            tokens.append((lengths[i], 0, 0))
            i += 1
    # trailing zero runs MUST be emitted: without the max-token
    # shortcut the decoder keeps reading tokens until every symbol of
    # the alphabet has a length
    cl_freq = [0] * 19
    for t, _, _ in tokens:
        cl_freq[t] += 1
    cl_lengths = _huffman_lengths(cl_freq, max_len=7)
    num_cl = max(
        (i for i in range(19) if cl_lengths[_CL_ORDER[i]] > 0), default=3) + 1
    num_cl = max(num_cl, 4)
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(cl_lengths[_CL_ORDER[i]], 3)
    cl_codes = canonical_codes(cl_lengths)
    bw.write(0, 1)                          # no max-symbol shortcut
    for t, extra, ebits in tokens:
        code, ln = cl_codes[t]
        bw.write_code(code, ln)
        if ebits:
            bw.write(extra, ebits)


def _write_image_stream(bw: _BitWriter, argb: np.ndarray, w: int, h: int,
                        cache_bits: int = 0, rle: bool = False,
                        is_level0: bool = True,
                        subtract_green: bool = False,
                        transform_terminator: bool = True):
    """Entropy-code an ARGB array as one VP8L image stream."""
    px = argb.astype(np.uint32).copy()
    if subtract_green:
        g = (px >> 8) & 0xFF
        r = (((px >> 16) & 0xFF) - g) & 0xFF
        b = ((px & 0xFF) - g) & 0xFF
        px = (px & np.uint32(0xFF00FF00)) | (r << np.uint32(16)) | b
        bw.write(1, 1)                      # transform present
        bw.write(2, 2)                      # SUBTRACT_GREEN
    if is_level0 and transform_terminator:
        bw.write(0, 1)                      # no (more) transforms
    if not cache_bits:
        _write_stream_fast(bw, px, rle, is_level0)
        return
    # general (color-cache) path: sequential tokenizer
    ops = []
    cache = [None] * (1 << cache_bits) if cache_bits else None
    i = 0
    n = len(px)
    while i < n:
        v = int(px[i])
        if rle and i > 0 and v == int(px[i - 1]):
            run = 1
            while i + run < n and int(px[i + run]) == v:
                run += 1
            ops.append(("copy", run, 1))
            if cache is not None:
                cache[_cache_key(v, cache_bits)] = v
            i += run
            continue
        if cache is not None:
            k = _cache_key(v, cache_bits)
            if cache[k] == v:
                ops.append(("cache", k))
                i += 1
                continue
            cache[k] = v
        ops.append(("lit", v))
        i += 1
    # histograms
    green_alpha = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    gf = [0] * green_alpha
    rf, bf, af = [0] * 256, [0] * 256, [0] * 256
    df = [0] * 40
    for op in ops:
        if op[0] == "lit":
            v = op[1]
            gf[(v >> 8) & 0xFF] += 1
            rf[(v >> 16) & 0xFF] += 1
            bf[v & 0xFF] += 1
            af[(v >> 24) & 0xFF] += 1
        elif op[0] == "cache":
            gf[280 + op[1]] += 1
        else:
            sym, _, _ = _lz77_symbol(op[1])
            gf[256 + sym] += 1
            dsym, _, _ = _lz77_symbol(op[2] + 120)
            df[dsym] += 1
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if is_level0:
        bw.write(0, 1)                      # no entropy image
    gl = _huffman_lengths(gf)
    rl_, bl, al = (_huffman_lengths(x) for x in (rf, bf, af))
    dl = _huffman_lengths(df)
    for lengths in (gl, rl_, bl, al, dl):
        if not any(lengths):
            lengths[0] = 1                  # unused code: 1 dummy symbol
        _write_prefix_code(bw, lengths)
    gc, rc, bc, ac = (canonical_codes(x) for x in (gl, rl_, bl, al))
    dc = canonical_codes(dl)

    def put_always(codes, sym):
        if len(codes) == 1:
            return                          # zero-bit single-symbol code
        code, ln = codes[sym]
        bw.write_code(code, ln)

    for op in ops:
        if op[0] == "lit":
            v = op[1]
            put_always(gc, (v >> 8) & 0xFF)
            put_always(rc, (v >> 16) & 0xFF)
            put_always(bc, v & 0xFF)
            put_always(ac, (v >> 24) & 0xFF)
        elif op[0] == "cache":
            put_always(gc, 280 + op[1])
        else:
            _, length, dist = op
            sym, extra, ebits = _lz77_symbol(length)
            put_always(gc, 256 + sym)
            bw.write(extra, ebits)
            dsym, dextra, debits = _lz77_symbol(dist + 120)
            put_always(dc, dsym)
            bw.write(dextra, debits)


def _lut_arrays(codes: dict, alphabet: int):
    """(code_arr, len_arr) for vectorized emission; a single-symbol code
    gets length 0 (reads consume zero bits)."""
    c = np.zeros(alphabet, dtype=np.int64)
    ln = np.zeros(alphabet, dtype=np.int64)
    if len(codes) > 1:
        for s, (co, l_) in codes.items():
            c[s] = co
            ln[s] = l_
    return c, ln


def _bitrev(vals: np.ndarray, nbits: np.ndarray) -> np.ndarray:
    """Per-element bit reversal within nbits (raw ReadBits payloads are
    LSB-first; the token packer writes MSB-first)."""
    out = np.zeros_like(vals)
    if len(vals) == 0:
        return out
    for j in range(int(nbits.max())):
        m = nbits > j
        out[m] |= ((vals[m] >> j) & 1) << (nbits[m] - 1 - j)
    return out


def _write_stream_fast(bw: _BitWriter, px: np.ndarray, rle: bool,
                       is_level0: bool):
    """Vectorized no-color-cache emission: run-length tokenize, bincount
    histograms, LUT code arrays, one batched bit-pack (~10x the
    sequential tokenizer, which still serves the color-cache path)."""
    vals = px.astype(np.int64)
    n = len(vals)
    if rle and n > 1:
        new_run = np.empty(n, dtype=bool)
        new_run[0] = True
        new_run[1:] = vals[1:] != vals[:-1]
        starts = np.nonzero(new_run)[0]
        run_lens = np.diff(np.append(starts, n))
    else:
        starts = np.arange(n)
        run_lens = np.ones(n, dtype=np.int64)
    lit_vals = vals[starts]
    copies = run_lens - 1
    cm = copies > 0
    copy_lens = copies[cm]

    g = (lit_vals >> 8) & 0xFF
    r = (lit_vals >> 16) & 0xFF
    b = lit_vals & 0xFF
    a = (lit_vals >> 24) & 0xFF
    gf = np.bincount(g, minlength=280).astype(np.int64)
    rf = np.bincount(r, minlength=256)
    bf = np.bincount(b, minlength=256)
    af = np.bincount(a, minlength=256)

    # vectorized _lz77_symbol over copy lengths
    if len(copy_lens):
        small = copy_lens <= 4
        v = copy_lens - 1
        bl = np.frexp(v.astype(np.float64))[1]      # exact int bit_length
        extra = np.maximum(bl - 2, 0)
        bit = (v >> extra) & 1
        len_sym = np.where(small, copy_lens - 1, 2 * extra + 2 + bit)
        len_eb_val = np.where(small, 0, v - ((2 + bit) << extra))
        len_eb_cnt = np.where(small, 0, extra)
        np.add.at(gf, 256 + len_sym, 1)
    dsym, deb_val, deb_cnt = _lz77_symbol(1 + 120)  # dist 1 (plain code)
    df = [0] * 40
    df[dsym] = int(cm.sum())

    if is_level0:
        bw.write(0, 1)                      # no color cache
        bw.write(0, 1)                      # no entropy image
    else:
        bw.write(0, 1)                      # no color cache
    gl = _huffman_lengths(gf.tolist())
    rl_, bl_, al = (_huffman_lengths(x.tolist()) for x in (rf, bf, af))
    dl = _huffman_lengths(df)
    for lengths in (gl, rl_, bl_, al, dl):
        if not any(lengths):
            lengths[0] = 1
        _write_prefix_code(bw, lengths)
    gc_c, gc_l = _lut_arrays(canonical_codes(gl), 280)
    rc_c, rc_l = _lut_arrays(canonical_codes(rl_), 256)
    bc_c, bc_l = _lut_arrays(canonical_codes(bl_), 256)
    ac_c, ac_l = _lut_arrays(canonical_codes(al), 256)
    dc_c, dc_l = _lut_arrays(canonical_codes(dl), 40)

    n_runs = len(lit_vals)
    T = np.zeros((n_runs, 8), dtype=np.int64)
    L = np.zeros((n_runs, 8), dtype=np.int64)
    T[:, 0], L[:, 0] = gc_c[g], gc_l[g]
    T[:, 1], L[:, 1] = rc_c[r], rc_l[r]
    T[:, 2], L[:, 2] = bc_c[b], bc_l[b]
    T[:, 3], L[:, 3] = ac_c[a], ac_l[a]
    if len(copy_lens):
        T[cm, 4], L[cm, 4] = gc_c[256 + len_sym], gc_l[256 + len_sym]
        T[cm, 5] = _bitrev(len_eb_val, len_eb_cnt)
        L[cm, 5] = len_eb_cnt
        T[cm, 6], L[cm, 6] = dc_c[dsym], dc_l[dsym]
        if deb_cnt:
            T[cm, 7] = _bitrev(np.full(int(cm.sum()), deb_val, np.int64),
                               np.full(int(cm.sum()), deb_cnt, np.int64))
            L[cm, 7] = deb_cnt
    bw.write_tokens(T.ravel(), L.ravel())


def encode_webp(px: np.ndarray, cache_bits: int = 0, rle: bool = True,
                subtract_green: bool = True) -> bytes:
    """Encode (h, w, 3) uint8 RGB as a lossless VP8L .webp."""
    h, w = px.shape[:2]
    if w > (1 << 14) or h > (1 << 14):
        raise ValueError("VP8L max dimension is 16384")
    p = px.astype(np.uint32)
    argb = (np.uint32(0xFF) << np.uint32(24)) | (p[..., 0] << np.uint32(16)) \
        | (p[..., 1] << np.uint32(8)) | p[..., 2]
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)                          # no alpha
    bw.write(0, 3)                          # version 0
    _write_image_stream(bw, argb.reshape(-1), w, h, cache_bits=cache_bits,
                        rle=rle, subtract_green=subtract_green)
    payload = b"\x2f" + bw.bytes()
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) % 2:
        chunk += b"\x00"
    body = b"WEBP" + chunk
    return b"RIFF" + len(body).to_bytes(4, "little") + body
