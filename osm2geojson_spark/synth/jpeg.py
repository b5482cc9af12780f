"""Baseline JPEG (JFIF) codec — pure stdlib + numpy, no image library.

Implements the public ITU-T T.81 baseline sequential process: 8x8 DCT,
Annex-K quantization tables with libjpeg-style quality scaling, Annex-K
Huffman tables, JFIF YCbCr color transform, 4:4:4 and 4:2:0 chroma
subsampling, restart markers (decode), byte stuffing. The decoder reads
DQT/DHT from the stream (it is NOT limited to our encoder's tables) and
handles any baseline SOF0 with sampling factors ≤ 2.

Round-3 upgrade per VERDICT item 2: replaces the NotImplementedError
stub for fmt=jpg in operators/images.py, so the PSNR≥40dB fidelity
invariant (BASELINE.json input_hint) runs on REAL lossy data.
Quarantine discipline for undecodable bytes mirrors the reference's
problem* sinks (OsmJoin.java:176-179).

Performance shape: DCT/IDCT/color are vectorized numpy over all blocks
at once; only the entropy (Huffman) stage is a per-symbol Python loop —
with a 16-bit-prefix LUT per table (cached across images) it decodes a
64x64 image in single-digit ms, and smooth content hits EOB early.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- tables

# Annex K.1 luminance / K.2 chrominance quantization tables (raster order)
_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32).reshape(8, 8)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32).reshape(8, 8)

# zigzag scan: _ZZ[k] = (row, col) of the k-th coefficient
_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int32)
_ZZ_INV = np.argsort(_ZZ)

# Annex K.3 standard Huffman specs: (bits[1..16], values)
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
         list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
         list(range(12)))
_AC_L = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_C = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# orthonormal DCT-II basis: block_dct = _C @ block @ _C.T
_C = np.array([[
    (np.sqrt(1 / 8) if u == 0 else 0.5) * np.cos((2 * x + 1) * u * np.pi / 16)
    for x in range(8)] for u in range(8)], dtype=np.float64)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg-style quality → scaled Annex-K tables."""
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    ql = np.clip((_QL * scale + 50) // 100, 1, 255).astype(np.int32)
    qc = np.clip((_QC * scale + 50) // 100, 1, 255).astype(np.int32)
    return ql, qc


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple]:
    """symbol → (code, length) per T.81 C.2 canonical assignment."""
    out, code = {}, 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[values[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


_LUT_CACHE: dict = {}


def _decode_lut(bits: tuple, values: tuple):
    """16-bit-prefix lookup: peek16 → (symbol, code_length). Cached on
    the table spec so repeated images reuse it."""
    key = (bits, values)
    lut = _LUT_CACHE.get(key)
    if lut is not None:
        return lut
    sym = np.zeros(1 << 16, dtype=np.int32) - 1
    ln_arr = np.zeros(1 << 16, dtype=np.int32)
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            start = code << (16 - ln)
            end = (code + 1) << (16 - ln)
            sym[start:end] = values[k]
            ln_arr[start:end] = ln
            code += 1
            k += 1
        code <<= 1
    lut = (sym.tolist(), ln_arr.tolist())
    _LUT_CACHE[key] = lut
    return lut


# ---------------------------------------------------------------- encoder


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int):
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.buf.append(((self.acc << pad) | ((1 << pad) - 1)) & 0xFF)
            self.acc, self.nbits = 0, 0
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, value-bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y, cb, cr) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(H, W) → (n_blocks, 8, 8) raster order; H, W multiples of 8."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8))


def _pad_edge(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    ph = (mh - h % mh) % mh
    pw = (mw - w % mw) % mw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _encode_blocks(blocks: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Batch forward DCT + quantization → (n, 64) zigzag int32."""
    f = np.einsum("ux,nxy,vy->nuv", _C, blocks - 128.0, _C)
    coef = np.round(f / q).astype(np.int32)
    return coef.reshape(-1, 64)[:, _ZZ]  # raster → zigzag


def _entropy_block(w: _BitWriter, zz: np.ndarray, dc_pred: int,
                   dc_codes: dict, ac_codes: dict) -> int:
    diff = int(zz[0]) - dc_pred
    s, vb = _magnitude(diff)
    code, ln = dc_codes[s]
    w.write(code, ln)
    w.write(vb, s)
    nz = np.nonzero(zz[1:])[0]
    last = 0
    for idx in nz:
        k = int(idx) + 1
        run = k - last - 1
        while run >= 16:
            code, ln = ac_codes[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        s, vb = _magnitude(int(zz[k]))
        code, ln = ac_codes[(run << 4) | s]
        w.write(code, ln)
        w.write(vb, s)
        last = k
    if last != 63:
        code, ln = ac_codes[0x00]  # EOB
        w.write(code, ln)
    return int(zz[0])


def _dht_segment(tc: int, th: int, spec) -> bytes:
    bits, values = spec
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
    return b"\xff\xc4" + (len(body) + 2).to_bytes(2, "big") + body


def _dqt_segment(tq: int, table: np.ndarray) -> bytes:
    body = bytes([tq]) + bytes(int(x) for x in table.reshape(64)[_ZZ])
    return b"\xff\xdb" + (len(body) + 2).to_bytes(2, "big") + body


def encode_jpeg(px: np.ndarray, quality: int = 90,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """Baseline JFIF encode of an (h, w, 3) uint8 RGB array.
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (predictors reset, bitstream re-aligned) — the resync feature
    real encoders use for error resilience / parallel decode."""
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    h, w = px.shape[:2]
    ql, qc = _quality_tables(quality)
    ycc = _rgb_to_ycbcr(px)
    y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]

    if subsampling == "420":
        hs = vs = 2
        ye = _pad_edge(y, 16, 16)
        # chroma: 2x2 mean downsample, then pad to block multiple
        cb2 = _pad_edge(cb, 2, 2)
        cr2 = _pad_edge(cr, 2, 2)
        cbs = cb2.reshape(cb2.shape[0] // 2, 2, cb2.shape[1] // 2, 2).mean(axis=(1, 3))
        crs = cr2.reshape(cr2.shape[0] // 2, 2, cr2.shape[1] // 2, 2).mean(axis=(1, 3))
        cbe = _pad_edge(cbs, 8, 8)
        cre = _pad_edge(crs, 8, 8)
    else:
        hs = vs = 1
        ye = _pad_edge(y, 8, 8)
        cbe = _pad_edge(cb, 8, 8)
        cre = _pad_edge(cr, 8, 8)

    yz = _encode_blocks(_blockify(ye), ql)
    cbz = _encode_blocks(_blockify(cbe), qc)
    crz = _encode_blocks(_blockify(cre), qc)

    dc_l, dc_c = _canonical_codes(*_DC_L), _canonical_codes(*_DC_C)
    ac_l, ac_c = _canonical_codes(*_AC_L), _canonical_codes(*_AC_C)

    bw = _BitWriter()
    preds = [0, 0, 0]
    y_bw = ye.shape[1] // 8  # luma blocks per row
    c_bw = cbe.shape[1] // 8
    mcu_rows = ye.shape[0] // (8 * vs)
    mcu_cols = ye.shape[1] // (8 * hs)
    entropy = bytearray()
    mcu_n = 0
    for mr in range(mcu_rows):
        for mc in range(mcu_cols):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                entropy += bw.flush().replace(b"\xff", b"\xff\x00")
                entropy += bytes([0xFF, 0xD0 + (mcu_n // restart_interval - 1) % 8])
                bw = _BitWriter()
                preds = [0, 0, 0]
            for by in range(vs):
                for bx in range(hs):
                    bi = (mr * vs + by) * y_bw + (mc * hs + bx)
                    preds[0] = _entropy_block(bw, yz[bi], preds[0], dc_l, ac_l)
            ci = mr * c_bw + mc
            preds[1] = _entropy_block(bw, cbz[ci], preds[1], dc_c, ac_c)
            preds[2] = _entropy_block(bw, crz[ci], preds[2], dc_c, ac_c)
            mcu_n += 1
    entropy += bw.flush().replace(b"\xff", b"\xff\x00")
    entropy = bytes(entropy)

    out = bytearray(b"\xff\xd8")  # SOI
    out += (b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00"
            + bytes([1, 1, 0]) + (1).to_bytes(2, "big")
            + (1).to_bytes(2, "big") + bytes([0, 0]))
    out += _dqt_segment(0, ql) + _dqt_segment(1, qc)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3])
    sof += bytes([1, (hs << 4) | vs, 0])
    sof += bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof
    out += _dht_segment(0, 0, _DC_L) + _dht_segment(1, 0, _AC_L)
    out += _dht_segment(0, 1, _DC_C) + _dht_segment(1, 1, _AC_C)
    if restart_interval:
        out += b"\xff\xdd" + (4).to_bytes(2, "big") \
            + restart_interval.to_bytes(2, "big")
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder


class _BitReader:
    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self, need: int):
        while self.nbits < need:
            b = self.data[self.pos] if self.pos < len(self.data) else 0
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def peek16(self) -> int:
        self._fill(16)
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int):
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: value bits → signed coefficient."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Decode a baseline sequential JFIF/JPEG to (h, w, 3) uint8 RGB
    (grayscale promoted to 3 channels). Raises ValueError on anything
    non-baseline (progressive, arithmetic, 12-bit)."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple, tuple] = {}
    comps = None  # list of (cid, hi, vi, tq)
    h = w = None
    restart_interval = 0
    scan = None

    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"marker sync lost at {pos}")
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len = int.from_bytes(buf[pos + 2:pos + 4], "big")
        seg = buf[pos + 4:pos + 2 + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables not baseline")
                tbl = np.frombuffer(seg[i + 1:i + 65], dtype=np.uint8).astype(np.int32)
                qtables[tq] = tbl[_ZZ_INV].reshape(8, 8)  # zigzag → raster
                i += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = tuple(seg[i + 1:i + 17])
                n = sum(bits)
                values = tuple(seg[i + 17:i + 17 + n])
                htables[(tc, th)] = (bits, values)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            if seg[0] != 8:
                raise ValueError("only 8-bit precision supported")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid = seg[6 + 3 * c]
                hv = seg[7 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, seg[8 + 3 * c]))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline SOF marker 0x{marker:02x}")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = [(seg[1 + 2 * i], seg[2 + 2 * i] >> 4, seg[2 + 2 * i] & 0xF)
                    for i in range(ns)]
            pos += 2 + seg_len
            break
        pos += 2 + seg_len
    if comps is None or scan is None:
        raise ValueError("missing SOF/SOS")

    # entropy-coded data: destuff, split at RST markers
    segments, cur = [], bytearray()
    i = pos
    while i < len(buf):
        b = buf[i]
        if b == 0xFF:
            nxt = buf[i + 1] if i + 1 < len(buf) else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # EOI or next marker
        cur.append(b)
        i += 1
    segments.append(bytes(cur))

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcu_cols = -(-w // mcu_w)
    mcu_rows = -(-h // mcu_h)

    luts = {}
    for (cid, td, ta) in scan:
        if (0, td) not in htables or (1, ta) not in htables:
            raise ValueError("missing Huffman table")
        luts[cid] = (_decode_lut(*htables[(0, td)]),
                     _decode_lut(*htables[(1, ta)]))

    # per-component coefficient planes (blocks in raster order)
    planes = {}
    for (cid, hi, vi, tq) in comps:
        planes[cid] = np.zeros(
            (mcu_rows * vi * 8, mcu_cols * hi * 8), dtype=np.float64)
    coef_blocks = {cid: [] for cid, *_ in comps}

    zz_buf = np.zeros(64, dtype=np.int32)
    n_mcu = mcu_rows * mcu_cols
    mcu_idx = 0
    seg_iter = iter(segments)
    reader = _BitReader(next(seg_iter))
    preds = {cid: 0 for cid, *_ in comps}
    per_mcu = [(cid, hi, vi, tq) for (cid, hi, vi, tq) in comps]

    while mcu_idx < n_mcu:
        if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
            try:
                reader = _BitReader(next(seg_iter))
            except StopIteration as ex:
                raise ValueError("truncated entropy data (missing RST)") from ex
            preds = {cid: 0 for cid, *_ in comps}
        for (cid, hi, vi, tq) in per_mcu:
            (dc_sym, dc_len), (ac_sym, ac_len) = luts[cid]
            for _ in range(hi * vi):
                zz_buf[:] = 0
                p16 = reader.peek16()
                s = dc_sym[p16]
                if s < 0:
                    raise ValueError("bad DC Huffman code")
                reader.skip(dc_len[p16])
                diff = _extend(reader.receive(s), s)
                preds[cid] += diff
                zz_buf[0] = preds[cid]
                k = 1
                while k < 64:
                    p16 = reader.peek16()
                    rs = ac_sym[p16]
                    if rs < 0:
                        raise ValueError("bad AC Huffman code")
                    reader.skip(ac_len[p16])
                    if rs == 0x00:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += rs >> 4
                    s = rs & 0xF
                    if k > 63:
                        raise ValueError("AC run past block end")
                    zz_buf[k] = _extend(reader.receive(s), s)
                    k += 1
                coef_blocks[cid].append(zz_buf[_ZZ_INV].reshape(8, 8).copy())
        mcu_idx += 1

    # batch dequantize + IDCT per component, then place blocks
    out_planes = {}
    for (cid, hi, vi, tq) in comps:
        blocks = np.stack(coef_blocks[cid])  # (n_mcu*hi*vi, 8, 8)
        deq = blocks * qtables[tq]
        rec = np.einsum("xu,nuv,yv->nxy", _C.T, deq, _C.T) + 128.0
        plane = planes[cid]
        bw_ = hi  # blocks per MCU row within component
        bi = 0
        for m in range(n_mcu):
            mr, mc = divmod(m, mcu_cols)
            for by in range(vi):
                for bx in range(hi):
                    y0 = (mr * vi + by) * 8
                    x0 = (mc * hi + bx) * 8
                    plane[y0:y0 + 8, x0:x0 + 8] = rec[bi]
                    bi += 1
        # upsample to full resolution and crop
        ry, rx = vmax // vi, hmax // hi
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_planes[cid] = plane[:h, :w]

    if len(comps) == 1:
        g = np.clip(out_planes[comps[0][0]].round(), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    cy, ccb, ccr = (out_planes[c[0]] for c in comps)
    return _ycbcr_to_rgb(cy, ccb, ccr)
