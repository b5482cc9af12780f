"""Baseline TIFF 6.0 image codec — pure-stdlib encoder/decoder.

Engine-new real-world format #9 for the image table, and the image-data
complement of ``synth/exif.py`` (which already speaks the TIFF IFD
grammar for metadata): header in either byte order (II/MM), IFD0 walk
with inline vs out-of-line values, strip-organized pixel data
(RowsPerStrip/StripOffsets/StripByteCounts), Compression 1 (none),
32773 (PackBits) and 5 (TIFF-flavor LZW — MSB-first bit packing and
the spec's "early change" width bump at 2^w−1, both DIFFERENT from the
GIF LZW in ``synth/gif.py``), horizontal-differencing Predictor 2, and
PhotometricInterpretation 1 (grayscale) / 2 (RGB).

The encoder round-robins compression none/PackBits/LZW(+predictor) and
byte order deterministically from the pixel content, so every catalog
run exercises every path; all modes are lossless (re-encode PSNR = ∞).
The decoder is more general than the encoder (grayscale, MM-order
strips, multi-strip LZW, predictor off) — hand-assembled vectors in
tests/test_tiff.py pin the paths the encoder never emits.

Undecodable/truncated/unsupported inputs raise ValueError → quarantine
(the ``OsmJoin.java:176-179`` problem-sink discipline).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["encode_tiff", "decode_tiff"]

_TAG_WIDTH = 256
_TAG_LENGTH = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR = 284
_TAG_PREDICTOR = 317

_T_SHORT, _T_LONG = 3, 4
_CLEAR, _EOI = 256, 257


# ------------------------------------------------------------- TIFF LZW

def _lzw_compress(data: bytes) -> bytes:
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table = {bytes([i]): i for i in range(256)}
    next_code = _EOI + 1
    width = 9
    emit(_CLEAR, width)
    prefix = b""
    for b in data:
        cand = prefix + bytes([b])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], width)
        if next_code < 4094:
            table[cand] = next_code
            # early change: width bumps one code sooner than GIF
            if next_code == (1 << width) - 1 and width < 12:
                width += 1
            next_code += 1
        else:
            emit(_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = _EOI + 1
            width = 9
        prefix = bytes([b])
    if prefix:
        emit(table[prefix], width)
    emit(_EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _lzw_decompress(data: bytes, expected: int) -> bytes:
    pos = acc = nbits = 0

    def read(width: int) -> int:
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                raise ValueError("tiff: LZW stream truncated")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        v = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        return v

    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None
    next_code = _EOI + 1
    while len(out) < expected:
        code = read(width)
        if code == _CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            next_code = _EOI + 1
            width = 9
            prev = None
            continue
        if code == _EOI:
            break
        if prev is None:
            if not table or code >= 256:
                raise ValueError("tiff: bad first LZW code")
            entry = table[code]
        elif code < next_code:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"tiff: LZW code {code} beyond table")
        out += entry
        if prev is not None and next_code < 4096:
            table.append(prev + entry[:1])
            next_code += 1
            # early change: the decoder's table lags the encoder's by
            # one entry, so the bump fires when the NEXT code to assign
            # is 2^w - 1 (post-increment check — the spec's "when you
            # add code 511, switch to 10 bits")
            if next_code == (1 << width) - 1 and width < 12:
                width += 1
        prev = entry
    if len(out) < expected:
        raise ValueError("tiff: LZW data short")
    return bytes(out[:expected])


# ------------------------------------------------------------- PackBits

def _packbits_compress(row: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)  # -(run-1) as unsigned
            out.append(row[i])
            i += run
            continue
        lit = i
        while (
            i < n
            and i - lit < 128
            and not (i + 1 < n and row[i + 1] == row[i])
        ):
            i += 1
        out.append(i - lit - 1)
        out += row[lit:i]
    return bytes(out)


def _packbits_decompress(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < expected:
        if i >= len(data):
            raise ValueError("tiff: PackBits data short")
        n = data[i]
        i += 1
        if n < 128:  # literal n+1 bytes
            if i + n + 1 > len(data):
                raise ValueError("tiff: PackBits literal truncated")
            out += data[i:i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            if i >= len(data):
                raise ValueError("tiff: PackBits run truncated")
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: noop per spec
    return bytes(out[:expected])


# ------------------------------------------------------------- encoder

def _predict(rows: np.ndarray, spp: int) -> np.ndarray:
    d = rows.reshape(rows.shape[0], -1, spp).astype(np.int16)
    d[:, 1:, :] -= d[:, :-1, :].copy()
    return (d & 0xFF).astype(np.uint8).reshape(rows.shape)


def _unpredict(rows: np.ndarray, spp: int) -> np.ndarray:
    d = rows.reshape(rows.shape[0], -1, spp).astype(np.uint16)
    return (np.cumsum(d, axis=1, dtype=np.uint64) & 0xFF).astype(
        np.uint8).reshape(rows.shape)


def encode_tiff(px: np.ndarray, compression: int | None = None,
                byte_order: str | None = None,
                rows_per_strip: int = 8) -> bytes:
    """8-bit RGB baseline TIFF. ``compression``/``byte_order`` default
    to a deterministic content-keyed rotation over {1, 32773, 5+pred}
    × {II, MM} so a corpus exercises every decode path."""
    h, w = px.shape[:2]
    body = px.reshape(h, w * 3)
    key = zlib.crc32(body.tobytes())
    if compression is None:
        compression = (1, 32773, 5)[key % 3]
    if byte_order is None:
        byte_order = ("II", "MM")[(key >> 8) & 1]
    e = "<" if byte_order == "II" else ">"
    predictor = 2 if compression == 5 else 1

    strips = []
    for y0 in range(0, h, rows_per_strip):
        rows = body[y0:y0 + rows_per_strip]
        if predictor == 2:
            rows = _predict(rows, 3)
        raw = rows.tobytes()
        if compression == 1:
            strips.append(raw)
        elif compression == 32773:
            strips.append(b"".join(
                _packbits_compress(r.tobytes()) for r in rows))
        elif compression == 5:
            strips.append(_lzw_compress(raw))
        else:
            raise ValueError(f"unsupported compression {compression}")

    header = struct.pack(e + "2sH", byte_order.encode(), 42)
    # layout: header(8) | strip data | BitsPerSample data | IFD
    data_off = 8
    offsets = []
    for s in strips:
        offsets.append(data_off)
        data_off += len(s)
    bits_off = data_off
    data_off += 6  # SHORT x3
    n_strips = len(strips)
    need_off_arrays = n_strips > 1
    strip_off_pos = strip_cnt_pos = 0
    if need_off_arrays:
        strip_off_pos = data_off
        data_off += 4 * n_strips
        strip_cnt_pos = data_off
        data_off += 4 * n_strips
    ifd_off = data_off

    def entry(tag: int, ttype: int, count: int, value: int) -> bytes:
        if ttype == _T_SHORT and count == 1:
            # left-justified in the 4-byte value slot (TIFF 6.0 §2)
            packed = struct.pack(e + "H", value) + b"\x00\x00"
        else:
            packed = struct.pack(e + "I", value)
        return struct.pack(e + "HHI", tag, ttype, count) + packed

    entries = [
        entry(_TAG_WIDTH, _T_LONG, 1, w),
        entry(_TAG_LENGTH, _T_LONG, 1, h),
        entry(_TAG_BITS, _T_SHORT, 3, bits_off),
        entry(_TAG_COMPRESSION, _T_SHORT, 1, compression),
        entry(_TAG_PHOTOMETRIC, _T_SHORT, 1, 2),
        entry(_TAG_STRIP_OFFSETS, _T_LONG, n_strips,
              strip_off_pos if need_off_arrays else offsets[0]),
        entry(_TAG_SPP, _T_SHORT, 1, 3),
        entry(_TAG_ROWS_PER_STRIP, _T_LONG, 1, rows_per_strip),
        entry(_TAG_STRIP_COUNTS, _T_LONG, n_strips,
              strip_cnt_pos if need_off_arrays else len(strips[0])),
        entry(_TAG_PLANAR, _T_SHORT, 1, 1),
    ]
    if predictor == 2:
        entries.append(entry(_TAG_PREDICTOR, _T_SHORT, 1, 2))

    out = bytearray(header + struct.pack(e + "I", ifd_off))
    for s in strips:
        out += s
    out += struct.pack(e + "HHH", 8, 8, 8)
    if need_off_arrays:
        out += struct.pack(e + f"{n_strips}I", *offsets)
        out += struct.pack(e + f"{n_strips}I", *(len(s) for s in strips))
    out += struct.pack(e + "H", len(entries))
    out += b"".join(entries)
    out += struct.pack(e + "I", 0)  # next-IFD pointer
    return bytes(out)


# ------------------------------------------------------------- decoder

def _read_values(buf: bytes, e: str, ttype: int, count: int,
                 raw: bytes) -> list[int]:
    size = 2 if ttype == _T_SHORT else 4
    fmt = "H" if ttype == _T_SHORT else "I"
    total = size * count
    if total <= 4:
        src = raw[:total]
    else:
        off = struct.unpack(e + "I", raw)[0]
        if off + total > len(buf):
            raise ValueError("tiff: value pointer out of range")
        src = buf[off:off + total]
    return list(struct.unpack(e + f"{count}{fmt}", src))


def decode_tiff(buf: bytes) -> np.ndarray:
    if len(buf) < 8:
        raise ValueError("tiff: truncated header")
    if buf[:2] == b"II":
        e = "<"
    elif buf[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("tiff: bad byte-order mark")
    magic, ifd_off = struct.unpack(e + "HI", buf[2:8])
    if magic != 42:
        raise ValueError(f"tiff: bad magic {magic}")
    if ifd_off + 2 > len(buf):
        raise ValueError("tiff: IFD offset out of range")
    (n_entries,) = struct.unpack(e + "H", buf[ifd_off:ifd_off + 2])
    tags: dict[int, list[int]] = {}
    pos = ifd_off + 2
    for _ in range(n_entries):
        if pos + 12 > len(buf):
            raise ValueError("tiff: IFD truncated")
        tag, ttype, count = struct.unpack(e + "HHI", buf[pos:pos + 8])
        raw = buf[pos + 8:pos + 12]
        pos += 12
        if ttype in (_T_SHORT, _T_LONG):
            tags[tag] = _read_values(buf, e, ttype, count, raw)

    def one(tag: int, default: int | None = None) -> int:
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"tiff: missing required tag {tag}")
            return default
        return v[0]

    w, h = one(_TAG_WIDTH), one(_TAG_LENGTH)
    comp = one(_TAG_COMPRESSION, 1)
    photo = one(_TAG_PHOTOMETRIC)
    spp = one(_TAG_SPP, 1)
    rps = one(_TAG_ROWS_PER_STRIP, h)
    predictor = one(_TAG_PREDICTOR, 1)
    planar = one(_TAG_PLANAR, 1)
    bits = tags.get(_TAG_BITS, [8])
    if photo not in (1, 2):
        raise ValueError(f"tiff: unsupported photometric {photo}")
    if (photo == 2 and spp != 3) or (photo == 1 and spp != 1):
        raise ValueError(f"tiff: photometric {photo} with {spp} samples")
    if any(b != 8 for b in bits) or planar != 1:
        raise ValueError("tiff: only 8-bit chunky supported")
    if predictor not in (1, 2):
        raise ValueError(f"tiff: unsupported predictor {predictor}")
    offsets = tags.get(_TAG_STRIP_OFFSETS)
    counts = tags.get(_TAG_STRIP_COUNTS)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("tiff: bad strip tables")

    row_bytes = w * spp
    rows_out: list[np.ndarray] = []
    for i, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(buf):
            raise ValueError("tiff: strip out of range")
        n_rows = min(rps, h - i * rps)
        if n_rows <= 0:
            raise ValueError("tiff: more strips than rows")
        raw = buf[off:off + cnt]
        expected = n_rows * row_bytes
        if comp == 1:
            if len(raw) < expected:
                raise ValueError("tiff: uncompressed strip short")
            flat = raw[:expected]
        elif comp == 32773:
            flat = _packbits_decompress(raw, expected)
        elif comp == 5:
            flat = _lzw_decompress(raw, expected)
        else:
            raise ValueError(f"tiff: unsupported compression {comp}")
        rows = np.frombuffer(flat, dtype=np.uint8).reshape(
            n_rows, row_bytes)
        if predictor == 2:
            rows = _unpredict(rows, spp)
        rows_out.append(rows)
    img = np.concatenate(rows_out, axis=0)
    if img.shape[0] != h:
        raise ValueError("tiff: row count mismatch")
    if photo == 1:
        g = img.reshape(h, w)
        return np.repeat(g[:, :, None], 3, axis=2).copy()
    return img.reshape(h, w, 3).copy()
