"""GIF codec — pure-stdlib encoder/decoder (GIF87a/89a).

Engine-new real-world format #8 for the image table: palette-indexed
LZW with variable code width (GIF flavor: LSB-first bit packing,
per-image minimum code size, CLEAR/EOI codes, 12-bit ceiling with
deferred clear), 4-pass interlacing, global AND local color tables,
Graphic Control Extension transparency, and multi-frame animation
compositing (disposal methods 0/1/2) — the paths a real web-crawl
corpus exercises.

The ENCODER quantizes to the classic 3-3-2 web-safe-style palette
(GIF's 256-color ceiling makes true-color GIFs impossible), so like
jpg/qz6 it is lossy-by-format; ``make_image_row`` computes phash on the
DECODED pixels, which keeps every downstream invariant exact. The
DECODER is complete for any baseline GIF, not just this encoder's
output — tests pin decoder-only paths (interlace, local palettes,
mid-stream CLEAR, the KwKwK code) with hand-assembled bitstreams the
encoder never emits.

Reference-semantics anchor: undecodable/truncated inputs raise
ValueError → the images operator quarantines them, the discipline of
``OsmJoin.java:176-179``.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_gif", "decode_gif", "decode_gif_frames"]

_MAX_CODE_WIDTH = 12


# ------------------------------------------------------------------ LZW

def _lzw_compress(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prefix = b""
    for b in indices:
        cand = prefix + bytes([b])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], width)
        if next_code < (1 << _MAX_CODE_WIDTH):
            table[cand] = next_code
            if next_code == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = bytes([b])
    if prefix:
        emit(table[prefix], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decompress(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0
    acc = nbits = 0

    def read(width: int) -> int:
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                raise ValueError("gif: LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        v = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return v

    out = bytearray()
    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None
    next_code = eoi + 1
    while True:
        code = read(width)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            next_code = eoi + 1
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if not table:
                raise ValueError("gif: code before CLEAR")
            if code >= len(table):
                raise ValueError("gif: bad first code")
            entry = table[code]
        elif code < next_code:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"gif: code {code} beyond table")
        out += entry
        if prev is not None and next_code < (1 << _MAX_CODE_WIDTH):
            table.append(prev + entry[:1])
            next_code += 1
            # width grows when the NEXT code to assign would overflow it
            if next_code == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        prev = entry


# ------------------------------------------------------------------ encode

def _palette332() -> np.ndarray:
    """256-entry 3-3-2 RGB palette (the deterministic quantization
    target; real GIF writers median-cut, which is not reproducible)."""
    idx = np.arange(256, dtype=np.uint32)
    r = (idx >> 5) & 0x7
    g = (idx >> 2) & 0x7
    b = idx & 0x3
    # expand by bit replication: 3 bits -> rrr|rrr|rr, 2 bits -> bb x4
    return np.stack(
        [(r << 5) | (r << 2) | (r >> 1),
         (g << 5) | (g << 2) | (g >> 1),
         (b << 6) | (b << 4) | (b << 2) | b],
        axis=1,
    ).astype(np.uint8)


def _quantize332(px: np.ndarray) -> np.ndarray:
    p = px.astype(np.uint16)
    return (
        ((p[..., 0] >> 5) << 5) | ((p[..., 1] >> 5) << 2) | (p[..., 2] >> 6)
    ).astype(np.uint8)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> list[int]:
    rows: list[int] = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, h, step))
    return rows


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(px: np.ndarray, interlace: bool = False) -> bytes:
    """GIF89a, single frame, global 3-3-2 palette, LZW min code size 8."""
    h, w = px.shape[:2]
    out = bytearray(b"GIF89a")
    # logical screen descriptor: GCT flag, 8 bits color res, size 256
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x70 | 0x07, 0, 0)
    out += _palette332().tobytes()
    idx = _quantize332(px)
    if interlace:
        idx = idx[_interlace_order(h), :]
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h,
                       0x40 if interlace else 0x00)
    out.append(8)  # LZW minimum code size
    out += _sub_blocks(_lzw_compress(idx.tobytes(), 8))
    out.append(0x3B)  # trailer
    return bytes(out)


# ------------------------------------------------------------------ decode

class _R:
    def __init__(self, buf: bytes):
        self.b, self.p = buf, 0

    def take(self, n: int) -> bytes:
        if self.p + n > len(self.b):
            raise ValueError("gif: truncated")
        out = self.b[self.p:self.p + n]
        self.p += n
        return out

    def u8(self) -> int:
        return self.take(1)[0]

    def u16(self) -> int:
        return struct.unpack("<H", self.take(2))[0]

    def sub_blocks(self) -> bytes:
        out = bytearray()
        while True:
            n = self.u8()
            if n == 0:
                return bytes(out)
            out += self.take(n)


def _read_palette(r: _R, flags: int) -> np.ndarray | None:
    if not flags & 0x80:
        return None
    size = 2 << (flags & 0x7)
    return np.frombuffer(r.take(3 * size), dtype=np.uint8).reshape(size, 3)


def decode_gif_frames(buf: bytes) -> list[np.ndarray]:
    """All frames, composited per the disposal rules: 0/1 leave the
    canvas, 2 restores background (transparent background → previous
    content is cleared to the background color). Returns RGB uint8
    arrays of the logical screen size."""
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad signature")
    r = _R(buf)
    r.take(6)
    sw, sh = r.u16(), r.u16()
    flags = r.u8()
    bg_idx = r.u8()
    r.u8()  # aspect
    gct = _read_palette(r, flags)
    canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
    if gct is not None and bg_idx < len(gct):
        canvas[:] = gct[bg_idx]
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    while True:
        block = r.u8()
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = r.u8()
            data = r.sub_blocks()
            if label == 0xF9 and len(data) >= 4:  # graphic control
                gflags = data[0]
                disposal = (gflags >> 2) & 0x7
                transparent = data[3] if gflags & 0x1 else None
            continue
        if block != 0x2C:
            raise ValueError(f"gif: unknown block 0x{block:02x}")
        fx, fy, fw, fh = r.u16(), r.u16(), r.u16(), r.u16()
        iflags = r.u8()
        lct = _read_palette(r, iflags)
        pal = lct if lct is not None else gct
        if pal is None:
            raise ValueError("gif: no color table")
        mcs = r.u8()
        if not 2 <= mcs <= 11:
            raise ValueError(f"gif: bad LZW min code size {mcs}")
        idx = np.frombuffer(
            _lzw_decompress(r.sub_blocks(), mcs), dtype=np.uint8)
        if len(idx) < fw * fh:
            raise ValueError("gif: pixel data short")
        idx = idx[: fw * fh].reshape(fh, fw)
        if iflags & 0x40:  # interlaced: invert the 4-pass row order
            de = np.empty_like(idx)
            de[_interlace_order(fh), :] = idx
            idx = de
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("gif: palette index out of range")
        if fx + fw > sw or fy + fh > sh:
            raise ValueError("gif: frame exceeds logical screen")
        prev = canvas.copy()
        region = pal[idx]
        if transparent is not None:
            mask = idx != transparent
            target = canvas[fy:fy + fh, fx:fx + fw]
            canvas[fy:fy + fh, fx:fx + fw] = np.where(
                mask[..., None], region, target)
        else:
            canvas[fy:fy + fh, fx:fx + fw] = region
        frames.append(canvas.copy())
        if disposal == 2:  # restore to background
            bg = gct[bg_idx] if gct is not None and bg_idx < len(gct) else 0
            canvas[fy:fy + fh, fx:fx + fw] = bg
        elif disposal == 3:  # restore to previous
            canvas = prev
        disposal = 0
        transparent = None
    if not frames:
        raise ValueError("gif: no image data")
    return frames


def decode_gif(buf: bytes) -> np.ndarray:
    """First frame as RGB uint8 (the still-image contract every other
    decoder in ``synth/images.DECODERS`` follows)."""
    return decode_gif_frames(buf)[0]
