"""MJPEG-in-MP4 (ISO base media file format) — minimal writer/reader,
pure stdlib.

Round-3 continuation of the real-container program (AVI landed first):
frames are full baseline-JFIF streams (synth/jpeg.py) inside a standard
ISO-BMFF layout (``ftyp`` + ``mdat`` + ``moov/trak/mdia/minf/stbl``)
with a ``jpeg`` VisualSampleEntry — the Photo-JPEG track layout ffmpeg
emits for ``-c:v mjpeg`` in .mp4, so stock players read what we write.

The reader walks the public box grammar (never trusts our writer's
byte layout): it locates the first ``vide`` track, reads the sample
tables (stsd/stts/stsc/stsz/stco|co64), and resolves per-sample
absolute offsets through the general stsc chunk-run mapping. Frame
access is O(1) after one table parse and decodes ONLY the requested
sample — the decode-only-what-you-sample shape ``sample_frames`` needs
at scale. Tracks whose sample entry is a codec we cannot decode (e.g.
``avc1``) raise NotImplementedError → upstream quarantine row, the same
honest dispatch policy as images/audio.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg


def _box(typ: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + typ + body


def _full(typ: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(typ, struct.pack(">I", (version << 24) | flags) + body)


_MATRIX = struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
                      0x40000000)


def encode_mp4_mjpeg(frames: list[np.ndarray], fps: int = 10,
                     quality: int = 90) -> bytes:
    """ftyp + mdat + moov with one 'vide' track of 'jpeg' samples.
    mdat precedes moov so chunk offsets are known in one pass (each
    sample is its own chunk; stsc is a single (1,1,1) run)."""
    if not frames:
        raise ValueError("mp4 needs >= 1 frame")
    h, w, _ = frames[0].shape
    for f in frames:
        if f.shape != (h, w, 3):
            raise ValueError("all frames must share one shape")
    jpegs = [encode_jpeg(f, quality=quality, subsampling="444")
             for f in frames]
    n = len(jpegs)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isom" + b"mp41")
    mdat = _box(b"mdat", b"".join(jpegs))
    offsets = []
    pos = len(ftyp) + 8
    for j in jpegs:
        offsets.append(pos)
        pos += len(j)

    ts, dur = fps, n  # one tick per frame

    mvhd = _full(b"mvhd", 0, 0, struct.pack(
        ">IIII", 0, 0, ts, dur) + struct.pack(">iHH", 0x00010000, 0x0100, 0)
        + struct.pack(">II", 0, 0) + _MATRIX + struct.pack(">6I", *([0] * 6))
        + struct.pack(">I", 2))
    tkhd = _full(b"tkhd", 0, 7, struct.pack(
        ">IIIII", 0, 0, 1, 0, dur) + struct.pack(">II", 0, 0)
        + struct.pack(">hhhh", 0, 0, 0, 0) + _MATRIX
        + struct.pack(">II", w << 16, h << 16))
    mdhd = _full(b"mdhd", 0, 0,
                 struct.pack(">IIII", 0, 0, ts, dur)
                 + struct.pack(">HH", 0x55C4, 0))  # language 'und'
    hdlr = _full(b"hdlr", 0, 0,
                 struct.pack(">I", 0) + b"vide" + struct.pack(">3I", 0, 0, 0)
                 + b"VideoHandler\x00")

    entry = (b"\x00" * 6 + struct.pack(">H", 1)            # data_ref_index
             + struct.pack(">HH", 0, 0) + struct.pack(">3I", 0, 0, 0)
             + struct.pack(">HH", w, h)
             + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
             + struct.pack(">I", 0) + struct.pack(">H", 1)  # frame_count
             + b"\x0bPhoto JPEG" + b"\x00" * 21             # compressorname
             + struct.pack(">Hh", 24, -1))
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + _box(b"jpeg", entry))
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 1, 1))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n)
                 + b"".join(struct.pack(">I", len(j)) for j in jpegs))
    stco = _full(b"stco", 0, 0, struct.pack(">I", n)
                 + b"".join(struct.pack(">I", o) for o in offsets))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)

    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    minf = _box(b"minf",
                _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
                + _box(b"dinf", dref) + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


# ------------------------------------------------------------------ reader


def _walk(buf: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", buf, pos)[0]
        typ = buf[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            size = struct.unpack_from(">Q", buf, pos + 8)[0]
            body = pos + 16
        elif size == 0:  # to end of enclosing box
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError(f"malformed box '{typ!r}' at {pos}")
        yield typ, body, pos + size
        pos += size


def _find(buf: bytes, start: int, end: int, typ: bytes):
    for t, body, bend in _walk(buf, start, end):
        if t == typ:
            return body, bend
    return None


def _video_stbl(buf: bytes):
    """→ (stbl_span, mdhd_timescale) for the first 'vide' track."""
    moov = _find(buf, 0, len(buf), b"moov")
    if moov is None:
        raise ValueError("mp4 missing moov")
    for t, body, bend in _walk(buf, *moov):
        if t != b"trak":
            continue
        mdia = _find(buf, body, bend, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(buf, *mdia, b"hdlr")
        if hdlr is None or buf[hdlr[0] + 8:hdlr[0] + 12] != b"vide":
            continue
        mdhd = _find(buf, *mdia, b"mdhd")
        version = buf[mdhd[0]]
        ts = struct.unpack_from(">I", buf, mdhd[0] + (20 if version else 12))[0]
        minf = _find(buf, *mdia, b"minf")
        stbl = _find(buf, *minf, b"stbl")
        if stbl is None:
            raise ValueError("video trak missing stbl")
        return stbl, ts
    raise ValueError("mp4 has no video track")


def mp4_header(buf: bytes) -> tuple[int, int, int, int]:
    """→ (n_frames, w, h, fps). Rejects non-JPEG sample entries with
    NotImplementedError (→ quarantine upstream)."""
    if _find(buf, 0, len(buf), b"ftyp") is None:
        raise ValueError("not an ISO-BMFF file (no ftyp)")
    stbl, ts = _video_stbl(buf)
    stsd = _find(buf, *stbl, b"stsd")
    fourcc = buf[stsd[0] + 12:stsd[0] + 16]
    if fourcc != b"jpeg":
        raise NotImplementedError(
            f"mp4 codec '{fourcc.decode('latin1')}' not decodable here "
            "(only Photo-JPEG 'jpeg' tracks)")
    entry = stsd[0] + 8  # past count + entry size/typ: entry body at +8+8
    w, h = struct.unpack_from(">HH", buf, entry + 8 + 24)
    stts = _find(buf, *stbl, b"stts")
    n_entries = struct.unpack_from(">I", buf, stts[0] + 4)[0]
    n = 0
    delta0 = 1
    for e in range(n_entries):
        cnt, delta = struct.unpack_from(">II", buf, stts[0] + 8 + 8 * e)
        if e == 0:
            delta0 = delta or 1
        n += cnt
    return n, w, h, max(1, ts // delta0)


def mp4_frame_index(buf: bytes) -> list[tuple[int, int]]:
    """[(abs_offset, size)] per sample, resolved through the general
    stsc chunk-run mapping over stco/co64."""
    stbl, _ = _video_stbl(buf)
    stsz = _find(buf, *stbl, b"stsz")
    fixed, n = struct.unpack_from(">II", buf, stsz[0] + 4)
    sizes = ([fixed] * n if fixed else
             list(struct.unpack_from(f">{n}I", buf, stsz[0] + 12)))
    co = _find(buf, *stbl, b"stco")
    if co is not None:
        cn = struct.unpack_from(">I", buf, co[0] + 4)[0]
        chunk_offs = list(struct.unpack_from(f">{cn}I", buf, co[0] + 8))
    else:
        co = _find(buf, *stbl, b"co64")
        cn = struct.unpack_from(">I", buf, co[0] + 4)[0]
        chunk_offs = list(struct.unpack_from(f">{cn}Q", buf, co[0] + 8))
    stsc = _find(buf, *stbl, b"stsc")
    rn = struct.unpack_from(">I", buf, stsc[0] + 4)[0]
    runs = [struct.unpack_from(">III", buf, stsc[0] + 8 + 12 * e)
            for e in range(rn)]  # (first_chunk, samples_per_chunk, desc)

    out: list[tuple[int, int]] = []
    s = 0
    for r, (first, per_chunk, _) in enumerate(runs):
        last = runs[r + 1][0] - 1 if r + 1 < rn else len(chunk_offs)
        for c in range(first - 1, last):
            pos = chunk_offs[c]
            for _k in range(per_chunk):
                if s >= n:
                    break
                out.append((pos, sizes[s]))
                pos += sizes[s]
                s += 1
    if s != n:
        raise ValueError(f"stsc maps {s} samples, stsz says {n}")
    return out


def mp4_frame(buf: bytes, k: int,
              index: list[tuple[int, int]] | None = None) -> np.ndarray:
    """Decode ONLY sample k (O(1) beyond the one table parse)."""
    idx = index if index is not None else mp4_frame_index(buf)
    if not 0 <= k < len(idx):
        raise IndexError(f"frame {k} out of range 0..{len(idx) - 1}")
    off, sz = idx[k]
    return decode_jpeg(buf[off:off + sz])
