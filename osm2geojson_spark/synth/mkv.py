"""MJPEG-in-Matroska (EBML) — minimal writer/reader, pure stdlib.

Matroska's ``V_MJPEG`` codec id carries plain JFIF frames, so pairing
the EBML container grammar with the baseline JPEG codec (synth/jpeg.py)
gives a real .mkv any stock player can read. WebM is the same EBML
grammar with DocType "webm" and a restricted codec set (VP8/VP9/AV1):
the reader parses those containers fully and then raises
NotImplementedError on the codec id — container handling is real, the
undecodable-codec row quarantines honestly (same dispatch policy as
avc1-in-mp4 / heif images).

Reader design: one structural walk over Segment children builds the
frame index (element sizes let the walk SKIP payload bytes, so the scan
is O(#elements), not O(bytes)); each sampled frame then decodes O(1)
via its (offset, size) — the decode-only-what-you-sample shape.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg

# EBML element ids (public Matroska registry), raw bytes incl. marker
_EBML = b"\x1aE\xdf\xa3"
_DOCTYPE = b"\x42\x82"
_SEGMENT = b"\x18\x53\x80\x67"
_INFO = b"\x15\x49\xa9\x66"
_TS_SCALE = b"\x2a\xd7\xb1"
_DURATION = b"\x44\x89"
_MUXAPP = b"\x4d\x80"
_WRITAPP = b"\x57\x41"
_TRACKS = b"\x16\x54\xae\x6b"
_TRACKENTRY = b"\xae"
_TRACKNUM = b"\xd7"
_TRACKUID = b"\x73\xc5"
_TRACKTYPE = b"\x83"
_FLAGLACING = b"\x9c"
_CODECID = b"\x86"
_DEFAULTDUR = b"\x23\xe3\x83"
_VIDEO = b"\xe0"
_PIXW = b"\xb0"
_PIXH = b"\xba"
_CLUSTER = b"\x1f\x43\xb6\x75"
_TIMESTAMP = b"\xe7"
_SIMPLEBLOCK = b"\xa3"
_CUES = b"\x1c\x53\xbb\x6b"
_CUEPOINT = b"\xbb"
_CUETIME = b"\xb3"
_CUETRACKPOS = b"\xb7"
_CUETRACK = b"\xf7"
_CUECLUSTERPOS = b"\xf1"


def _vint(v: int) -> bytes:
    """EBML size encoding: marker bit in the first byte gives length."""
    for n in range(1, 9):
        if v < (1 << (7 * n)) - 1:
            return ((1 << (7 * n)) | v).to_bytes(n, "big")
    raise ValueError("vint overflow")


def _elem(eid: bytes, body: bytes) -> bytes:
    return eid + _vint(len(body)) + body


def _uint(eid: bytes, v: int) -> bytes:
    n = max(1, (v.bit_length() + 7) // 8)
    return _elem(eid, v.to_bytes(n, "big"))


def _f64(eid: bytes, v: float) -> bytes:
    return _elem(eid, struct.pack(">d", v))


def encode_mkv_mjpeg(frames: list[np.ndarray], fps: int = 10,
                     quality: int = 90, doctype: str = "matroska",
                     codec_id: str = "V_MJPEG") -> bytes:
    """One V_MJPEG video track, one Cluster+SimpleBlock per frame
    (every frame a keyframe), Cues pointing at each cluster. doctype/
    codec_id are overridable so tests can fabricate a *structurally
    valid* webm whose codec we honestly refuse to decode."""
    if not frames:
        raise ValueError("mkv needs >= 1 frame")
    h, w, _ = frames[0].shape
    for f in frames:
        if f.shape != (h, w, 3):
            raise ValueError("all frames must share one shape")
    payloads = [encode_jpeg(f, quality=quality, subsampling="444")
                for f in frames]

    header = _elem(_EBML,
                   _uint(b"\x42\x86", 1) + _uint(b"\x42\xf7", 1)
                   + _uint(b"\x42\xf2", 4) + _uint(b"\x42\xf3", 8)
                   + _elem(_DOCTYPE, doctype.encode())
                   + _uint(b"\x42\x87", 2) + _uint(b"\x42\x85", 2))

    ms_per_frame = 1000.0 / fps
    info = _elem(_INFO,
                 _uint(_TS_SCALE, 1_000_000)
                 + _elem(_MUXAPP, b"osm2geojson_spark")
                 + _elem(_WRITAPP, b"osm2geojson_spark")
                 + _f64(_DURATION, ms_per_frame * len(frames)))
    track = _elem(_TRACKENTRY,
                  _uint(_TRACKNUM, 1) + _uint(_TRACKUID, 1)
                  + _uint(_TRACKTYPE, 1) + _uint(_FLAGLACING, 0)
                  + _elem(_CODECID, codec_id.encode())
                  + _uint(_DEFAULTDUR, round(1e9 / fps))
                  + _elem(_VIDEO, _uint(_PIXW, w) + _uint(_PIXH, h)))
    tracks = _elem(_TRACKS, track)

    body = info + tracks
    clusters = []
    cluster_pos = []  # offset of each cluster from segment payload start
    pos = len(body)
    for k, pl in enumerate(payloads):
        ts = round(k * ms_per_frame)
        block = _elem(_SIMPLEBLOCK,
                      b"\x81" + struct.pack(">h", 0) + b"\x80" + pl)
        cl = _elem(_CLUSTER, _uint(_TIMESTAMP, ts) + block)
        cluster_pos.append((ts, pos))
        clusters.append(cl)
        pos += len(cl)
    body += b"".join(clusters)

    cues = _elem(_CUES, b"".join(
        _elem(_CUEPOINT,
              _uint(_CUETIME, ts)
              + _elem(_CUETRACKPOS,
                      _uint(_CUETRACK, 1) + _uint(_CUECLUSTERPOS, off)))
        for ts, off in cluster_pos))
    return header + _elem(_SEGMENT, body + cues)


# ------------------------------------------------------------------ reader


def _read_vint(buf: bytes, pos: int, strip_marker: bool = True):
    """→ (value, next_pos). The id form keeps the marker bits."""
    first = buf[pos]
    n = 1
    mask = 0x80
    while n <= 8 and not first & mask:
        mask >>= 1
        n += 1
    if n > 8:
        raise ValueError(f"bad EBML vint at {pos}")
    v = int.from_bytes(buf[pos:pos + n], "big")
    if strip_marker:
        v &= (1 << (7 * n)) - 1
    return v, pos + n


def _walk(buf: bytes, start: int, end: int):
    """Yield (id_bytes, body_start, body_end) for each child element."""
    pos = start
    while pos < end:
        first = buf[pos]
        n = 1
        mask = 0x80
        while n <= 4 and not first & mask:
            mask >>= 1
            n += 1
        eid = buf[pos:pos + n]
        size, body = _read_vint(buf, pos + n)
        if body + size > end:
            raise ValueError(f"EBML element {eid.hex()} overruns parent")
        yield eid, body, body + size
        pos = body + size


def _child(buf: bytes, span, eid: bytes):
    for t, b, e in _walk(buf, *span):
        if t == eid:
            return b, e
    return None


def _uint_at(buf: bytes, span) -> int:
    return int.from_bytes(buf[span[0]:span[1]], "big")


def mkv_header(buf: bytes) -> tuple[int, int, int, int, str]:
    """→ (n_frames, w, h, fps, codec_id). n is derived from Duration ×
    DefaultDuration; raises NotImplementedError for codecs we cannot
    decode (V_VP8/V_VP9/… — i.e. every real webm)."""
    hd = _child(buf, (0, len(buf)), _EBML)
    if hd is None:
        raise ValueError("not an EBML file")
    doctype = b"matroska"
    dt = _child(buf, hd, _DOCTYPE)
    if dt is not None:
        doctype = buf[dt[0]:dt[1]]
    if doctype not in (b"matroska", b"webm"):
        raise ValueError(f"unknown EBML doctype {doctype!r}")
    seg = _child(buf, (0, len(buf)), _SEGMENT)
    if seg is None:
        raise ValueError("mkv missing Segment")
    info = _child(buf, seg, _INFO)
    tracks = _child(buf, seg, _TRACKS)
    if info is None or tracks is None:
        raise ValueError("mkv missing Info/Tracks")
    dur_ms = None
    d = _child(buf, info, _DURATION)
    if d is not None:
        raw = buf[d[0]:d[1]]
        dur_ms = struct.unpack(">f" if len(raw) == 4 else ">d", raw)[0]
    for t, b, e in _walk(buf, *tracks):
        if t != _TRACKENTRY:
            continue
        ttype = _child(buf, (b, e), _TRACKTYPE)
        if ttype is None or _uint_at(buf, ttype) != 1:
            continue
        codec = buf[slice(*_child(buf, (b, e), _CODECID))].decode("latin1")
        video = _child(buf, (b, e), _VIDEO)
        w = _uint_at(buf, _child(buf, video, _PIXW))
        h = _uint_at(buf, _child(buf, video, _PIXH))
        dd = _child(buf, (b, e), _DEFAULTDUR)
        fps = round(1e9 / _uint_at(buf, dd)) if dd else 25
        if codec != "V_MJPEG":
            raise NotImplementedError(
                f"mkv/webm codec '{codec}' not decodable here "
                "(only V_MJPEG)")
        if dur_ms is None:
            raise ValueError("mkv missing Duration")
        n = round(dur_ms * fps / 1000.0)
        return n, w, h, fps, codec
    raise ValueError("mkv has no video track")


def mkv_frame_index(buf: bytes) -> list[tuple[int, int]]:
    """[(abs_offset, size)] of each frame's JPEG bytes: one structural
    walk over Segment children (skips payloads by size), SimpleBlock and
    BlockGroup/Block both handled."""
    seg = _child(buf, (0, len(buf)), _SEGMENT)
    if seg is None:
        raise ValueError("mkv missing Segment")
    idx: list[tuple[int, int]] = []
    for t, b, e in _walk(buf, *seg):
        if t != _CLUSTER:
            continue
        for t2, b2, e2 in _walk(buf, b, e):
            if t2 == _SIMPLEBLOCK:
                spans = [(b2, e2)]
            elif t2 == b"\xa0":  # BlockGroup → Block (0xA1)
                blk = _child(buf, (b2, e2), b"\xa1")
                spans = [blk] if blk else []
            else:
                continue
            for bb, be in spans:
                _, p = _read_vint(buf, bb)       # track number
                p += 3                            # rel. timestamp + flags
                idx.append((p, be - p))
    return idx


def mkv_frame(buf: bytes, k: int,
              index: list[tuple[int, int]] | None = None) -> np.ndarray:
    """Decode ONLY frame k (O(1) after the one index walk)."""
    idx = index if index is not None else mkv_frame_index(buf)
    if not 0 <= k < len(idx):
        raise IndexError(f"frame {k} out of range 0..{len(idx) - 1}")
    off, sz = idx[k]
    return decode_jpeg(buf[off:off + sz])
