"""MJPEG-in-Matroska container (synth/mkv.py): EBML grammar, vint
encoding, Cues, structural-walk frame index, BlockGroup/Block decode
path the writer never emits, and the honest webm codec gate."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from osm2geojson_spark.operators.images import psnr
from osm2geojson_spark.synth.images import gen_pixels
from osm2geojson_spark.synth.mkv import (
    _CLUSTER,
    _SEGMENT,
    _SIMPLEBLOCK,
    _TIMESTAMP,
    _elem,
    _read_vint,
    _uint,
    _vint,
    _walk,
    encode_mkv_mjpeg,
    mkv_frame,
    mkv_frame_index,
    mkv_header,
)


@pytest.fixture(scope="module")
def clip():
    frames = [gen_pixels(500 + 31 * k, 32, 24) for k in range(6)]
    return frames, encode_mkv_mjpeg(frames, fps=12)


def test_vint_roundtrip():
    for v in (0, 1, 126, 127, 128, 16382, 16383, 2**21 - 3, 2**42, 2**53):
        enc = _vint(v)
        got, nxt = _read_vint(enc, 0)
        assert got == v and nxt == len(enc)
    # boundary: 127 needs 2 bytes (1-byte all-ones is reserved)
    assert len(_vint(126)) == 1 and len(_vint(127)) == 2


def test_ebml_structure(clip):
    frames, buf = clip
    assert buf[:4] == b"\x1aE\xdf\xa3"
    assert b"matroska" in buf[:64]
    assert b"V_MJPEG" in buf
    # the segment walk is exhaustive and every element nests exactly
    seg = None
    for t, b, e in _walk(buf, 0, len(buf)):
        if t == _SEGMENT:
            seg = (b, e)
    assert seg is not None and seg[1] == len(buf)
    kinds = [t for t, _, _ in _walk(buf, *seg)]
    assert kinds.count(_CLUSTER) == 6
    # every frame is a standalone baseline JFIF stream
    for off, sz in mkv_frame_index(buf):
        assert buf[off:off + 2] == b"\xff\xd8"
        assert buf[off + sz - 2:off + sz] == b"\xff\xd9"


def test_header_and_seek(clip):
    frames, buf = clip
    assert mkv_header(buf) == (6, 32, 24, 12, "V_MJPEG")
    idx = mkv_frame_index(buf)
    assert len(idx) == 6
    for k in (0, 2, 5):
        out = mkv_frame(buf, k, idx)
        assert out.shape == frames[k].shape
        assert psnr(frames[k], out) >= 40.0
    with pytest.raises(IndexError):
        mkv_frame(buf, 6, idx)


def test_blockgroup_path(clip):
    """Files in the wild use BlockGroup/Block instead of SimpleBlock
    (e.g. when attaching durations); the reader handles both. Rewrap
    every SimpleBlock into a BlockGroup and expect identical frames."""
    frames, buf = clip
    seg_span = None
    for t, b, e in _walk(buf, 0, len(buf)):
        if t == _SEGMENT:
            seg_span = (b, e)
    out = bytearray(buf[:seg_span[0] - len(_vint(seg_span[1] - seg_span[0]))
                        - len(_SEGMENT)])
    body = bytearray()
    for t, b, e in _walk(buf, *seg_span):
        if t != _CLUSTER:
            body += buf[b - len(t) - len(_vint(e - b)):e]
            continue
        inner = bytearray()
        for t2, b2, e2 in _walk(buf, b, e):
            if t2 == _SIMPLEBLOCK:
                raw = bytearray(buf[b2:e2])
                raw[3] &= 0x0F  # BlockGroup Blocks carry no keyframe flag
                inner += _elem(b"\xa0", _elem(b"\xa1", bytes(raw))
                               + _uint(b"\x9b", 83))  # BlockDuration
            else:
                inner += buf[b2 - len(t2) - len(_vint(e2 - b2)):e2]
        body += _elem(_CLUSTER, bytes(inner))
    rebuilt = bytes(out) + _elem(_SEGMENT, bytes(body))
    assert mkv_header(rebuilt)[0] == 6
    idx = mkv_frame_index(rebuilt)
    assert len(idx) == 6
    for k in (0, 5):
        assert np.array_equal(mkv_frame(rebuilt, k, idx),
                              mkv_frame(buf, k))


def test_webm_gate_and_garbage(clip):
    frames, _ = clip
    wb = encode_mkv_mjpeg(frames[:2], fps=10, doctype="webm",
                          codec_id="V_VP9")
    assert b"webm" in wb[:64]
    with pytest.raises(NotImplementedError, match="V_VP9"):
        mkv_header(wb)
    with pytest.raises(ValueError):
        mkv_header(b"\x00" * 64)
    with pytest.raises(ValueError):
        mkv_header(struct.pack(">I", 16) + b"ftypisom" + b"\x00" * 16)


def test_timestamps_monotone(clip):
    frames, buf = clip
    seg = None
    for t, b, e in _walk(buf, 0, len(buf)):
        if t == _SEGMENT:
            seg = (b, e)
    ts = []
    for t, b, e in _walk(buf, *seg):
        if t == _CLUSTER:
            for t2, b2, e2 in _walk(buf, b, e):
                if t2 == _TIMESTAMP:
                    ts.append(int.from_bytes(buf[b2:e2], "big"))
    assert ts == sorted(ts) and len(ts) == 6
