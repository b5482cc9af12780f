"""MJPEG-in-MP4 container (synth/mp4.py): ISO-BMFF box grammar a stock
player would accept, sample-table O(1) frame seek, general stsc
chunk-run mapping, co64 + multi-run stts decode paths the writer never
emits, and codec gating (avc1 → NotImplementedError → quarantine)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from osm2geojson_spark.operators.images import psnr
from osm2geojson_spark.synth.images import gen_pixels
from osm2geojson_spark.synth.mp4 import (
    _box,
    _full,
    encode_mp4_mjpeg,
    mp4_frame,
    mp4_frame_index,
    mp4_header,
)


@pytest.fixture(scope="module")
def clip():
    frames = [gen_pixels(300 + 31 * k, 32, 24) for k in range(7)]
    return frames, encode_mp4_mjpeg(frames, fps=12)


def test_box_structure(clip):
    frames, buf = clip
    # top-level boxes in write order, with consistent sizes
    pos, seen = 0, []
    while pos < len(buf):
        size = struct.unpack_from(">I", buf, pos)[0]
        seen.append(buf[pos + 4:pos + 8])
        pos += size
    assert pos == len(buf)
    assert seen == [b"ftyp", b"mdat", b"moov"]
    for inner in (b"mvhd", b"trak", b"tkhd", b"mdia", b"mdhd", b"hdlr",
                  b"minf", b"stbl", b"stsd", b"jpeg", b"stts", b"stsc",
                  b"stsz", b"stco", b"vide"):
        assert inner in buf, inner
    # every sample is a standalone baseline JFIF stream
    for off, sz in mp4_frame_index(buf):
        assert buf[off:off + 2] == b"\xff\xd8"
        assert buf[off + sz - 2:off + sz] == b"\xff\xd9"


def test_header_and_seek(clip):
    frames, buf = clip
    assert mp4_header(buf) == (7, 32, 24, 12)
    idx = mp4_frame_index(buf)
    assert len(idx) == 7
    for k in (0, 3, 6):
        out = mp4_frame(buf, k, idx)
        assert out.shape == frames[k].shape
        assert psnr(frames[k], out) >= 40.0
    with pytest.raises(IndexError):
        mp4_frame(buf, 7, idx)


def _rebuild_stbl(buf: bytes, replace: dict) -> bytes:
    """Re-assemble the file with some stbl children swapped — exercises
    reader paths (co64, multi-run stsc/stts) our writer never emits.
    Ancestor box sizes (moov/trak/mdia/minf) are patched for the length
    delta so the result stays a well-formed ISO-BMFF tree."""
    from osm2geojson_spark.synth import mp4 as M

    stbl, _ = M._video_stbl(buf)
    children = {}
    order = []
    for t, b, e in M._walk(buf, *stbl):
        children[t] = buf[b - 8:e]
        order.append(t)
    new_children = b"".join(replace.get(t, children[t]) for t in order)
    new_stbl = _box(b"stbl", new_children)
    delta = len(new_stbl) - (stbl[1] - (stbl[0] - 8))
    out = bytearray(buf[:stbl[0] - 8] + new_stbl + buf[stbl[1]:])

    # walk down to stbl recording each ancestor's size-field offset
    def patch(start, end):
        for t, b, e in M._walk(bytes(buf), start, end):
            if b <= stbl[0] - 8 < e:
                if t in (b"moov", b"trak", b"mdia", b"minf"):
                    sz = struct.unpack_from(">I", out, b - 8)[0]
                    struct.pack_into(">I", out, b - 8, sz + delta)
                    patch(b, e)
                return

    patch(0, len(buf))
    return bytes(out)


def test_co64_and_chunked_stsc(clip):
    frames, buf = clip
    idx = mp4_frame_index(buf)
    sizes = [sz for _, sz in idx]
    # co64 64-bit offsets, 2 chunks: samples 0-3 contiguous from chunk 1,
    # samples 4-6 from chunk 2 (true in the original layout: each sample
    # chunk is contiguous in mdat)
    co64 = _full(b"co64", 0, 0, struct.pack(">I", 2)
                 + struct.pack(">QQ", idx[0][0], idx[4][0]))
    stsc = _full(b"stsc", 0, 0, struct.pack(">I", 2)
                 + struct.pack(">III", 1, 4, 1)
                 + struct.pack(">III", 2, 3, 1))
    # drop stco by replacing it with a free box so co64 is used
    free = _box(b"free", b"\x00" * 4)
    out = _rebuild_stbl(buf, {b"stco": free + co64, b"stsc": stsc})
    assert mp4_frame_index(out) == idx
    # multi-run stts: 3 samples at delta 1, 4 at delta 2 → n still 7
    stts = _full(b"stts", 0, 0, struct.pack(">I", 2)
                 + struct.pack(">II", 3, 1) + struct.pack(">II", 4, 2))
    out2 = _rebuild_stbl(buf, {b"stts": stts})
    n, w, h, fps = mp4_header(out2)
    assert (n, w, h) == (7, 32, 24)
    assert np.array_equal(mp4_frame(out2, 5), mp4_frame(buf, 5))


def test_codec_gate_and_garbage(clip):
    frames, buf = clip
    pos = buf.find(b"jpeg", 200)
    with pytest.raises(NotImplementedError, match="avc1"):
        mp4_header(buf[:pos] + b"avc1" + buf[pos + 4:])
    with pytest.raises(ValueError):
        mp4_header(b"\x00" * 64)
    with pytest.raises(ValueError):
        mp4_header(b"RIFF1234AVI " + b"\x00" * 32)


def test_full_rotation_operators(spark):
    from osm2geojson_spark.operators.video import sample_frames, video_stats
    from osm2geojson_spark.synth.images import decode_ppm
    from osm2geojson_spark.synth.video import VFMTS_ALL, video_table

    vids = video_table(spark, n=30, seed=66, fmts=VFMTS_ALL).cache()
    src = {r["media_id"]: r for r in vids.collect()}
    assert {r["fmt"] for r in src.values()} == set(VFMTS_ALL)

    st = video_stats(vids).collect()
    for r in st:
        if r["fmt"] == "webm":
            assert r["error"] and "NotImplementedError" in r["error"]
            assert "V_VP9" in r["error"]
        else:
            assert r["error"] is None, (r["fmt"], r["error"])
            assert r["n_frames"] == src[r["media_id"]]["n_frames"]
            assert r["duration_sec"] == r["n_frames"] / 10.0

    # sampled mp4/mkv frames decode to the true synth pixels (≥40dB)
    frames = sample_frames(vids, every_n=3).collect()
    checked = {"mp4": 0, "mkv": 0}
    for r in frames:
        fmt = src[r["media_id"]]["fmt"] if r["media_id"] in src else None
        if fmt in checked and checked[fmt] < 3 and r["frame_idx"] >= 0:
            seed = int(r["media_id"].split("-")[1])
            want = gen_pixels(seed + 31 * r["frame_idx"],
                              src[r["media_id"]]["w"],
                              src[r["media_id"]]["h"])
            assert psnr(want, decode_ppm(bytes(r["frame"]))) >= 40.0
            checked[fmt] += 1
    assert checked == {"mp4": 3, "mkv": 3}
    # webm rows yield exactly one quarantine row each
    webm_ids = {m for m, r in src.items() if r["fmt"] == "webm"}
    q = [r for r in frames if r["media_id"] in webm_ids]
    assert q and all(r["frame_idx"] == -1 and r["error"] for r in q)
