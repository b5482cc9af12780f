"""MJPEG-in-AVI container (synth/avi.py) + operator integration: RIFF
structure a stock player would accept, idx1 O(1) frame seek, the
idx1-less scan fallback, and sample_frames/video_stats over the mixed
fpack+avi rotation."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from osm2geojson_spark.operators.images import psnr
from osm2geojson_spark.synth.avi import (
    avi_frame,
    avi_frame_index,
    avi_header,
    encode_avi_mjpeg,
)
from osm2geojson_spark.synth.images import gen_pixels


@pytest.fixture(scope="module")
def clip():
    frames = [gen_pixels(100 + 31 * k, 32, 24) for k in range(7)]
    return frames, encode_avi_mjpeg(frames, fps=12)


def test_riff_structure(clip):
    frames, buf = clip
    assert buf[:4] == b"RIFF" and buf[8:12] == b"AVI "
    assert struct.unpack_from("<I", buf, 4)[0] == len(buf) - 8
    for fourcc in (b"hdrl", b"avih", b"strl", b"strh", b"strf",
                   b"movi", b"00dc", b"idx1", b"vids", b"MJPG"):
        assert fourcc in buf, fourcc
    # every frame chunk is a standalone baseline JFIF stream
    idx = avi_frame_index(buf)
    for off, sz in idx:
        assert buf[off:off + 2] == b"\xff\xd8"
        assert buf[off + sz - 2:off + sz] == b"\xff\xd9"


def test_header_and_seek(clip):
    frames, buf = clip
    assert avi_header(buf) == (7, 32, 24, 12)
    idx = avi_frame_index(buf)
    assert len(idx) == 7
    for k in (0, 3, 6):
        out = avi_frame(buf, k, idx)
        assert out.shape == frames[k].shape
        assert psnr(frames[k], out) >= 40.0
    with pytest.raises(IndexError):
        avi_frame(buf, 7, idx)


def test_idx1less_scan_fallback(clip):
    frames, buf = clip
    p = buf.index(b"idx1")
    noidx = buf[:p]
    noidx = noidx[:4] + struct.pack("<I", len(noidx) - 8) + noidx[8:]
    assert np.array_equal(avi_frame(noidx, 3), avi_frame(buf, 3))


def test_garbage_rejected():
    with pytest.raises(ValueError):
        avi_header(b"RIFX1234AVI ")
    with pytest.raises(ValueError):
        avi_header(b"\x00" * 32)


def test_mixed_rotation_operators(spark):
    from osm2geojson_spark.operators.video import sample_frames, video_stats
    from osm2geojson_spark.synth.images import decode_ppm
    from osm2geojson_spark.synth.video import VFMTS_AVI, video_table

    vids = video_table(spark, n=24, seed=66, fmts=VFMTS_AVI).cache()
    fmts = {r["fmt"] for r in vids.select("fmt").distinct().collect()}
    assert fmts == {"fpack", "avi"}

    st = video_stats(vids).collect()
    assert all(r["error"] is None for r in st), [r["error"] for r in st]
    src = {r["media_id"]: r for r in vids.collect()}
    for r in st:
        assert r["n_frames"] == src[r["media_id"]]["n_frames"]
        assert r["duration_sec"] == r["n_frames"] / 10.0
        assert 0.0 < r["mean_lum"] < 255.0

    frames = sample_frames(vids, every_n=3).collect()
    assert all(r["error"] is None for r in frames)
    by_id: dict = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    for mid, idxs in by_id.items():
        n = src[mid]["n_frames"]
        assert sorted(idxs) == list(range(0, n, 3))
    # sampled avi frames decode to the true synth pixels (lossy, ≥40dB)
    avi_ids = {m for m, r in src.items() if r["fmt"] == "avi"}
    checked = 0
    for r in frames:
        if r["media_id"] in avi_ids and checked < 5:
            seed = int(r["media_id"].split("-")[1])
            want = gen_pixels(seed + 31 * r["frame_idx"],
                              src[r["media_id"]]["w"], src[r["media_id"]]["h"])
            assert psnr(want, decode_ppm(bytes(r["frame"]))) >= 40.0
            checked += 1
    assert checked == 5


def test_mislabeled_fmt_quarantines(spark):
    # mp4 is a real decoder now; fpack bytes labeled mp4 must fail the
    # box parse and quarantine (ValueError), never crash the task
    from pyspark.sql import functions as F

    from osm2geojson_spark.operators.video import video_stats
    from osm2geojson_spark.synth.video import video_table

    vids = video_table(spark, n=3, seed=66).withColumn("fmt", F.lit("mp4"))
    st = video_stats(vids).collect()
    assert all(r["error"] and "ValueError" in r["error"] for r in st)
