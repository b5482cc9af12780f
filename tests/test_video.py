"""Video payload invariants: fpack container round-trip + O(1) seek,
frame sampling (every-n semantics, quarantine), per-clip features."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm2geojson_spark.operators.video import sample_frames, video_stats
from osm2geojson_spark.synth.images import decode_ppm, gen_pixels
from osm2geojson_spark.synth.video import (
    encode_fpack,
    fpack_frame,
    fpack_header,
    video_table,
)


def test_fpack_roundtrip_and_seek():
    frames = [gen_pixels(s, 24, 16) for s in range(5)]
    buf = encode_fpack(frames, fps=12)
    n, w, h, fps, _ = fpack_header(buf)
    assert (n, w, h, fps) == (5, 24, 16, 12)
    for k in (0, 3, 4):
        assert np.array_equal(fpack_frame(buf, k), frames[k])
    with pytest.raises(IndexError):
        fpack_frame(buf, 5)
    with pytest.raises(ValueError):
        fpack_frame(buf[:-10], 4)  # truncated last frame


@pytest.fixture(scope="module")
def videos(spark):
    df = video_table(spark, n=40, seed=66).cache()
    df.count()
    return df


def test_sample_frames_every_n(spark, videos):
    out = sample_frames(videos, every_n=3).cache()
    assert out.filter(F.col("error").isNotNull()).count() == 0
    got = {}
    for r in out.collect():
        got.setdefault(r["media_id"], []).append(r["frame_idx"])
    src = {r["media_id"]: r["n_frames"] for r in videos.collect()}
    assert set(got) == set(src)
    for mid, idxs in got.items():
        assert sorted(idxs) == list(range(0, src[mid], 3))
    # sampled frames decode to real pixels
    one = out.filter(F.col("frame_idx") == 0).limit(1).collect()[0]
    px = decode_ppm(bytes(one["frame"]))
    assert px.ndim == 3 and px.shape[2] == 3


def test_sample_frames_quarantines_bad_rows(spark, videos):
    # mp4 decodes for real now: fpack bytes mislabeled mp4 fail the box
    # parse (ValueError → quarantine); a structurally-valid webm fails
    # the codec gate (NotImplementedError → quarantine)
    mp4ish = videos.limit(3).withColumn("fmt", F.lit("mp4"))
    rows = sample_frames(mp4ish).collect()
    assert len(rows) == 3
    assert all(r["frame_idx"] == -1 and "ValueError" in r["error"]
               for r in rows)

    from osm2geojson_spark.synth.video import VFMTS_ALL, video_table

    allv = video_table(spark, n=10, seed=66, fmts=VFMTS_ALL)
    webm = allv.filter(F.col("fmt") == "webm")
    rows = sample_frames(webm).collect()
    assert rows and all(r["frame_idx"] == -1
                        and "NotImplementedError" in r["error"]
                        for r in rows)


def test_video_stats(spark, videos):
    stats = {r["media_id"]: r for r in video_stats(videos.limit(8)).collect()}
    src = {r["media_id"]: r for r in videos.limit(8).collect()}
    for mid, r in stats.items():
        assert r["error"] is None
        assert r["n_frames"] == src[mid]["n_frames"]
        assert r["duration_sec"] == pytest.approx(r["n_frames"] / 10.0)
        assert 0 < r["mean_lum"] < 255
        assert r["mean_frame_delta"] > 0  # distinct frames differ
