"""Block-matching motion estimation (operators/video.motion_vectors).

Pins (1) ground truth: the recovered dominant vector equals the
planted per-clip velocity on the pure-translation corpus, with
sad_sum = 0 whenever no block's window crosses the wrap seam, (2)
the kernel's tie ladder on a constant frame (ambiguous everywhere →
(0 sad, smallest (dy, dx)) = (-search, -search)), (3) quarantine."""

import numpy as np

from osm2geojson_spark.operators.video import block_match_py, motion_vectors
from osm2geojson_spark.synth.video import motion_video_table


def test_recovers_planted_velocity(spark):
    vids = motion_video_table(spark, n=40, seed=42)
    rows = motion_vectors(vids, block=8, search=3).collect()
    assert all(r["error"] is None for r in rows)
    by_clip = {}
    for r in rows:
        by_clip.setdefault(r["media_id"], []).append(r)
    assert len(by_clip) == 40
    for mid, rs in by_clip.items():
        seed = int(mid.split("-")[1])
        vx = (seed // 2) % 5 - 2
        vy = (seed // 10) % 5 - 2
        if abs(vx) <= 2 and abs(vy) <= 2:
            # dominant vector is the planted one for every pair
            for r in rs:
                assert (r["vx"], r["vy"]) == (vx, vy), (mid, r)
                assert r["agree"] >= r["n_blocks"] // 2


def test_tie_ladder_constant_frame():
    f = np.full((24, 24, 3), 50, dtype=np.uint8)
    bm = block_match_py(f, f, block=8, search=2)
    # every candidate has SAD 0 for the center block at (8, 8) whose
    # full ±2 window stays inside → first-scanned (-2, -2) wins
    center = [b for b in bm if (b[0], b[1]) == (8, 8)]
    assert center == [(8, 8, -2, -2, 0)]


def test_quarantine(spark):
    df = spark.createDataFrame(
        [("bad", b"\x00garbage", "fpack")],
        "media_id string, bytes binary, fmt string")
    rows = motion_vectors(df).collect()
    assert len(rows) == 1 and rows[0]["frame_idx"] == -1
    assert rows[0]["error"]
