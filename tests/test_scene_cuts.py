from __future__ import annotations

import numpy as np

from osm2geojson_spark.operators.video import scene_cuts
from osm2geojson_spark.synth.video import (
    fpack_frame,
    make_scene_video_row,
    scene_video_table,
)


def planted_cuts(seed: int) -> list[int]:
    n_scenes = 2 + seed % 3
    per_scene = 3 + (seed // 3) % 3
    return [j * per_scene for j in range(1, n_scenes)]


def test_cuts_match_planted_scene_layout(spark):
    vids = scene_video_table(spark, n=40, seed=42)
    got: dict[str, list[int]] = {}
    for r in scene_cuts(vids, thr_per_px=100).collect():
        assert r["error"] is None
        got.setdefault(r["media_id"], []).append(r["cut_at"])
    for i in range(40):
        seed = i * 2 + 42
        mid = f"scn-{seed:012d}"
        assert sorted(got.get(mid, [])) == planted_cuts(seed), mid


def test_in_scene_delta_is_exactly_nine_per_px():
    mid, buf, w, h, nf, _, _ = make_scene_video_row(42)
    f0 = fpack_frame(buf, 0).astype(np.int64)
    f1 = fpack_frame(buf, 1).astype(np.int64)
    assert int(((f1 - f0) ** 2).sum()) == 9 * w * h * 3


def test_undecodable_clip_quarantines(spark):
    import pandas as pd

    bad = spark.createDataFrame(
        pd.DataFrame({"media_id": ["x"], "bytes": [b"not a clip"],
                      "fmt": ["fpack"]}))
    rows = scene_cuts(bad).collect()
    assert len(rows) == 1 and rows[0]["cut_at"] == -1
    assert rows[0]["error"] is not None
