from __future__ import annotations

from collections import defaultdict

from osm2geojson_spark.operators.video import shot_signatures, video_dup_pairs
from osm2geojson_spark.synth.images import phash64
from osm2geojson_spark.synth.video import (
    fpack_frame,
    make_shotpool_video_row,
    shotpool_video_table,
)


def brute_signatures(n: int, seed: int = 0) -> dict[str, set[int]]:
    """Independent route: closed-form shot layout (every shot is 3
    frames), phash straight off the sliced frames — no cut detection."""
    sets: dict[str, set[int]] = {}
    for i in range(n):
        mid, buf, _w, _h, nf, _, _ = make_shotpool_video_row(i + seed)
        assert nf % 3 == 0
        sets[mid] = {phash64(fpack_frame(buf, 3 * s)) for s in range(nf // 3)}
    return sets


def test_shot_signatures_match_planted_layout(spark):
    n = 36
    vids = shotpool_video_table(spark, n=n, seed=0)
    rows = shot_signatures(vids).collect()
    assert all(r["error"] is None for r in rows)
    got = defaultdict(dict)
    for r in rows:
        assert r["start_frame"] == 3 * r["shot_idx"]
        assert r["n_frames"] == 3
        got[r["media_id"]][r["shot_idx"]] = r["phash"]
    want = brute_signatures(n)
    assert set(got) == set(want)
    for mid, shots in got.items():
        assert set(shots.values()) == want[mid], mid
        assert len(shots) == 3 + int(mid.split("-")[1]) % 3


def test_video_dup_pairs_match_bruteforce(spark):
    n = 36
    vids = shotpool_video_table(spark, n=n, seed=0)
    got = {(r["id_a"], r["id_b"]): (r["shared"], r["jaccard_ppm"])
           for r in video_dup_pairs(shot_signatures(vids),
                                    min_shared=2).collect()}
    sets = brute_signatures(n)
    want = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            shared = len(sets[a] & sets[b])
            if shared >= 2:
                want[(a, b)] = (shared,
                                shared * 1_000_000 // len(sets[a] | sets[b]))
    assert got == want
    # group variants (same g, v=0/1/2) must all pair up
    assert ("dup-000000000000", "dup-000000000001") in got


def test_bucket_cap_drops_universal_shot(spark):
    vids = shotpool_video_table(spark, n=36, seed=0)
    shots = shot_signatures(vids)
    full = video_dup_pairs(shots, min_shared=1).count()
    capped = video_dup_pairs(shots, min_shared=1, max_bucket_size=2).count()
    assert capped < full


def test_undecodable_clip_quarantines(spark):
    import pandas as pd

    bad = spark.createDataFrame(
        pd.DataFrame({"media_id": ["x"], "bytes": [b"nope"],
                      "fmt": ["fpack"]}))
    rows = shot_signatures(bad).collect()
    assert len(rows) == 1 and rows[0]["shot_idx"] == -1
    assert rows[0]["error"] is not None
