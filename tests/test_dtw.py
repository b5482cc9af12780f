"""DTW + discrete Fréchet kernels and Spark wiring."""

from __future__ import annotations

import pytest

from osm2geojson_spark.spatial.dtw import (
    dtw_int,
    frechet_int,
    trajectory_similarity_pairs,
)
from osm2geojson_spark.spatial.hausdorff import collect_geoms


def test_dtw_identical_is_zero():
    p = [(0, 0), (3, 4), (10, 2)]
    assert dtw_int(p, p) == 0
    assert frechet_int(p, p) == 0


def test_dtw_hand_example():
    # A = (0,0)->(2,0); B = (0,0)->(1,0)->(2,0): middle B point aligns
    # to whichever A endpoint is closer (cost 1), ends pin to ends.
    a = [(0, 0), (2, 0)]
    b = [(0, 0), (1, 0), (2, 0)]
    assert dtw_int(a, b) == 1
    assert frechet_int(a, b) == 1


def test_frechet_leash_vs_dtw_sum():
    # shifted parallel lines: every aligned step costs 4
    a = [(0, 0), (1, 0), (2, 0)]
    b = [(0, 2), (1, 2), (2, 2)]
    assert frechet_int(a, b) == 4       # minimax: one leash length
    assert dtw_int(a, b) == 12          # sum over the 3 aligned steps


def test_dtw_symmetry():
    a = [(0, 0), (5, 1), (9, 9)]
    b = [(1, 1), (4, 4)]
    assert dtw_int(a, b) == dtw_int(b, a)
    assert frechet_int(a, b) == frechet_int(b, a)


def test_dtw_matches_memo_reference():
    from osm2geojson_spark.pyref import ref_traj_sim

    lon_mul, lat_mul = 2654435761, 2246822519

    def pts(obj, m=8):
        return [(((obj * 31 + i * 17 + 3) * lon_mul) % 1_000_000,
                 ((obj * 29 + i * 13 + 11) * lat_mul) % 1_000_000)
                for i in range(m)]

    want = {(a, b): (d, f)
            for a, b, d, f in ref_traj_sim(n_objs=6, m=8, group_mod=2)}
    for (a, b), (d, f) in want.items():
        assert dtw_int(pts(a), pts(b)) == d
        assert frechet_int(pts(a), pts(b)) == f
    assert len(want) == 6  # C(3,2) pairs in each of 2 groups


def test_spark_wiring_matches_kernel(spark):
    rows = [(obj, i, (obj * 7 + i * 3) % 50, (obj * 5 + i * 11) % 50)
            for obj in range(4) for i in range(6)]
    geoms = collect_geoms(
        spark.createDataFrame(rows, "obj_id long, seq long, x long, y long"))
    pairs = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a < b],
        "id_a long, id_b long")
    got = {(r.id_a, r.id_b): (r.dtw_sq_sum, r.frechet_sq)
           for r in trajectory_similarity_pairs(geoms, pairs).collect()}

    def pts(obj):
        return [((obj * 7 + i * 3) % 50, (obj * 5 + i * 11) % 50)
                for i in range(6)]

    assert len(got) == 6
    for (a, b), (d, f) in got.items():
        assert d == dtw_int(pts(a), pts(b))
        assert f == frechet_int(pts(a), pts(b))
