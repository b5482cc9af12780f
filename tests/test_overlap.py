"""G2++ polygon-overlap join: brute-force parity, dedup, and plan shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm2geojson_spark.spatial.overlap import (
    _polys_intersect, polygon_overlap_join)


def _rand_poly(rng, cx, cy, r, n):
    """Simple (star-shaped) polygon around (cx, cy)."""
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = rng.uniform(0.4 * r, r, n)
    return np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1)


def _mk_df(spark, polys, id_name):
    rows = [(int(i), [{"lon": float(x), "lat": float(y)} for x, y in p])
            for i, p in enumerate(polys)]
    return spark.createDataFrame(
        rows, f"{id_name} int, ring array<struct<lon:double,lat:double>>")


@pytest.fixture(scope="module")
def poly_sets(spark):
    rng = np.random.default_rng(5)
    left = [_rand_poly(rng, *rng.uniform(-20, 20, 2), rng.uniform(0.5, 4), 8)
            for _ in range(60)]
    right = [_rand_poly(rng, *rng.uniform(-20, 20, 2), rng.uniform(0.5, 4), 7)
             for _ in range(60)]
    return left, right


def test_exact_mode_matches_numpy_bruteforce(spark, poly_sets):
    left, right = poly_sets
    got = {(r["l_id"], r["r_id"]) for r in polygon_overlap_join(
        _mk_df(spark, left, "l_id"), _mk_df(spark, right, "r_id"),
        res=5, mode="exact").collect()}
    exp = {(i, j) for i, a in enumerate(left) for j, b in enumerate(right)
           if _polys_intersect(a, b)}
    assert got == exp and len(exp) > 10


def test_bbox_mode_matches_bruteforce_and_dedups(spark, poly_sets):
    left, right = poly_sets

    def bbox(p):
        return p[:, 0].min(), p[:, 0].max(), p[:, 1].min(), p[:, 1].max()

    exp = set()
    for i, a in enumerate(left):
        ax0, ax1, ay0, ay1 = bbox(a)
        for j, b in enumerate(right):
            bx0, bx1, by0, by1 = bbox(b)
            if ax0 <= bx1 and bx0 <= ax1 and ay0 <= by1 and by0 <= ay1:
                exp.add((i, j))
    for res in (3, 6):  # dedup must hold at any cover granularity
        rows = polygon_overlap_join(
            _mk_df(spark, left, "l_id"), _mk_df(spark, right, "r_id"),
            res=res, mode="bbox").select("l_id", "r_id").collect()
        pairs = [(r["l_id"], r["r_id"]) for r in rows]
        assert len(pairs) == len(set(pairs)), "canonical-cell dedup failed"
        assert set(pairs) == exp


def test_exact_catches_containment_and_touch(spark):
    big = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
    inner = big * 0.2 + 4.0          # fully inside: no edge crossings
    touch = big + np.array([10.0, 0.0])  # shares the x=10 edge
    far = big + 100.0
    df_l = _mk_df(spark, [big], "l_id")
    df_r = _mk_df(spark, [inner, touch, far], "r_id")
    got = {r["r_id"] for r in polygon_overlap_join(
        df_l, df_r, res=4, mode="exact").collect()}
    assert got == {0, 1}


def test_no_cartesian_in_plan(spark, poly_sets):
    left, right = poly_sets
    plan = polygon_overlap_join(
        _mk_df(spark, left, "l_id"), _mk_df(spark, right, "r_id"),
        res=5, mode="bbox")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
