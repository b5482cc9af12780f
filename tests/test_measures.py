"""Geometry measures: codegen folds vs independent scalar references.

The catalog twin (`geom_measures`) pins cross-engine bit-exactness vs
DuckDB; this file pins the MATH — area2 against the scalar shoelace,
perimeter/centroid against a left-fold Python replay (same IEEE op
order, so equality is exact, not approx), bbox, winding sign, and the
plan shape (no UDFs, single shuffle)."""

import math
import random

import pytest

from osm2geojson_spark.spatial.polytile import shoelace2


def _py_measures(ring):
    m = len(ring)
    edges = [(ring[i], ring[(i + 1) % m]) for i in range(m)]
    area2 = 0
    for (px, py), (qx, qy) in edges:
        area2 += px * qy - qx * py
    per = 0.0
    for (px, py), (qx, qy) in edges:
        per = per + math.sqrt(float((qx - px) ** 2 + (qy - py) ** 2))
    cxn = cyn = 0.0
    for (px, py), (qx, qy) in edges:
        c = float(px * qy - qx * py)
        cxn = cxn + float(px + qx) * c
        cyn = cyn + float(py + qy) * c
    d = 3.0 * float(area2)
    return area2, per, cxn / d, cyn / d


@pytest.fixture(scope="module")
def rings_df(spark):
    rng = random.Random(5)
    rings = {}
    # convex-ish and star-shaped rings on a microdegree-scale lattice
    for rid in range(12):
        m = rng.randint(3, 10)
        cx, cy = rng.randint(-10**8, 10**8), rng.randint(-5 * 10**7, 5 * 10**7)
        pts = []
        for j in range(m):
            a = 2 * math.pi * j / m
            r = rng.randint(10**5, 10**7)
            pts.append((cx + int(r * math.cos(a)), cy + int(r * math.sin(a))))
        rings[rid] = pts
    rows = [(rid, 0, i, x, y)
            for rid, pts in rings.items() for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(
        rows, "poly_id long, ring long, pos long, x long, y long")
    return df, rings


def test_measures_match_scalar_replay(rings_df):
    from osm2geojson_spark.functions.measures import ring_measures

    df, rings = rings_df
    got = {r["poly_id"]: r for r in ring_measures(df).collect()}
    assert set(got) == set(rings)
    for rid, pts in rings.items():
        r = got[rid]
        area2, per, cx, cy = _py_measures(pts)
        assert r["area2"] == area2 == shoelace2(pts)
        assert r["perimeter"] == per  # exact: same IEEE fold order
        assert r["cx"] == cx and r["cy"] == cy
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        assert (r["min_x"], r["min_y"], r["max_x"], r["max_y"]) == (
            min(xs), min(ys), max(xs), max(ys))
        assert r["n_vertices"] == len(pts)


def test_winding_sign(spark):
    from osm2geojson_spark.functions.measures import ring_measures

    sq = [(0, 0), (10, 0), (10, 10), (0, 10)]
    rows = [(1, 0, i, x, y) for i, (x, y) in enumerate(sq)]
    rows += [(2, 0, i, x, y) for i, (x, y) in enumerate(reversed(sq))]
    df = spark.createDataFrame(
        rows, "poly_id long, ring long, pos long, x long, y long")
    out = {r["poly_id"]: r["area2"] for r in ring_measures(df).collect()}
    assert out[1] == 200 and out[2] == -200


def test_plan_no_udf_single_exchange(rings_df):
    from osm2geojson_spark.functions.measures import ring_measures

    df, _ = rings_df
    plan = ring_measures(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange") <= 2  # repartition reused by the agg
