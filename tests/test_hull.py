"""Distributed convex hull (spatial/hull): partial-then-merge ==
single-pass reference under every partitioning; exact integer turns."""

from __future__ import annotations

import random

from osm2geojson_spark import pyref
from osm2geojson_spark.spatial.hull import convex_hull, monotone_chain


def _brute_hull_membership(pts, hull):
    """Every input point lies inside or on the hull (cross-product
    half-plane test against each CCW edge)."""
    n = len(hull)
    for px, py in pts:
        for i in range(n):
            ax, ay = hull[i]
            bx, by = hull[(i + 1) % n]
            if (bx - ax) * (py - ay) - (by - ay) * (px - ax) < 0:
                return False
    return True


def test_monotone_chain_basics():
    sq = [(0, 0), (4, 0), (4, 4), (0, 4), (2, 2), (4, 2), (2, 0)]
    assert monotone_chain(sq) == [(0, 0), (4, 0), (4, 4), (0, 4)]
    # degenerate shapes
    assert monotone_chain([(5, 7)]) == [(5, 7)]
    assert monotone_chain([(5, 7), (5, 7)]) == [(5, 7)]
    assert monotone_chain([(0, 0), (2, 2), (1, 1), (3, 3)]) == [
        (0, 0), (3, 3)]  # all collinear -> the two extremes
    # duplicates and collinear edge points are dropped
    assert monotone_chain([(0, 0), (2, 0), (1, 0), (2, 0), (1, 2)]) == [
        (0, 0), (2, 0), (1, 2)]


def test_merge_property_random():
    rng = random.Random(42)
    for trial in range(50):
        pts = [(rng.randrange(-1000, 1000), rng.randrange(-1000, 1000))
               for _ in range(rng.randrange(1, 120))]
        full = monotone_chain(pts)
        # split into random chunks, hull each, hull the union of hulls
        chunks = [[] for _ in range(rng.randrange(1, 6))]
        for p in pts:
            chunks[rng.randrange(len(chunks))].append(p)
        merged = monotone_chain(
            [v for c in chunks if c for v in monotone_chain(c)])
        assert merged == full, f"trial {trial}"
        assert _brute_hull_membership(pts, full)


def test_spark_global_hull(spark):
    rng = random.Random(7)
    pts = [(rng.randrange(-10**8, 10**8), rng.randrange(-10**8, 10**8))
           for _ in range(5000)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = sorted((r.pos, r.x, r.y) for r in
                 convex_hull(df).collect())
    assert got == pyref.ref_convex_hull(pts)
    # partition invariance
    got17 = sorted((r.pos, r.x, r.y) for r in
                   convex_hull(df.repartition(17)).collect())
    assert got17 == got


def test_spark_grouped_hull(spark):
    rng = random.Random(9)
    rows, ref = [], {}
    for g in range(6):
        pts = [(rng.randrange(-500, 500), rng.randrange(-500, 500))
               for _ in range(rng.randrange(1, 200))]
        ref[g] = pyref.ref_convex_hull(pts)
        rows += [(g, x, y) for x, y in pts]
    df = spark.createDataFrame(rows, "gid long, x long, y long")
    out = convex_hull(df.repartition(11), group_col="gid").collect()
    got: dict = {}
    for r in out:
        got.setdefault(r.gid, []).append((r.pos, r.x, r.y))
    assert {g: sorted(v) for g, v in got.items()} == ref


def test_spark_collinear_and_tiny_groups(spark):
    rows = (
        [(1, i, 2 * i) for i in range(10)]      # collinear line
        + [(2, 5, 5)]                            # single point
        + [(3, 0, 0), (3, 1, 0), (3, 0, 1)]      # triangle
    )
    df = spark.createDataFrame(rows, "gid long, x long, y long")
    got: dict = {}
    for r in convex_hull(df, group_col="gid").collect():
        got.setdefault(r.gid, []).append((r.pos, r.x, r.y))
    assert sorted(got[1]) == [(0, 0, 0), (1, 9, 18)]
    assert got[2] == [(0, 5, 5)]
    assert sorted(got[3]) == [(0, 0, 0), (1, 1, 0), (2, 0, 1)]
