"""G1++ hexagonal cell index: exactness, geometry, and Spark/numpy parity.

The hex grid is the Voronoi diagram of two offset integer lattices; the
tests pin (a) that assignment IS the Voronoi cell (brute-force nearest
center over a candidate neighborhood), (b) the 6-neighbor ring is exactly
the 6 nearest centers, (c) center/encode roundtrip, (d) the Spark column
expressions and numpy kernel agree bit-for-bit, and (e) parent containment
distance is bounded by the parent circumradius (H3-style approximate
hierarchy)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from osm2geojson_spark.functions import hexgrid as H


def _brute_np(lon, lat, res):
    """Nearest center over a 4x4 neighborhood of BOTH lattices.

    Tie rule (points exactly on a hex edge — measure-zero but reachable
    on the integer grid): lattice A beats B; within a lattice the cell
    whose half-open interval CONTAINS the point wins, i.e. larger (j, i)
    — matching the encode's floor-based definition.
    """
    dx, dy = H.RES_TABLE[res]
    x2 = np.rint((lon + 180) * 2e6).astype(np.int64)
    y2 = np.rint((lat + 85) * 2e6).astype(np.int64)
    best = np.full(len(x2), -1, np.int64)
    bestd = np.full(len(x2), 1 << 62, np.int64)
    bestp = np.full(len(x2), -1, np.int64)
    for lb in (0, 1):
        i0 = (x2 - lb * dx) // (2 * dx)
        j0 = (y2 - lb * dy) // (2 * dy)
        for di in (-1, 0, 1, 2):
            for dj in (-1, 0, 1, 2):
                i, j = i0 + di, j0 + dj
                d = (x2 - (2 * i + lb) * dx) ** 2 + (y2 - (2 * j + lb) * dy) ** 2
                cid = ((j * H._PACK_I + i) * 2 + lb) * 16 + res
                pref = (1 - lb) * (1 << 42) + j * (1 << 20) + i
                better = (d < bestd) | ((d == bestd) & (pref > bestp))
                best = np.where(better, cid, best)
                bestd = np.where(better, d, bestd)
                bestp = np.where(better, pref, bestp)
    return best


@pytest.mark.parametrize("res", [0, 2, 5, 7])
def test_assignment_is_voronoi(res):
    rng = np.random.default_rng(res + 1)
    lon = rng.uniform(-179.9, 179.9, 5000)
    lat = rng.uniform(-84.9, 84.9, 5000)
    np.testing.assert_array_equal(H.encode_np(lon, lat, res),
                                  _brute_np(lon, lat, res))


@pytest.mark.parametrize("res", [0, 4, 7])
def test_center_roundtrip_and_neighbors(res):
    rng = np.random.default_rng(res + 10)
    lon = rng.uniform(-170, 170, 2000)
    lat = rng.uniform(-75, 75, 2000)
    cell = H.encode_np(lon, lat, res)
    clon, clat = H.center_np(cell, res)
    np.testing.assert_array_equal(H.encode_np(clon, clat, res), cell)

    dx, dy = H.RES_TABLE[res]
    nb = H.neighbors_np(cell, res)
    assert nb.shape == (len(cell), 6)
    # each neighbor center is at one of the two adjacency distances
    allowed = {4 * dx * dx, dx * dx + dy * dy}
    cx2 = np.rint((clon + 180) * 2e6).astype(np.int64)
    cy2 = np.rint((clat + 85) * 2e6).astype(np.int64)
    for k in range(6):
        nlon, nlat = H.center_np(nb[:, k], res)
        nx2 = np.rint((nlon + 180) * 2e6).astype(np.int64)
        ny2 = np.rint((nlat + 85) * 2e6).astype(np.int64)
        d = (nx2 - cx2) ** 2 + (ny2 - cy2) ** 2
        assert set(np.unique(d)) <= allowed
    # the 6 are distinct and never the cell itself
    assert all(len({*row} - {c}) == 6 for row, c in zip(nb.tolist(), cell.tolist()))


def test_parent_center_within_circumradius():
    rng = np.random.default_rng(3)
    lon = rng.uniform(-170, 170, 3000)
    lat = rng.uniform(-75, 75, 3000)
    child = H.encode_np(lon, lat, 6)
    clon, clat = H.center_np(child, 6)
    parent = H.encode_np(clon, clat, 3)
    plon, plat = H.center_np(parent, 3)
    pdx, pdy = H.RES_TABLE[3]
    # child center lies in the parent's Voronoi cell => within circumradius
    circum2 = (pdx / 1e6) ** 2 + (pdy / 1e6) ** 2  # loose: corner distance
    d2 = (plon - clon) ** 2 + (plat - clat) ** 2
    assert d2.max() <= circum2


@given(st.floats(-179.9, 179.9), st.floats(-84.9, 84.9),
       st.integers(0, H.MAX_RES))
@settings(max_examples=200, deadline=None)
def test_encode_matches_brute_hypothesis(lon, lat, res):
    got = H.encode_np(np.array([lon]), np.array([lat]), res)
    exp = _brute_np(np.array([lon]), np.array([lat]), res)
    assert got[0] == exp[0]


def test_spark_exprs_match_numpy(spark):
    rng = np.random.default_rng(11)
    rows = [(int(i), float(a), float(b)) for i, (a, b) in
            enumerate(zip(rng.uniform(-179.9, 179.9, 600),
                          rng.uniform(-84.9, 84.9, 600)))]
    df = spark.createDataFrame(rows, "id long, lon double, lat double")
    res = 5
    cell = H.hex_cell_expr(F.col("lon"), F.col("lat"), res)
    clon, clat = H.hex_center_expr(cell, res)
    out = (df.select("id", cell.alias("cell"),
                     clon.alias("clon"), clat.alias("clat"),
                     H.hex_parent_expr(cell, res, 2).alias("parent"),
                     H.hex_neighbors_expr(cell, res).alias("nb"))
           .orderBy("id").collect())
    lon = np.array([r[1] for r in rows])
    lat = np.array([r[2] for r in rows])
    exp_cell = H.encode_np(lon, lat, res)
    exp_lon, exp_lat = H.center_np(exp_cell, res)
    exp_parent = H.encode_np(exp_lon, exp_lat, 2)
    exp_nb = H.neighbors_np(exp_cell, res)
    for k, r in enumerate(out):
        assert r["cell"] == exp_cell[k]
        assert r["clon"] == exp_lon[k] and r["clat"] == exp_lat[k]
        assert r["parent"] == exp_parent[k]
        assert r["nb"] == exp_nb[k].tolist()


def test_expr_is_codegen_only(spark):
    """The encode must stay JVM-side: no BatchEvalPython / ArrowEval in
    the plan (scale guard — this runs per row on 10^12-row tables)."""
    df = spark.range(1000).select(
        (F.col("id") % 360 - 180.0).cast("double").alias("lon"),
        (F.col("id") % 170 - 85.0).cast("double").alias("lat"))
    plan = df.select(H.hex_cell_expr(F.col("lon"), F.col("lat"), 4))\
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
