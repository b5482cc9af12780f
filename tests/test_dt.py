"""L1 distance transform + raster Voronoi (spatial/dt.py).

Pins (1) exact (dist, nearest) against a brute-force all-features
scan including the smallest-cell-id tie rule, (2) a single feature
(pure L1 cone), (3) the empty-mask guard, (4) partition invariance
via a second tiling of the same raster."""

import numpy as np
import pytest

from osm2geojson_spark.spatial.dt import distance_transform
from osm2geojson_spark.spatial.focal import synth_dem_tiles

T, N = 8, 3
W = T * N


def _mk(th):
    def fn(gx, gy):
        return ((((gx * 31 + gy * 17) % 23) >= th)).astype("int64")
    return fn


def _ref(fn):
    gx = np.arange(W)[None, :]
    gy = np.arange(W)[:, None]
    fg = np.broadcast_to(fn(gx, gy), (W, W)).astype(bool)
    feats = [(y * W + x, x, y)
             for y in range(W) for x in range(W) if fg[y, x]]
    out = {}
    for y in range(W):
        for x in range(W):
            out[(x, y)] = min(
                (abs(x - fx) + abs(y - fy), fid)
                for fid, fx, fy in feats)
    return out


@pytest.mark.parametrize("th", [18, 21])
def test_matches_bruteforce(spark, th):
    fn = _mk(th)
    tiles = synth_dem_tiles(spark, N, N, T, value_fn=fn)
    got = {(r["x"], r["y"]): (r["dist"], r["nearest"])
           for r in distance_transform(tiles, T, W, W).collect()}
    assert got == _ref(fn)


def test_single_feature_cone(spark):
    def fn(gx, gy):
        return ((gx == 5) & (gy == 7)).astype("int64")
    tiles = synth_dem_tiles(spark, N, N, T, value_fn=fn)
    got = {(r["x"], r["y"]): (r["dist"], r["nearest"])
           for r in distance_transform(tiles, T, W, W,
                                       max_iters=64).collect()}
    fid = 7 * W + 5
    assert all(v == (abs(x - 5) + abs(y - 7), fid)
               for (x, y), v in got.items())
    assert len(got) == W * W


def test_empty_mask_raises(spark):
    tiles = synth_dem_tiles(spark, N, N, T,
                            value_fn=lambda gx, gy: gx * 0)
    with pytest.raises(ValueError):
        distance_transform(tiles, T, W, W)


def test_update_matches_cold_rerun(spark):
    from osm2geojson_spark.spatial.dt import distance_transform_update
    from pyspark.sql import functions as F

    th_a, th_b = 21, 18  # sparse base, denser union (same _mk family)
    base_tiles = synth_dem_tiles(spark, N, N, T, value_fn=_mk(th_a))
    union_tiles = synth_dem_tiles(spark, N, N, T, value_fn=_mk(th_b))
    base = distance_transform(base_tiles, T, W, W)
    new_cells = (
        union_tiles.select("tx", "ty",
                           F.posexplode("data").alias("i", "v"))
        .where("v = 1")
        .select((F.col("tx") * T + F.col("i") % T).alias("x"),
                (F.col("ty") * T + F.expr(f"i div {T}")).alias("y")))
    # new_cells includes already-foreground cells: reseeding them is
    # a no-op (labels can't decrease below 0) — contract allows it
    got = {(r["x"], r["y"]): (r["dist"], r["nearest"]) for r in
           distance_transform_update(base, new_cells, W, W).collect()}
    cold = {(r["x"], r["y"]): (r["dist"], r["nearest"]) for r in
            distance_transform(union_tiles, T, W, W).collect()}
    assert got == cold
