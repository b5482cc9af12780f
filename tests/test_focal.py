"""Tiled-raster focal ops: halo exchange == full-grid reference.

Pins (1) tile-exact equality of the distributed halo-exchange path
against the single-array padded reference for sum/mean/hillshade, (2)
boundary clamp semantics at all four corners/edges, (3) partition
invariance (the halo shuffle is keyed, not positional), (4) hillshade
output range and sensitivity, (5) non-rectangular misuse surfaces the
assemble guard rather than wrong values."""

import numpy as np
import pytest

from osm2geojson_spark.spatial.focal import (
    dem_value_np,
    focal_op,
    focal_reference,
    hillshade_kernel,
    synth_dem_tiles,
)

T, TX, TY = 16, 3, 2


def _full():
    gx = np.arange(TX * T, dtype=np.int64)[None, :]
    gy = np.arange(TY * T, dtype=np.int64)[:, None]
    return dem_value_np(gx, gy)


@pytest.fixture(scope="module")
def tiles(spark):
    return synth_dem_tiles(spark, TX, TY, T).cache()


@pytest.mark.parametrize(
    "op", ["sum3", "mean3", "hillshade", "flowdir8", "min3", "max3"])
def test_halo_exchange_matches_reference(tiles, op):
    out = {(r["tx"], r["ty"]): np.array(r["data"]).reshape(T, T)
           for r in focal_op(tiles, op=op, tile_size=T).collect()}
    assert len(out) == TX * TY
    full = focal_reference(_full(), op=op)
    for (tx, ty), got in out.items():
        exp = full[ty * T:(ty + 1) * T, tx * T:(tx + 1) * T]
        assert (got == exp).all(), (op, tx, ty)


def test_morphology_composition(tiles):
    # opening = dilate(erode(x)); closing = erode(dilate(x)); the
    # composed distributed pipeline (two halo exchanges back-to-back)
    # must equal composing the single-array reference, and the
    # anti-extensive/extensive ordering opening <= x <= closing holds
    full = _full()
    opened_ref = focal_reference(focal_reference(full, "min3"), "max3")
    opened = {(r["tx"], r["ty"]): np.array(r["data"]).reshape(T, T)
              for r in focal_op(focal_op(tiles, op="min3", tile_size=T),
                                op="max3", tile_size=T).collect()}
    for (tx, ty), got in opened.items():
        exp = opened_ref[ty * T:(ty + 1) * T, tx * T:(tx + 1) * T]
        assert (got == exp).all(), (tx, ty)
        assert (got <= full[ty * T:(ty + 1) * T, tx * T:(tx + 1) * T]).all()


def test_partition_invariance(tiles):
    a = {(r["tx"], r["ty"]): tuple(r["data"])
         for r in focal_op(tiles, tile_size=T).collect()}
    b = {(r["tx"], r["ty"]): tuple(r["data"])
         for r in focal_op(tiles.repartition(7), tile_size=T).collect()}
    assert a == b


def test_boundary_is_coordinate_clamp(spark):
    # 1x1 tile grid: every border is a raster boundary; the focal sum
    # must equal evaluating the formula at clamped coordinates
    df = synth_dem_tiles(spark, 1, 1, T)
    (row,) = focal_op(df, op="sum3", tile_size=T).collect()
    got = np.array(row["data"]).reshape(T, T)
    g = dem_value_np(np.arange(T)[None, :], np.arange(T)[:, None])
    exp = np.zeros((T, T), np.int64)
    for y in range(T):
        for x in range(T):
            s = 0
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    s += g[min(max(y + dy, 0), T - 1),
                           min(max(x + dx, 0), T - 1)]
            exp[y, x] = s
    assert (got == exp).all()


def test_hillshade_range_and_sensitivity():
    flat = np.zeros((T + 2, T + 2), np.int64)
    assert (hillshade_kernel(flat) == hillshade_kernel(flat)[0, 0]).all()
    ramp = np.arange(T + 2, dtype=np.int64)[None, :].repeat(T + 2, 0) * 50
    shade = hillshade_kernel(ramp)
    assert shade.min() >= 0 and shade.max() <= 255
    assert not (shade == hillshade_kernel(flat)).all()


def test_bilinear_upsample_matches_reference(tiles):
    # 2x upsample: tile (tx,ty) holds a 2Tx2T block of the full-raster
    # reference (clamped samples at the raster edge, halo in between)
    out = {(r["tx"], r["ty"]): np.array(r["data"]).reshape(2 * T, 2 * T)
           for r in focal_op(tiles, op="bilin2x", tile_size=T).collect()}
    assert len(out) == TX * TY
    full = focal_reference(_full(), op="bilin2x")
    assert full.shape == (2 * TY * T, 2 * TX * T)
    for (tx, ty), got in out.items():
        exp = full[2 * ty * T:2 * (ty + 1) * T, 2 * tx * T:2 * (tx + 1) * T]
        assert (got == exp).all(), (tx, ty)


def test_bilinear_upsample_exact_values():
    # hand-checkable 2x2 (values x4): even/even = 4*sample, odd axes
    # average the two/four neighbors, the far edge replicates (clamp)
    g = np.array([[0, 4], [8, 20]], np.int64)
    out = focal_reference(g, op="bilin2x")
    exp = np.array([
        [0, 8, 16, 16],
        [16, 32, 48, 48],
        [32, 56, 80, 80],
        [32, 56, 80, 80]], np.int64)
    assert (out == exp).all()


def test_unknown_op_raises(tiles):
    with pytest.raises(ValueError, match="op must be"):
        focal_op(tiles, op="median3", tile_size=T)


def test_flowdir_points_downhill(spark):
    # strictly increasing eastward ramp: everything flows WEST (16)
    # except the clamped west edge (pit -> 0)
    df = synth_dem_tiles(spark, 2, 1, T, value_fn=lambda gx, gy: gx * 10)
    out = {(r["tx"], r["ty"]): np.array(r["data"]).reshape(T, T)
           for r in focal_op(df, op="flowdir8", tile_size=T).collect()}
    west = out[(0, 0)]
    assert (west[:, 0] == 0).all()          # raster edge: clamp -> flat
    assert (west[:, 1:] == 16).all()
    assert (out[(1, 0)] == 16).all()        # interior tile: all west


def _py_flow_accum(grid):
    """Walk every cell's unique flow path (clamped D8 targets) and
    count visits — the oracle's recursive-CTE logic in Python."""
    from osm2geojson_spark.spatial.focal import _D8, focal_reference
    h, w = grid.shape
    dirs = focal_reference(grid, op="flowdir8")
    dxy = {code: (dx, dy) for dx, dy, code, _wt in _D8}
    acc = {}
    for y in range(h):
        for x in range(w):
            cx, cy = x, y
            while True:
                acc[cy * w + cx] = acc.get(cy * w + cx, 0) + 1
                d = dirs[cy, cx]
                if d == 0:
                    break
                dx, dy = dxy[int(d)]
                cx = min(max(cx + dx, 0), w - 1)
                cy = min(max(cy + dy, 0), h - 1)
    return acc


def test_flow_accumulation_matches_path_walk(tiles):
    from osm2geojson_spark.spatial.focal import flow_accumulation, focal_op
    dirs = focal_op(tiles, op="flowdir8", tile_size=T)
    got = {r["cell"]: r["acc"] for r in
           flow_accumulation(dirs, T, TX * T, TY * T).collect()}
    assert got == _py_flow_accum(_full())


def test_flow_accumulation_ramp(spark):
    from osm2geojson_spark.spatial.focal import flow_accumulation, focal_op
    df = synth_dem_tiles(spark, 2, 1, T, value_fn=lambda gx, gy: gx * 10)
    dirs = focal_op(df, op="flowdir8", tile_size=T)
    got = {r["cell"]: r["acc"] for r in
           flow_accumulation(dirs, T, 2 * T, T).collect()}
    w = 2 * T
    for y in range(T):
        assert got[y * w + 0] == w          # pit collects the row
        for x in range(1, w):
            assert got[y * w + x] == w - x  # pure westward chain


def _py_basins(grid):
    """Follow every cell's unique flow path to its pit — the sequential
    twin of the pointer-doubling watershed."""
    from osm2geojson_spark.spatial.focal import _D8, focal_reference
    h, w = grid.shape
    dirs = focal_reference(grid, op="flowdir8")
    dxy = {code: (dx, dy) for dx, dy, code, _wt in _D8}
    out = {}
    for y in range(h):
        for x in range(w):
            cx, cy = x, y
            while dirs[cy, cx] != 0:
                dx, dy = dxy[int(dirs[cy, cx])]
                cx = min(max(cx + dx, 0), w - 1)
                cy = min(max(cy + dy, 0), h - 1)
            out[y * w + x] = cy * w + cx
    return out


def test_watershed_matches_path_walk(tiles):
    from osm2geojson_spark.spatial.focal import focal_op, watershed_basins
    dirs = focal_op(tiles, op="flowdir8", tile_size=T)
    got = {r["cell"]: r["basin"] for r in
           watershed_basins(dirs, T, TX * T, TY * T).collect()}
    assert got == _py_basins(_full())


def test_watershed_ramp_basins(spark):
    # eastward ramp: every row drains to its west-edge pit
    from osm2geojson_spark.spatial.focal import focal_op, watershed_basins
    df = synth_dem_tiles(spark, 2, 1, T, value_fn=lambda gx, gy: gx * 10)
    dirs = focal_op(df, op="flowdir8", tile_size=T)
    got = {r["cell"]: r["basin"] for r in
           watershed_basins(dirs, T, 2 * T, T).collect()}
    w = 2 * T
    assert got == {y * w + x: y * w for y in range(T) for x in range(w)}


def test_watershed_divergence_guard(spark):
    from osm2geojson_spark.spatial.focal import focal_op, watershed_basins
    df = synth_dem_tiles(spark, 2, 1, T, value_fn=lambda gx, gy: gx * 10)
    dirs = focal_op(df, op="flowdir8", tile_size=T)
    with pytest.raises(RuntimeError, match="converge"):
        # longest path is 2T-1 = 31 cells; 2^2 doubling rounds cover
        # only 2^2 hops -> must raise, not return wrong labels
        watershed_basins(dirs, T, 2 * T, T, max_pow=2).collect()


def _py_strahler(grid):
    from osm2geojson_spark.spatial.focal import _D8, focal_reference
    h, w = grid.shape
    dirs = focal_reference(grid, op="flowdir8")
    dxy = {code: (dx, dy) for dx, dy, code, _wt in _D8}
    children = {}
    for y in range(h):
        for x in range(w):
            d = int(dirs[y, x])
            if d:
                dx, dy = dxy[d]
                nx = min(max(x + dx, 0), w - 1)
                ny = min(max(y + dy, 0), h - 1)
                children.setdefault(ny * w + nx, []).append(y * w + x)
    order = {}

    def compute(cell):
        stack = [cell]
        while stack:
            c = stack[-1]
            if c in order:
                stack.pop()
                continue
            kids = children.get(c, ())
            todo = [k for k in kids if k not in order]
            if todo:
                stack.extend(todo)
                continue
            if not kids:
                order[c] = 1
            else:
                m = max(order[k] for k in kids)
                cnt = sum(1 for k in kids if order[k] == m)
                order[c] = m + 1 if cnt >= 2 else m
            stack.pop()

    for cell in range(h * w):
        compute(cell)
    return order


def test_strahler_matches_reference(tiles):
    from osm2geojson_spark.spatial.focal import focal_op, strahler_order
    dirs = focal_op(tiles, op="flowdir8", tile_size=T)
    got = {r["cell"]: r["strahler"] for r in
           strahler_order(dirs, T, TX * T, TY * T).collect()}
    assert got == _py_strahler(_full())


def test_strahler_chain_is_order_one(spark):
    # a pure chain (eastward ramp rows) never branches: order 1 all along
    from osm2geojson_spark.spatial.focal import focal_op, strahler_order
    df = synth_dem_tiles(spark, 2, 1, T, value_fn=lambda gx, gy: gx * 10)
    dirs = focal_op(df, op="flowdir8", tile_size=T)
    got = {r["cell"]: r["strahler"] for r in
           strahler_order(dirs, T, 2 * T, T).collect()}
    assert set(got.values()) == {1}


def test_cost_distance_matches_dijkstra(spark):
    from osm2geojson_spark import pyref
    from osm2geojson_spark.spatial.focal import cost_distance, synth_dem_tiles

    tiles = synth_dem_tiles(spark, 2, 2, 8)
    got = sorted((r["node_id"], r["dist"]) for r in
                 cost_distance(tiles, 8, 16, 16, source=5).collect())
    assert got == pyref.ref_cost_distance(16, 5)


def test_cost_edges_symmetric_weights(spark):
    from osm2geojson_spark.spatial.focal import cost_edges, synth_dem_tiles

    tiles = synth_dem_tiles(spark, 1, 1, 8)
    e = {(r["src"], r["dst"]): r["w"]
         for r in cost_edges(tiles, 8, 8, 8).collect()}
    # corner cell 0 has exactly 3 neighbors; every edge has a reverse
    # with the same weight (the cost sum is symmetric)
    assert sum(1 for (s, _d) in e if s == 0) == 3
    assert all(e[(d, s)] == w for (s, d), w in e.items())
    # interior count: 8 per cell
    assert sum(1 for (s, _d) in e if s == 9) == 8


def test_raster_pyramid_matches_reference(spark):
    from osm2geojson_spark import pyref
    from osm2geojson_spark.spatial.focal import raster_pyramid, synth_dem_tiles

    tiles = synth_dem_tiles(spark, 4, 4, 8)
    pyr = raster_pyramid(tiles, 8, levels=2)
    got = []
    for r in pyr.collect():
        t = 8
        a = np.array(r["data"], np.int64).reshape(t, t)
        for y in range(t):
            for x in range(t):
                got.append((r["level"], r["tx"] * t + x, r["ty"] * t + y,
                            int(a[y, x])))
    assert sorted(got) == sorted(pyref.ref_raster_pyramid(32, 2))


def test_raster_pyramid_ragged_raises(spark):
    from osm2geojson_spark.spatial.focal import raster_pyramid, synth_dem_tiles

    tiles = synth_dem_tiles(spark, 3, 3, 8)
    with pytest.raises(Exception, match="ragged"):
        raster_pyramid(tiles, 8, levels=1).collect()


def test_mode3_matches_reference_and_tie_rule(spark):
    # quantized raster gives real majorities; reference recomputes
    # the (count desc, value asc) rule per pixel in plain python
    def q_fn(gx, gy):
        return dem_value_np(gx, gy) // 20

    tiles = synth_dem_tiles(spark, TX, TY, T, value_fn=q_fn)
    got = {(r["tx"], r["ty"]): np.array(r["data"]).reshape(T, T)
           for r in focal_op(tiles, op="mode3", tile_size=T).collect()}
    gx = np.arange(TX * T, dtype=np.int64)[None, :]
    gy = np.arange(TY * T, dtype=np.int64)[:, None]
    full = np.broadcast_to(q_fn(gx, gy), (TY * T, TX * T))
    p = np.pad(full, 1, mode="edge")
    h, w = full.shape
    for ty in range(TY):
        for tx in range(TX):
            g = got[(tx, ty)]
            for r in range(T):
                for c in range(T):
                    y, x = ty * T + r, tx * T + c
                    vals = sorted(p[y:y + 3, x:x + 3].ravel().tolist())
                    best = min(vals, key=lambda v: (-vals.count(v), v))
                    assert g[r, c] == best, (x, y)


def test_mode3_value_bound_guard(spark):
    big = synth_dem_tiles(spark, 1, 1, 4,
                          value_fn=lambda gx, gy: gx * 0 + (1 << 32))
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException
    with _pytest.raises((PythonException, Py4JJavaError)):
        focal_op(big, op="mode3", tile_size=4).collect()
