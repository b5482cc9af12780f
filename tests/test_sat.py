"""Distributed summed-area table + O(1) box filter (spatial/sat.py).

Pins (1) the block-decomposed SAT against numpy's double cumsum on
random tiles (non-square grids included), (2) the radius-k box filter
against a brute-force window sum with zeros-outside semantics for
several k including k spanning most of a tile (margin = k+1 — the
exclusive-corner halo width the first draft got wrong), (3) partition
invariance, (4) the k-bounds guard."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm2geojson_spark.spatial.focal import synth_dem_tiles
from osm2geojson_spark.spatial.sat import (
    box_filter_tiles,
    integral_image_tiles,
)

T, TX, TY = 8, 4, 3  # 32x24 raster in 12 tiles


def _rand_value_fn(seed):
    def fn(gx, gy):
        # deterministic pseudo-random int per coord, numpy-broadcastable
        h = (gx * 2654435761 + gy * 40503 + seed) & 0xFFFFFFFF
        return ((h >> 7) ^ h) % 1000 - 300
    return fn


def _full(value_fn, w, h):
    gx = np.arange(w, dtype=np.int64)[None, :]
    gy = np.arange(h, dtype=np.int64)[:, None]
    return np.broadcast_to(
        np.asarray(value_fn(gx, gy), np.int64), (h, w)).copy()


def _collect_grid(df, t):
    return {(r["tx"], r["ty"]): np.array(r["data"], np.int64).reshape(t, t)
            for r in df.collect()}


def _box_reference(a, k):
    h, w = a.shape
    out = np.zeros_like(a)
    for r in range(h):
        for c in range(w):
            out[r, c] = a[max(0, r - k):r + k + 1,
                          max(0, c - k):c + k + 1].sum()
    return out


@pytest.fixture(scope="module")
def tiles(spark):
    return synth_dem_tiles(
        spark, TX, TY, T, value_fn=_rand_value_fn(7)).cache()


@pytest.fixture(scope="module")
def sat(tiles):
    return integral_image_tiles(tiles, T).cache()


def test_integral_matches_numpy(sat):
    full = _full(_rand_value_fn(7), TX * T, TY * T)
    ref = full.cumsum(axis=0).cumsum(axis=1)
    got = _collect_grid(sat, T)
    assert len(got) == TX * TY
    for (tx, ty), g in got.items():
        exp = ref[ty * T:(ty + 1) * T, tx * T:(tx + 1) * T]
        assert (g == exp).all(), (tx, ty)


def test_integral_partition_invariance(spark):
    fn = _rand_value_fn(11)
    base = synth_dem_tiles(spark, TX, TY, T, value_fn=fn)
    a = _collect_grid(integral_image_tiles(base.repartition(1), T), T)
    b = _collect_grid(integral_image_tiles(base.repartition(13), T), T)
    assert a.keys() == b.keys()
    for key in a:
        assert (a[key] == b[key]).all()


@pytest.mark.parametrize("k", [1, 2, 3, T - 1])
def test_box_filter_matches_bruteforce(tiles, sat, k):
    full = _full(_rand_value_fn(7), TX * T, TY * T)
    ref = _box_reference(full, k)
    got = _collect_grid(box_filter_tiles(sat, T, k, TX, TY), T)
    assert len(got) == TX * TY
    for (tx, ty), g in got.items():
        exp = ref[ty * T:(ty + 1) * T, tx * T:(tx + 1) * T]
        assert (g == exp).all(), (k, tx, ty)


def test_box_filter_single_tile(spark):
    # 1x1 grid exercises every border rule at once (all parts absent)
    fn = _rand_value_fn(3)
    tiles = synth_dem_tiles(spark, 1, 1, T, value_fn=fn)
    sat = integral_image_tiles(tiles, T)
    full = _full(fn, T, T)
    for k in (1, T - 1):
        got = _collect_grid(box_filter_tiles(sat, T, k, 1, 1), T)
        assert (got[(0, 0)] == _box_reference(full, k)).all(), k


def test_box_stats_matches_bruteforce(tiles):
    k = 2
    from osm2geojson_spark.spatial.sat import box_stats_tiles

    full = _full(_rand_value_fn(7), TX * T, TY * T)
    h, w = full.shape
    out = {(r["tx"], r["ty"]): (np.array(r["n"]), np.array(r["s1"]),
                                np.array(r["s2"]))
           for r in box_stats_tiles(tiles, T, k, TX, TY).collect()}
    assert len(out) == TX * TY
    for (tx, ty), (n, s1, s2) in out.items():
        for i in range(T * T):
            r, c = ty * T + i // T, tx * T + i % T
            win = full[max(0, r - k):r + k + 1, max(0, c - k):c + k + 1]
            assert n[i] == win.size
            assert s1[i] == win.sum()
            assert s2[i] == (win.astype(np.int64) ** 2).sum()
            assert n[i] * s2[i] - s1[i] ** 2 >= 0  # Cauchy-Schwarz


def test_box_filter_k_guard(sat):
    with pytest.raises(ValueError):
        box_filter_tiles(sat, T, 0, TX, TY)
    with pytest.raises(ValueError):
        box_filter_tiles(sat, T, T, TX, TY)


def test_box_filter_row_count(sat, spark):
    out = box_filter_tiles(sat, T, 2, TX, TY)
    n = out.select(F.sum(F.size("data")).alias("n")).collect()[0]["n"]
    assert n == TX * TY * T * T
