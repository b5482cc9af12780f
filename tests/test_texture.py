"""GLCM co-occurrence counts (spatial/texture.py) vs numpy reference.

Pins (1) both directions' count matrices exactly on random tiles
(cross-tile-boundary pairs included — the halo's whole job), (2)
total pair counts = (W-1)·H and W·(H-1), (3) clamping of
out-of-range values, (4) partition invariance, (5) guards."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm2geojson_spark.spatial.focal import synth_dem_tiles
from osm2geojson_spark.spatial.texture import glcm_tiles

T, TX, TY = 8, 3, 2
LV, LO, HI = 6, 10, 250


def _make_fn():
    def fn(gx, gy):
        h = (gx * 40503 + gy * 2654435761 + 5) & 0xFFFFFFFF
        return ((h >> 3) ^ h) % 300  # some values exceed HI → clamp
    return fn


def _ref():
    gx = np.arange(TX * T, dtype=np.int64)[None, :]
    gy = np.arange(TY * T, dtype=np.int64)[:, None]
    full = np.broadcast_to(_make_fn()(gx, gy), (TY * T, TX * T))
    q = np.clip((full - LO) * LV // (HI - LO + 1), 0, LV - 1)
    out = {}
    for d, (a, b) in enumerate(((q[:, :-1], q[:, 1:]),
                                (q[:-1, :], q[1:, :]))):
        cnt = np.bincount((a * LV + b).ravel(), minlength=LV * LV)
        for i in np.nonzero(cnt)[0]:
            out[(d, int(i) // LV, int(i) % LV)] = int(cnt[i])
    return out


@pytest.fixture(scope="module")
def tiles(spark):
    return synth_dem_tiles(spark, TX, TY, T, value_fn=_make_fn()).cache()


def test_matches_reference(tiles):
    got = {(r["dir"], r["la"], r["lb"]): r["cnt"]
           for r in glcm_tiles(tiles, T, TX, TY, LV, LO, HI).collect()}
    assert got == _ref()


def test_totals(tiles):
    w, h = TX * T, TY * T
    tot = {r["dir"]: r["s"] for r in
           glcm_tiles(tiles, T, TX, TY, LV, LO, HI)
           .groupBy("dir").agg(F.sum("cnt").alias("s")).collect()}
    assert tot == {0: (w - 1) * h, 1: w * (h - 1)}


def test_partition_invariance(spark):
    base = synth_dem_tiles(spark, TX, TY, T, value_fn=_make_fn())
    a = {(r["dir"], r["la"], r["lb"]): r["cnt"] for r in
         glcm_tiles(base.repartition(1), T, TX, TY, LV, LO, HI).collect()}
    b = {(r["dir"], r["la"], r["lb"]): r["cnt"] for r in
         glcm_tiles(base.repartition(9), T, TX, TY, LV, LO, HI).collect()}
    assert a == b


def test_guards(tiles):
    with pytest.raises(ValueError):
        glcm_tiles(tiles, T, TX, TY, levels=1)
    with pytest.raises(ValueError):
        glcm_tiles(tiles, T, TX, TY, lo=10, hi=9)


def test_edge_histogram_matches_reference(spark):
    import numpy as np

    from osm2geojson_spark.spatial.texture import edge_orientation_hist

    fn = _make_fn()
    tiles = synth_dem_tiles(spark, TX, TY, T, value_fn=fn)
    got = {r["sector"]: (r["n"], r["mag2_sum"]) for r in
           edge_orientation_hist(tiles, T, TX, TY).collect()}

    w, h = TX * T, TY * T
    gx_ = np.arange(w)[None, :]
    gy_ = np.arange(h)[:, None]
    full = np.broadcast_to(fn(gx_, gy_), (h, w)).astype(np.int64)
    p = np.pad(full, 1, mode="edge")
    gx = p[1:-1, 2:] - p[1:-1, :-2]
    gy = p[2:, 1:-1] - p[:-2, 1:-1]
    ax, ay = np.abs(gx), np.abs(gy)
    sector = np.select(
        [(gx == 0) & (gy == 0),
         (gy >= 0) & (gx > 0) & (ay < ax),
         (gy >= 0) & (gx > 0),
         (gy >= 0) & (gx == 0),
         (gy >= 0) & (ay >= ax),
         (gy >= 0),
         (gy < 0) & (gx < 0) & (ay < ax),
         (gy < 0) & (gx < 0),
         (gy < 0) & (gx == 0),
         (gy < 0) & (ay >= ax)],
        [8, 0, 1, 2, 2, 3, 4, 5, 6, 6], default=7).ravel()
    mag2 = (gx * gx + gy * gy).ravel()
    exp = {}
    for s_ in range(9):
        m = sector == s_
        if m.any():
            exp[s_] = (int(m.sum()), int(mag2[m].sum()))
    assert got == exp
    assert sum(v[0] for v in got.values()) == w * h


def test_harris_matches_reference(spark):
    import numpy as np

    from osm2geojson_spark.spatial.texture import harris_response

    fn = _make_fn()
    tiles = synth_dem_tiles(spark, TX, TY, T, value_fn=fn)
    got = {(r["x"], r["y"]): (r["sxx"], r["syy"], r["sxy"], r["resp"])
           for r in harris_response(tiles, T, TX, TY).collect()}

    w, h = TX * T, TY * T
    gx_ = np.arange(w)[None, :]
    gy_ = np.arange(h)[:, None]
    full = np.broadcast_to(fn(gx_, gy_), (h, w)).astype(np.int64)
    p = np.pad(full, 2, mode="edge")
    gx = p[1:-1, 2:] - p[1:-1, :-2]   # (h+2, w+2): pixel ±1 region
    gy = p[2:, 1:-1] - p[:-2, 1:-1]

    def box3(a):
        s = np.zeros((h, w), dtype=np.int64)
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                s += a[dy:dy + h, dx:dx + w]
        return s

    sxx, syy, sxy = box3(gx * gx), box3(gy * gy), box3(gx * gy)
    resp = 20 * (sxx * syy - sxy * sxy) - (sxx + syy) ** 2
    exp = {(x, y): (int(sxx[y, x]), int(syy[y, x]), int(sxy[y, x]),
                    int(resp[y, x]))
           for y in range(1, h - 1) for x in range(1, w - 1)}
    assert got == exp
    # a flat raster has resp == 0 everywhere; this one must not
    assert any(v[3] != 0 for v in got.values())
