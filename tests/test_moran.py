from __future__ import annotations

import numpy as np

from osm2geojson_spark.spatial.autocorr import moran_zone_stats
from osm2geojson_spark.spatial.focal import synth_dem_tiles


def np_moran_components(grid: np.ndarray) -> tuple:
    """Whole-array reference on ONE zone: direct mean-centered float
    Moran plus the integer power sums the operator reports."""
    g = grid.astype(np.int64)
    n = g.size
    s = int(g.sum())
    q = int((g * g).sum())
    e_xy = int((g[:, :-1] * g[:, 1:]).sum()) + int((g[:-1] * g[1:]).sum())
    deg = np.full(g.shape, 4, np.int64)
    deg[0, :] -= 1
    deg[-1, :] -= 1
    deg[:, 0] -= 1
    deg[:, -1] -= 1
    e_dx = int((deg * g).sum())
    w = int(deg.sum())
    e_d2 = int(((g[:, :-1] - g[:, 1:]) ** 2).sum()) \
        + int(((g[:-1] - g[1:]) ** 2).sum())
    num = n * n * 2 * e_xy - 2 * n * s * e_dx + s * s * w
    den = n * (n * q - s * s)
    return n, s, q, e_xy, e_dx, w, num, den, e_d2


def test_single_zone_matches_numpy(spark):
    t, nt = 16, 2
    tiles = synth_dem_tiles(spark, nt, nt, t)
    rows = moran_zone_stats(tiles, t, zone_tiles=nt).collect()
    assert len(rows) == 1
    r = rows[0]
    # rebuild the full raster from the same closed-form formula
    gx = np.arange(t * nt, dtype=np.int64)[None, :]
    gy = np.arange(t * nt, dtype=np.int64)[:, None]
    g = (gx * 73 + gy * 19) % 100 + (gx * gx + 3 * gy * gy) % 7
    n, s, q, e_xy, e_dx, w, num, den, e_d2 = np_moran_components(g)
    assert (r["n"], r["s"], r["q"], r["e_xy"], r["e_dx"], r["w"],
            r["e_d2"]) == (n, s, q, e_xy, e_dx, w, e_d2)
    assert int(r["num"]) == num and int(r["den"]) == den
    # ppm truncation toward zero, same as both engines
    want_ppm = int(1_000_000 * n * num / (w * den)) if num >= 0 else \
        -(-1_000_000 * n * num // (w * den))
    assert r["moran_ppm"] == want_ppm
    assert r["geary_ppm"] == 1_000_000 * (n - 1) * n * n * e_d2 // (w * den)


def test_zone_split_excludes_cross_zone_edges(spark):
    t = 16
    tiles = synth_dem_tiles(spark, 4, 4, t)
    rows = moran_zone_stats(tiles, t, zone_tiles=2).collect()
    assert len(rows) == 4
    gx = np.arange(64, dtype=np.int64)[None, :]
    gy = np.arange(64, dtype=np.int64)[:, None]
    g = (gx * 73 + gy * 19) % 100 + (gx * gx + 3 * gy * gy) % 7
    for r in rows:
        zx, zy = r["zone_x"], r["zone_y"]
        sub = g[zy * 32:(zy + 1) * 32, zx * 32:(zx + 1) * 32]
        n, s, q, e_xy, e_dx, w, num, den, e_d2 = np_moran_components(sub)
        assert (r["e_xy"], r["e_dx"], r["w"], r["e_d2"]) == \
            (e_xy, e_dx, w, e_d2), (zx, zy)
        assert int(r["num"]) == num and int(r["den"]) == den


def test_smooth_gradient_is_strongly_positive(spark):
    # a plane has near-perfect positive autocorrelation
    tiles = synth_dem_tiles(spark, 2, 2, 16,
                            value_fn=lambda gx, gy: gx + gy)
    r = moran_zone_stats(tiles, 16, zone_tiles=2).collect()[0]
    assert r["moran_ppm"] > 900_000
    assert 0 <= r["geary_ppm"] < 100_000   # Geary ≈ 0 on a smooth plane


def test_checkerboard_is_strongly_negative(spark):
    tiles = synth_dem_tiles(spark, 2, 2, 16,
                            value_fn=lambda gx, gy: (gx + gy) % 2 * 100)
    r = moran_zone_stats(tiles, 16, zone_tiles=2).collect()[0]
    assert r["moran_ppm"] < -900_000
    assert r["geary_ppm"] > 1_900_000      # Geary ≈ 2 on a checkerboard
