"""Heatmap tile rendering (spatial/heatmap.py): decodable PNG output,
hand-computed pixels, pyref twin, partition invariance."""

from __future__ import annotations

import numpy as np
import pytest

from osm2geojson_spark.spatial.heatmap import heatmap_tiles
from osm2geojson_spark.synth.images import decode_png

SCHEMA = "lon double, lat double"
SF = "/root/testdata/sf0.001"


def _pt(ix, iy, pix_res):
    n = 1 << pix_res
    return (-180.0 + (ix + 0.5) * 360.0 / n,
            -90.0 + (iy + 0.5) * 180.0 / n)


def test_hand_pixels(spark):
    # res 1, tile_px 4 -> pixel grid res 3; all points in tile (0,0):
    # 2 hits on pixel (1,2), 1 hit on pixel (3,0)
    rows = [_pt(1, 2, 3), _pt(1, 2, 3), _pt(3, 0, 3)]
    out = heatmap_tiles(spark.createDataFrame(rows, SCHEMA),
                        res=1, tile_px=4).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_pts == 3
    px = decode_png(bytes(r.png))
    assert px.shape == (4, 4, 3)
    assert (px[:, :, 0] == px[:, :, 1]).all()  # grayscale
    want = np.zeros((4, 4), dtype=np.uint8)
    want[2, 1] = 255                # max pixel
    want[0, 3] = (1 * 255) // 2     # 127
    assert (px[:, :, 0] == want).all()


def test_matches_pyref_and_partition_invariance(spark):
    import random

    from osm2geojson_spark.pyref import ref_heatmap

    rng = random.Random(5)
    rows = [(rng.uniform(-180, 180), rng.uniform(-90, 90))
            for _ in range(3000)]
    want = {t: (n, h) for t, n, h in ref_heatmap(rows, res=2, tile_px=16)}

    def run(df):
        return {r.tile: (r.n_pts, bytes(r.png).hex().upper())
                for r in heatmap_tiles(df, res=2, tile_px=16).collect()}

    df = spark.createDataFrame(rows, SCHEMA)
    got = run(df)
    assert got == want                      # counts AND png bytes
    assert run(df.repartition(13)) == got   # layout-independent


def test_rejects_bad_params(spark):
    df = spark.createDataFrame([(0.0, 0.0)], SCHEMA)
    with pytest.raises(ValueError):
        heatmap_tiles(df, res=3, tile_px=48)
    with pytest.raises(ValueError):
        heatmap_tiles(df, res=21, tile_px=64)  # 21 + 6 > MAX_RES 26


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_overview_hand_quadrants(spark):
    from osm2geojson_spark.spatial.heatmap import heatmap_tiles, overview_tiles
    from osm2geojson_spark.synth.images import decode_png

    # 4 sibling res-2 tiles (children of parent 0): one bright pixel each
    # at a known position; res 2 + 64px -> pix_res 8
    n = 1 << 8
    def cell_pt(ix, iy):
        # center of pixel (ix, iy) at pix_res 8
        return ((ix + 0.5) / n * 360.0 - 180.0, (iy + 0.5) / n * 180.0 - 90.0)
    pts = []
    # child (qx,qy): tile = qy*2+qx; put 1 ping at its pixel (2*qx, 2*qy)
    for qx in (0, 1):
        for qy in (0, 1):
            px_global = qx * 64 + 2 * qx
            py_global = qy * 64 + 2 * qy
            pts.append(cell_pt(px_global, py_global))
    df = spark.createDataFrame(pts, "lon double, lat double")
    leaf = heatmap_tiles(df, res=2, tile_px=64)
    out = overview_tiles(leaf).collect()
    mine = [r for r in out if r.tile == 0]
    assert len(mine) == 1 and mine[0].n_children == 4 and mine[0].n_pts == 4
    img = decode_png(bytes(mine[0].png))
    # each child's 255-pixel lands at parent (qy*32 + y//2, qx*32 + x//2)
    # with 2x2 averaging: 255//4 = 63 (other 3 pool pixels are 0)
    for qx in (0, 1):
        for qy in (0, 1):
            yy = qy * 32 + qy  # (2*qy)//2 == qy
            xx = qx * 32 + qx
            assert img[yy, xx, 0] == 63, (qx, qy, img[yy, xx])
    assert int(img.astype("int64").sum()) == 63 * 3 * 4


def test_overview_matches_pyref(spark):
    from osm2geojson_spark import pyref
    from osm2geojson_spark.queries import q_heatmap_pyramid

    got = sorted(
        (r.tile, r.n_children, r.n_pts, r.png_hex)
        for r in q_heatmap_pyramid(spark, SF).collect())
    ev = [r.event_id for r in
          spark.read.parquet(f"{SF}/events.parquet").collect()]
    from osm2geojson_spark.queries import _py_lat, _py_lon
    want = pyref.ref_heatmap_overview(
        [(_py_lon(k), _py_lat(k)) for k in ev], res=3, tile_px=64)
    assert got == want and len(got) == 16
