"""Heatmap tile rendering (spatial/heatmap.py): decodable PNG output,
hand-computed pixels, pyref twin, partition invariance."""

from __future__ import annotations

import numpy as np
import pytest

from osm2geojson_spark.spatial.heatmap import heatmap_tiles
from osm2geojson_spark.synth.images import decode_png

SCHEMA = "lon double, lat double"


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
        heatmap_tiles(df, res=10, tile_px=64)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
