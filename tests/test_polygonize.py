from __future__ import annotations

import numpy as np

from osm2geojson_spark.pyref import ref_polygonize
from osm2geojson_spark.spatial.focal import synth_dem_tiles
from osm2geojson_spark.spatial.polygonize import (
    label_equal_components,
    polygonize,
)


def test_local_labeling_serpentine_converges():
    # a serpentine of one value — worst-case propagation distance for
    # the fixpoint loop (snake diameter ≈ the whole cell count)
    a = np.ones((9, 9), np.int64)
    for r in range(0, 9, 2):
        a[r, :] = 0
    for r in range(1, 9, 2):
        a[r, 8 if (r // 2) % 2 == 0 else 0] = 0
    lab = label_equal_components(a)
    assert len(np.unique(lab[a == 0])) == 1      # one connected snake
    assert len(np.unique(lab[a == 1])) == 4      # four cut-off strips


def run_both(spark, value_fn, t, nt):
    tiles = synth_dem_tiles(spark, nt, nt, t, value_fn=value_fn)
    got = sorted(
        tuple(r) for r in polygonize(tiles, t, width=t * nt)
        .select("region_id", "value", "n_cells", "min_x", "min_y",
                "max_x", "max_y").collect())
    w = t * nt
    gx = np.arange(w, dtype=np.int64)[None, :]
    gy = np.arange(w, dtype=np.int64)[:, None]
    vals = np.broadcast_to(np.asarray(value_fn(gx, gy), np.int64), (w, w))
    want = sorted(ref_polygonize(vals))
    assert got == want
    return got


def test_blocks_match_bfs_reference(spark):
    got = run_both(
        spark, lambda gx, gy: ((gx // 5) * 3 + (gy // 7) * 5) % 4, 16, 3)
    # 5×7 blocks straddle the 16-px tile grid: seam stitching is real
    assert any(r[3] // 16 != r[5] // 16 for r in got)


def test_fine_pattern_mostly_singletons(spark):
    run_both(spark, lambda gx, gy: (gx * 73 + gy * 19) % 97, 8, 2)


def test_constant_raster_is_one_region(spark):
    tiles = synth_dem_tiles(spark, 3, 3, 8, value_fn=lambda gx, gy: gx * 0)
    rows = polygonize(tiles, 8, width=24).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["region_id"], r["n_cells"]) == (0, 24 * 24)
    assert (r["min_x"], r["min_y"], r["max_x"], r["max_y"]) == (0, 0, 23, 23)
