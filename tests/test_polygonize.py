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


def test_moments_match_floodfill_reference(spark):
    # threshold mask with multi-tile blobs; moments vs a python
    # flood-fill over the full raster
    from collections import deque

    import numpy as np

    t, n = 8, 3
    w = t * n

    def fn(gx, gy):
        return (((gx * 7 + gy * 11) % 13) >= 6).astype("int64")

    tiles = synth_dem_tiles(spark, n, n, t, value_fn=fn)
    got = {r["region_id"]: (r["n_cells"], r["sx"], r["sy"], r["sxx"],
                            r["sxy"], r["syy"])
           for r in polygonize(tiles, t, width=w, moments=True)
           .where("value = 1").collect()}

    gx = np.arange(w)[None, :]
    gy = np.arange(w)[:, None]
    fg = np.broadcast_to(fn(gx, gy), (w, w)).astype(bool)
    seen = np.zeros_like(fg)
    exp = {}
    for i in range(w):
        for j in range(w):
            if fg[i, j] and not seen[i, j]:
                q, comp = deque([(i, j)]), []
                seen[i, j] = True
                while q:
                    a, b = q.popleft()
                    comp.append((a, b))
                    for da, db in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                        c, d = a + da, b + db
                        if (0 <= c < w and 0 <= d < w and fg[c, d]
                                and not seen[c, d]):
                            seen[c, d] = True
                            q.append((c, d))
                rid = min(a * w + b for a, b in comp)
                exp[rid] = (len(comp),
                            sum(b for _, b in comp),
                            sum(a for a, _ in comp),
                            sum(b * b for _, b in comp),
                            sum(a * b for a, b in comp),
                            sum(a * a for a, _ in comp))
    assert got == exp


def test_moments_off_schema_unchanged(spark):
    tiles = synth_dem_tiles(spark, 2, 2, 8, value_fn=lambda gx, gy: gx * 0)
    cols = polygonize(tiles, 8, width=16).columns
    assert cols == ["region_id", "value", "n_cells", "min_x", "min_y",
                    "max_x", "max_y"]
