from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm2geojson_spark.spatial.focal import synth_dem_tiles
from osm2geojson_spark.spatial.viewshed import viewshed


def brute_viewshed(g: np.ndarray, ox: int, oy: int, h: int,
                   r: int) -> dict[tuple[int, int], int]:
    """Plain-python R3 reference: same nearest-cell sampling and exact
    integer slope cross-multiplication, written loop-style."""
    eo = int(g[oy, ox]) + h
    out = {}
    hh, ww = g.shape
    for y in range(max(0, oy - r), min(hh, oy + r + 1)):
        for x in range(max(0, ox - r), min(ww, ox + r + 1)):
            if (x, y) == (ox, oy):
                continue
            dx, dy = x - ox, y - oy
            adx, ady = abs(dx), abs(dy)
            delta = max(adx, ady)
            et = int(g[y, x])
            vis = 1
            for k in range(1, delta):
                if adx >= ady:
                    sx = ox + k * (1 if dx > 0 else -1)
                    sy = (2 * oy * adx + 2 * k * dy + adx) // (2 * adx)
                else:
                    sy = oy + k * (1 if dy > 0 else -1)
                    sx = (2 * ox * ady + 2 * k * dx + ady) // (2 * ady)
                if (int(g[sy, sx]) - eo) * delta >= (et - eo) * k:
                    vis = 0
                    break
            out[(x, y)] = vis
    return out


def cells_df(spark, g: np.ndarray):
    import pandas as pd

    hh, ww = g.shape
    yy, xx = np.mgrid[0:hh, 0:ww]
    return spark.createDataFrame(pd.DataFrame({
        "x": xx.ravel().astype("int64"), "y": yy.ravel().astype("int64"),
        "e": g.ravel().astype("int64")})).repartition(8)


def test_matches_bruteforce_on_dem(spark):
    gx = np.arange(48, dtype=np.int64)[None, :]
    gy = np.arange(48, dtype=np.int64)[:, None]
    g = np.broadcast_to(
        (gx * 73 + gy * 19) % 100 + (gx * gx + 3 * gy * gy) % 7,
        (48, 48)).copy()
    got = {(r["x"], r["y"]): r["visible"]
           for r in viewshed(cells_df(spark, g), 24, 24, 5, 14).collect()}
    assert got == brute_viewshed(g, 24, 24, 5, 14)


def test_wall_shadows_exactly_behind_it(spark):
    g = np.zeros((21, 21), np.int64)
    g[:, 14] = 100                    # a wall east of the observer
    got = {(r["x"], r["y"]): r["visible"]
           for r in viewshed(cells_df(spark, g), 10, 10, 2, 10).collect()}
    # due-east ray: wall cell itself visible, everything past it hidden
    assert got[(14, 10)] == 1
    assert got[(15, 10)] == 0 and got[(20, 10)] == 0
    # west side is flat ground seen from 2 above: fully visible
    assert all(got[(x, 10)] == 1 for x in range(0, 10))
    assert got == brute_viewshed(g, 10, 10, 2, 10)


def test_flat_ground_fully_visible(spark):
    g = np.full((15, 15), 7, np.int64)
    rows = viewshed(cells_df(spark, g), 7, 7, 1, 7).collect()
    assert len(rows) == 15 * 15 - 1
    assert all(r["visible"] == 1 for r in rows)


def test_missing_observer_raises(spark):
    g = np.zeros((4, 4), np.int64)
    with pytest.raises(ValueError):
        viewshed(cells_df(spark, g), 99, 99, 1, 2)
