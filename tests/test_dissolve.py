"""Rectilinear union area: strip-sweep engine vs brute-force pixel
rasterization, plus overlap/containment/degenerate edge cases."""

import numpy as np
import pytest

from osm2geojson_spark.spatial.dissolve import union_area


def _ua(spark, rows, **kw):
    df = spark.createDataFrame(
        rows, "group_id long, x1 long, y1 long, x2 long, y2 long")
    return {r["group_id"]: (r["n_boxes"], r["union_area"])
            for r in union_area(df, **kw).collect()}


def _brute(rows):
    out = {}
    for g in {r[0] for r in rows}:
        grid = np.zeros((600, 600), bool)
        n = 0
        for (gg, x1, y1, x2, y2) in rows:
            if gg == g and x1 < x2 and y1 < y2:
                grid[y1:y2, x1:x2] = True
                n += 1
        if n:
            out[g] = (n, int(grid.sum()))
    return out


def test_disjoint_overlap_contained(spark):
    rows = [
        (0, 0, 0, 10, 10), (0, 20, 20, 30, 30),      # disjoint: 200
        (1, 0, 0, 10, 10), (1, 5, 5, 15, 15),        # overlap: 175
        (2, 0, 0, 20, 20), (2, 5, 5, 10, 10),        # contained: 400
    ]
    got = _ua(spark, rows)
    assert got == {0: (2, 200), 1: (2, 175), 2: (2, 400)}


def test_degenerate_boxes_dropped(spark):
    rows = [(0, 0, 0, 10, 10), (0, 5, 5, 5, 20), (0, 3, 7, 9, 7)]
    assert _ua(spark, rows) == {0: (1, 100)}


def test_matches_bruteforce_random(spark):
    rng = np.random.RandomState(11)
    rows = []
    for i in range(300):
        g = int(rng.randint(0, 5))
        x1, y1 = int(rng.randint(0, 500)), int(rng.randint(0, 500))
        rows.append((g, x1, y1, x1 + int(rng.randint(1, 80)),
                     y1 + int(rng.randint(1, 80))))
    assert _ua(spark, rows) == _brute(rows)


def test_identical_boxes_counted_once(spark):
    rows = [(0, 2, 3, 12, 13)] * 7
    assert _ua(spark, rows) == {0: (7, 100)}


def test_group_cap_guard(spark):
    rows = [(0, i, 0, i + 2, 5) for i in range(50)]
    with pytest.raises(ValueError, match="max_group_boxes"):
        _ua(spark, rows, max_group_boxes=10)
    assert _ua(spark, rows, max_group_boxes=100)[0][1] == 5 * 51
