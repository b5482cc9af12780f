"""Marching-squares contours (spatial/contour.py): hand shapes, saddle
convention, and the closed-loop (even vertex degree) invariant."""

from __future__ import annotations

import random
from collections import Counter

import pytest

from osm2geojson_spark.spatial.contour import contour_segments

SCHEMA = "ix long, iy long, v long"


def _segs(df):
    return sorted((r.level, r.x1, r.y1, r.x2, r.y2) for r in df.collect())


def test_single_cell_diamond(spark):
    # one above-threshold cell at (5, 7) -> 4 blocks -> a closed diamond
    # around corner (10, 14) in doubled coords
    out = _segs(contour_segments(
        spark.createDataFrame([(5, 7, 9)], SCHEMA), thresholds=[5]))
    assert out == sorted([
        (5, 9, 14, 10, 13),   # block (4,6): mask 8 -> R-T
        (5, 10, 13, 11, 14),  # block (5,6): mask 4 -> T-L
        (5, 9, 14, 10, 15),   # block (4,7): mask 2 -> B-R
        (5, 10, 15, 11, 14),  # block (5,7): mask 1 -> L-B
    ])


def test_two_levels_nested(spark):
    # v=9 cell inside a plateau of v=3 cells: level 2 contour surrounds
    # the 3x3 plateau, level 5 contour only the hot cell
    cells = [(x, y, 3) for x in range(3) for y in range(3)
             if (x, y) != (1, 1)] + [(1, 1, 9)]
    out = contour_segments(
        spark.createDataFrame(cells, SCHEMA), thresholds=[2, 5])
    by_level = Counter(r.level for r in out.collect())
    assert by_level[5] == 4           # diamond around the hot cell
    assert by_level[2] == 12          # ring around the 3x3 plateau


def test_saddle_convention(spark):
    # diagonal pair -> the two saddle blocks emit TWO segments each
    # (separated-blobs resolution), total degree stays even
    cells = [(0, 0, 9), (1, 1, 9)]
    out = contour_segments(
        spark.createDataFrame(cells, SCHEMA), thresholds=[5])
    rows = _segs(out)
    assert len(rows) == 8             # two diamonds, saddle not merged
    deg = Counter()
    for _, x1, y1, x2, y2 in rows:
        deg[(x1, y1)] += 1
        deg[(x2, y2)] += 1
    assert all(d % 2 == 0 for d in deg.values())


def test_closed_loops_random_grid(spark):
    rng = random.Random(23)
    cells = [(x, y, rng.randint(0, 9)) for x in range(12)
             for y in range(12) if rng.random() < 0.6]
    out = contour_segments(
        spark.createDataFrame(cells, SCHEMA).repartition(7),
        thresholds=[3, 7])
    for level in (3, 7):
        deg = Counter()
        n = 0
        for _, x1, y1, x2, y2 in [r for r in _segs(out) if r[0] == level]:
            deg[(x1, y1)] += 1
            deg[(x2, y2)] += 1
            n += 1
        assert n > 10
        # marching squares on any finite grid closes every contour
        assert all(d % 2 == 0 for d in deg.values()), level


def test_partition_invariance(spark):
    rng = random.Random(24)
    cells = [(x, y, rng.randint(0, 5)) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(cells, SCHEMA)
    a = _segs(contour_segments(df, thresholds=[2]))
    b = _segs(contour_segments(df.repartition(13), thresholds=[2]))
    assert a == b and len(a) > 0


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
