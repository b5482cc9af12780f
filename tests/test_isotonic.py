from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from osm2geojson_spark.operators.isotonic import isotonic_blocks, pav_merge


def brute_pav(ys):
    return pav_merge([(i, i, int(y), 1) for i, y in enumerate(ys)])


def test_pav_classic_example():
    # the textbook case: 1, 3, 2 pools the violators (3,2) -> 2.5
    assert brute_pav([1, 3, 2]) == [(0, 0, 1, 1), (1, 2, 5, 2)]


def test_pav_equal_means_stay_split():
    assert brute_pav([2, 2]) == [(0, 0, 2, 1), (1, 1, 2, 1)]


def test_pav_cascade():
    # decreasing series pools into one block
    assert brute_pav([5, 4, 3, 2, 1]) == [(0, 4, 15, 5)]


def test_distributed_equals_sequential_across_partitionings(spark):
    rng_y = [(x * 11) % 23 + x // 9 for x in range(400)]
    df = spark.createDataFrame(pd.DataFrame({
        "x": range(400), "y": rng_y}))
    want = pav_merge([(x, x, int(y), 1) for x, y in enumerate(rng_y)])
    for parts in (1, 3, 13):
        got = [(r["start_x"], r["end_x"], r["sum_y"], r["n"])
               for r in isotonic_blocks(df, partitions=parts)
               .orderBy("start_x").collect()]
        assert got == want, parts
    # fitted means are monotone non-decreasing
    fits = [s / n for _, _, s, n in want]
    assert all(a <= b for a, b in zip(fits, fits[1:]))


def test_equal_x_points_pool_first(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "x": [0, 0, 1, 2], "y": [10, 0, 4, 9]}))
    got = [(r["start_x"], r["end_x"], r["sum_y"], r["n"])
           for r in isotonic_blocks(df).orderBy("start_x").collect()]
    # x=0 pools to mean 5 > 4 at x=1 -> merge; then 14/3 < 9 stays
    assert got == [(0, 1, 14, 3), (2, 2, 9, 1)]


def test_block_guard_fires(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "x": range(100), "y": range(100)}))
    with pytest.raises(RuntimeError, match="max_blocks"):
        isotonic_blocks(df, max_blocks=10)
