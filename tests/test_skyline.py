from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm2geojson_spark.operators.skyline import (
    local_skyline_kernel,
    skyline,
)


def brute_skyline(pts: np.ndarray) -> np.ndarray:
    keep = np.ones(len(pts), dtype=bool)
    for i, p in enumerate(pts):
        dom = (pts <= p).all(axis=1) & (pts < p).any(axis=1)
        keep[i] = not dom.any()
    return keep


@pytest.mark.parametrize("seed,n,d", [(0, 200, 2), (1, 500, 3), (2, 300, 4)])
def test_kernel_matches_bruteforce(seed, n, d):
    rng = np.random.default_rng(seed)
    pts = rng.integers(0, 50, size=(n, d)).astype(np.int64)
    assert (local_skyline_kernel(pts) == brute_skyline(pts)).all()


def test_kernel_duplicates_and_edges():
    # duplicated frontier points all survive; dominated dupes all drop
    pts = np.array([[1, 1], [1, 1], [2, 2], [0, 3], [0, 3]], np.int64)
    assert local_skyline_kernel(pts).tolist() == [
        True, True, False, True, True]
    assert local_skyline_kernel(np.empty((0, 2), np.int64)).size == 0
    one = local_skyline_kernel(np.array([[5, 5]], np.int64))
    assert one.tolist() == [True]


def test_distributed_skyline_exact(spark):
    rng = np.random.default_rng(7)
    rows = [(int(i), int(a), int(b), int(c))
            for i, (a, b, c) in enumerate(rng.integers(0, 200, (3000, 3)))]
    df = spark.createDataFrame(rows, "id long, c1 long, c2 long, c3 long")
    for parts in (1, 7):
        got = sorted(
            tuple(r) for r in skyline(
                df.repartition(parts), ["c1", "c2", "c3"]).collect())
        pts = np.array([r[1:] for r in rows], np.int64)
        exp = sorted(tuple(rows[i]) for i in np.where(brute_skyline(pts))[0])
        assert got == exp, parts


def test_skyline_requires_dims(spark):
    df = spark.range(3).select(F.col("id").alias("c1"))
    with pytest.raises(ValueError, match="dims"):
        skyline(df, [])
