"""Geohash encoding (functions/geohash.py) vs published vectors and the
independent interval-bisection reference."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from osm2geojson_spark.functions.geohash import (
    geohash_expr,
    geohash_int_expr,
    geohash_ref,
)

SCHEMA = "lon double, lat double"


def _enc(spark, pts, p):
    df = spark.createDataFrame(pts, SCHEMA)
    return [r.gh for r in
            df.select(geohash_expr(F.col("lon"), F.col("lat"), p)
                      .alias("gh")).collect()]


def test_published_vectors(spark):
    # classic public test vectors (Wikipedia / geohash.org)
    assert _enc(spark, [(-5.6, 42.6)], 5) == ["ezs42"]
    assert _enc(spark, [(10.40744, 57.64911)], 11) == ["u4pruydqqvj"]
    assert _enc(spark, [(-122.419416, 37.774929)], 5) == ["9q8yy"]


def test_matches_bisection_reference(spark):
    rng = random.Random(11)
    pts = [(rng.uniform(-180, 180), rng.uniform(-90, 90))
           for _ in range(300)]
    for p in (1, 4, 5, 8, 12):  # odd and even 5p parities
        got = _enc(spark, pts, p)
        want = [geohash_ref(lon, lat, p) for lon, lat in pts]
        assert got == want, p


def test_prefix_property(spark):
    rng = random.Random(12)
    pts = [(rng.uniform(-180, 180), rng.uniform(-90, 90))
           for _ in range(100)]
    g6, g3 = _enc(spark, pts, 6), _enc(spark, pts, 3)
    assert all(a.startswith(b) for a, b in zip(g6, g3))


def test_int_form_sorts_like_string(spark):
    rng = random.Random(13)
    pts = [(rng.uniform(-180, 180), rng.uniform(-90, 90))
           for _ in range(200)]
    df = spark.createDataFrame(pts, SCHEMA).select(
        geohash_expr(F.col("lon"), F.col("lat"), 7).alias("gh"),
        geohash_int_expr(F.col("lon"), F.col("lat"), 7).alias("gi"),
    )
    rows = df.collect()
    by_str = [r.gi for r in sorted(rows, key=lambda r: r.gh)]
    assert by_str == sorted(by_str)


def test_codegen_only_plan(spark):
    df = spark.createDataFrame([(1.0, 2.0)], SCHEMA).select(
        geohash_expr(F.col("lon"), F.col("lat"), 6).alias("gh"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
