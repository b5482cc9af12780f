"""G5 raster zonal statistics: pixel-exact masking, quarantine
discipline, prefilter behavior, and value-exactness vs both an
independent in-test scalar reference and the pyref/DuckDB oracle."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm2geojson_spark import pyref
from osm2geojson_spark.spatial.zonal import (
    tile_bounds,
    zonal_partials,
    zonal_quarantine,
    zonal_stats,
)
from osm2geojson_spark.synth.images import FMTS_ALL, images_table


def _zones_df(spark, zones):
    return spark.createDataFrame(
        [(zid, [{"lon": x, "lat": y} for x, y in ring]) for zid, ring in zones],
        "zone_id string, ring array<struct<lon:double,lat:double>>")


def _scalar_pip(x, y, ring):
    """Independent scalar crossing-number (different code shape from the
    vectorized kernels; same strict-< tie convention)."""
    inside = False
    for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
        if (y1 > y) != (y2 > y):
            if x < x1 + (y - y1) * (x2 - x1) / (y2 - y1):
                inside = not inside
    return inside


def test_partial_coverage_pixel_exact(spark):
    """A diamond zone over one tile counts exactly the pixel centers an
    independent scalar ray-cast puts inside — not the whole tile."""
    imgs = images_table(spark, n=8, seed=42, fmts=FMTS_ALL)
    rows = imgs.collect()
    t = rows[0]
    # tile bbox of that image at zoom 6 (same derivation as the operator)
    nz = 1 << 6
    ix = min(max(int(np.floor((t.lon + 180.0) / 360.0 * nz)), 0), nz - 1)
    iy = min(max(int(np.floor((t.lat + 90.0) / 180.0 * nz)), 0), nz - 1)
    x0, x1 = ix / nz * 360.0 - 180.0, (ix + 1) / nz * 360.0 - 180.0
    y0, y1 = iy / nz * 180.0 - 90.0, (iy + 1) / nz * 180.0 - 90.0
    cxm, cym = (x0 + x1) / 2, (y0 + y1) / 2
    rx, ry = (x1 - x0) / 3, (y1 - y0) / 3
    diamond = [(cxm + rx, cym), (cxm, cym + ry), (cxm - rx, cym),
               (cxm, cym - ry), (cxm + rx, cym)]

    one = imgs.filter(F.col("image_id") == t.image_id)
    out = zonal_partials(one, _zones_df(spark, [("d", diamond)]), zoom=6).collect()
    assert len(out) == 1 and out[0]["zone_id"] == "d"

    from osm2geojson_spark.synth.images import DECODERS
    px = DECODERS[t.fmt](bytes(t.bytes))
    h, w = px.shape[:2]
    lum = px.astype(np.int64).sum(axis=2)
    exp_n = exp_sum = 0
    for r in range(h):
        for c in range(w):
            lon = x0 + (c + 0.5) / w * (x1 - x0)
            lat = y1 - (r + 0.5) / h * (y1 - y0)
            if _scalar_pip(lon, lat, diamond):
                exp_n += 1
                exp_sum += int(lum[r, c])
    assert 0 < exp_n < w * h          # genuinely partial coverage
    assert out[0]["n_pix"] == exp_n
    assert out[0]["sum_lum"] == exp_sum


def test_quarantine_and_prefilter(spark):
    imgs = images_table(spark, n=6, seed=42, fmts=FMTS_ALL)
    bad = imgs.withColumn(
        "fmt", F.when(F.col("image_id") == imgs.first()["image_id"],
                      F.lit("heif")).otherwise(F.col("fmt")))
    world = [("w", [(-180.0, -90.0), (180.0, -90.0), (180.0, 90.0),
                    (-180.0, 90.0), (-180.0, -90.0)])]
    parts = zonal_partials(bad, _zones_df(spark, world), zoom=6)
    q = zonal_quarantine(parts).collect()
    # mislabeled heif: the real ISO-BMFF walk rejects it — quarantined
    assert len(q) == 1 and "malformed box" in q[0]["error"]
    stats = zonal_stats(bad, _zones_df(spark, world), zoom=6).collect()
    assert stats[0]["n_tiles"] == 5   # quarantined tile excluded, rest counted

    # far-away zone: bbox prefilter means zero rows (and zero decode work)
    far = [("far", [(170.0, 80.0), (171.0, 80.0), (171.0, 81.0),
                    (170.0, 81.0), (170.0, 80.0)])]
    assert zonal_partials(imgs.filter(F.col("lon") < 0), _zones_df(spark, far),
                          zoom=6).count() == 0


def test_matches_pyref_aggregate(spark):
    """Full catalog-shaped run (smaller corpus) == the Spark-free
    pure-Python reference, value-exact including the double mean."""
    n = 80
    imgs = images_table(spark, n=n, seed=42, fmts=FMTS_ALL)
    zones = _zones_df(spark, pyref.ref_zones(3))
    got = sorted(tuple(r) for r in zonal_stats(imgs, zones, zoom=6).collect())
    exp = pyref.ref_zonal_stats(n=n, seed=42, zoom=6, n_extra_zones=3)
    assert got == [tuple(r) for r in exp]


def test_partitioned_equals_broadcast(spark):
    """The no-broadcast path (cover-cell equi-join + per-tile regroup)
    returns byte-identical aggregates AND identical quarantine markers."""
    imgs = images_table(spark, n=70, seed=42, fmts=FMTS_ALL)
    one = imgs.first()["image_id"]
    bad = imgs.withColumn(
        "fmt", F.when(F.col("image_id") == one, F.lit("heif"))
                .otherwise(F.col("fmt")))
    zones = _zones_df(spark, pyref.ref_zones(3)
                      + [("big", [(-180.0, -86.0), (180.0, -86.0),
                                  (180.0, 86.0), (-180.0, 86.0),
                                  (-180.0, -86.0)])])
    a = sorted(tuple(r) for r in
               zonal_stats(bad, zones, zoom=6).collect())
    b = sorted(tuple(r) for r in
               zonal_stats(bad, zones, zoom=6, partitioned=True).collect())
    assert a == b and len(a) >= 2
    from osm2geojson_spark.spatial.zonal import zonal_partials_partitioned
    qa = sorted(tuple(r) for r in zonal_quarantine(
        zonal_partials(bad, zones, zoom=6)).collect())
    qb = sorted(tuple(r) for r in zonal_quarantine(
        zonal_partials_partitioned(bad, zones, zoom=6)).collect())
    assert qa == qb and len(qa) == 1


def test_single_shuffle_plan(spark):
    """The only Exchange is the final per-zone aggregate — tile
    assignment, bbox derivation, and the decode/mask kernel are narrow."""
    imgs = images_table(spark, n=16, seed=42, fmts=FMTS_ALL)
    zones = _zones_df(spark, pyref.ref_zones(0))
    plan = zonal_stats(imgs, zones, zoom=6)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_tile_bounds_roundtrip(spark):
    """tile_bounds inverts assign_tiles: every point sits inside its
    tile's bbox."""
    from osm2geojson_spark.spatial.tiles import assign_tiles
    pts = spark.createDataFrame(
        [(float(x), float(y)) for x in range(-170, 171, 48)
         for y in range(-80, 81, 37)], "lon double, lat double")
    df = tile_bounds(assign_tiles(pts, 7), 7).collect()
    for r in df:
        assert r.lon_min <= r.lon < r.lon_max
        assert r.lat_min <= r.lat < r.lat_max
