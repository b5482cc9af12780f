"""GeoParquet sink: distributed footer-stamped writes, spec-shaped geo
metadata, manifest bboxes, and a WKB-exact read-back round trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm2geojson_spark.functions.wkb import wkb_decode_udf, wkb_point_udf
from osm2geojson_spark.sources.geoparquet import (
    geo_metadata,
    read_geoparquet,
    write_geoparquet,
)


def _points(spark, n=500):
    return spark.range(n).select(
        F.col("id").alias("pt_id"),
        (F.col("id") % 37 * 1.5 - 20).alias("_lon"),
        (F.col("id") % 23 * -0.5 + 5).alias("_lat"),
    ).withColumn(
        "geometry", wkb_point_udf()(F.col("_lon"), F.col("_lat")))


def test_roundtrip_and_metadata(spark, tmp_path):
    out = str(tmp_path / "gpq")
    src = _points(spark).repartition(4)
    manifest = write_geoparquet(src, out)
    mrows = manifest.collect()
    assert 0 < len(mrows) <= 4
    assert sum(r.n_rows for r in mrows) == 500

    meta = geo_metadata(out)
    assert meta["version"] == "1.0.0"
    assert meta["primary_column"] == "geometry"
    gcol = meta["columns"]["geometry"]
    assert gcol["encoding"] == "WKB"
    assert gcol["geometry_types"] == ["Point"]
    assert gcol["crs"] is None  # null == OGC:CRS84 per spec
    # per-file bbox must bound that file's rows (checked via manifest)
    for r in mrows:
        assert r.min_lon <= r.max_lon and r.min_lat <= r.max_lat

    back = read_geoparquet(spark, out)
    assert set(back.columns) == {"pt_id", "geometry"}  # helpers dropped
    dec = back.select(
        "pt_id", wkb_decode_udf()(F.col("geometry")).alias("g"))
    got = {r.pt_id: r.g.rings[0][0] for r in dec.collect()}
    want = {r.pt_id: [r._lon, r._lat]
            for r in _points(spark).select("pt_id", "_lon", "_lat").collect()}
    assert got == want


def test_manifest_is_skipping_index(spark, tmp_path):
    # writing sorted-by-lon partitions gives disjoint per-file bboxes:
    # a lon predicate should prune to a strict subset of files
    out = str(tmp_path / "gpq_sorted")
    src = _points(spark, 800).repartitionByRange(4, "_lon")
    manifest = write_geoparquet(src, out).collect()
    hit = [r.file for r in manifest if r.min_lon <= -15 <= r.max_lon]
    assert 0 < len(hit) < len(manifest)


def test_missing_geo_footer_raises(spark, tmp_path):
    plain = str(tmp_path / "plain")
    spark.range(3).write.parquet(plain)
    with pytest.raises(ValueError, match="geo"):
        geo_metadata(plain)
