"""WKB codec: canonical little-endian encode (byte-exact vs stdlib
struct twin), both-endian decode, strict truncation errors, and the
Spark-side point/line/polygon round trip."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from osm2geojson_spark import pyref
from osm2geojson_spark.functions import wkb as W


def test_point_pack_matches_struct_twin():
    lons = [0.0, -180.0, 179.999999, 1e-9, -85.05112877]
    lats = [0.0, 85.0, -85.0, 52.520008, 0.1]
    import numpy as np

    got = W._pack_points_vec(np.array(lons), np.array(lats))
    for g, lon, lat in zip(got, lons, lats):
        assert g.hex().upper() == pyref.wkb_point_hex(lon, lat)
        t, rings = W._decode_one(g)
        assert t == "Point" and rings == [[[lon, lat]]]


def test_big_endian_decode():
    buf = struct.pack(">BIdd", 0, W.WKB_POINT, 13.4, 52.5)
    assert W._decode_one(buf) == ("Point", [[[13.4, 52.5]]])


def test_linestring_polygon_multipolygon_decode():
    line = (struct.pack("<BII", 1, W.WKB_LINESTRING, 3)
            + struct.pack("<6d", 0, 0, 1, 0, 1, 1))
    assert W._decode_one(line) == (
        "LineString", [[[0, 0], [1, 0], [1, 1]]])
    shell = struct.pack("<I", 4) + struct.pack(
        "<8d", 0, 0, 2, 0, 2, 2, 0, 0)
    hole = struct.pack("<I", 4) + struct.pack(
        "<8d", 0.5, 0.5, 1, 0.5, 1, 1, 0.5, 0.5)
    poly = struct.pack("<BII", 1, W.WKB_POLYGON, 2) + shell + hole
    t, rings = W._decode_one(poly)
    assert t == "Polygon" and len(rings) == 2 and rings[1][0] == [0.5, 0.5]
    mp = (struct.pack("<BII", 1, W.WKB_MULTIPOLYGON, 2)
          + struct.pack("<BII", 1, W.WKB_POLYGON, 1) + shell
          + struct.pack("<BII", 1, W.WKB_POLYGON, 2) + shell + hole)
    t, rings = W._decode_one(mp)
    assert t == "MultiPolygon" and len(rings) == 3


def test_decode_errors():
    with pytest.raises(ValueError, match="truncated"):
        W._decode_one(struct.pack("<BI", 1, W.WKB_POINT) + b"\x00" * 8)
    with pytest.raises(ValueError, match="byte order"):
        W._decode_one(b"\x07" + b"\x00" * 20)
    with pytest.raises(ValueError, match="unsupported"):
        W._decode_one(struct.pack("<BI", 1, 99))
    good = struct.pack("<BIdd", 1, W.WKB_POINT, 1.0, 2.0)
    with pytest.raises(ValueError, match="trailing"):
        W._decode_one(good + b"\x00")
    with pytest.raises(ValueError, match="member type"):
        W._decode_one(struct.pack("<BII", 1, W.WKB_MULTIPOLYGON, 1)
                      + struct.pack("<BIdd", 1, W.WKB_POINT, 0, 0))


def test_spark_roundtrip_all_types(spark):
    rows = [
        (1, [[0.0, 0.0], [1.5, 2.5], [3.0, -1.0]]),          # open -> line
        (2, [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]]),  # closed
    ]
    df = spark.createDataFrame(rows, "id long, coords array<array<double>>")
    closed = (F.element_at("coords", 1) == F.element_at("coords", -1))
    wkb = df.select(
        "id",
        F.when(closed, W.wkb_polygon_udf()(F.array(F.col("coords"))))
        .otherwise(W.wkb_line_udf()(F.col("coords"))).alias("wkb"))
    out = {
        r.id: (r.g.gtype, r.g.rings)
        for r in wkb.select(
            "id", W.wkb_decode_udf()(F.col("wkb")).alias("g")).collect()}
    assert out[1] == ("LineString", [rows[0][1]])
    assert out[2] == ("Polygon", [rows[1][1]])
    # point kernel through Spark, byte-checked against the struct twin
    pts = spark.range(5).select(
        F.col("id"),
        (F.col("id") * 1.5 - 2).alias("lon"),
        (F.col("id") * -0.5 + 1).alias("lat"))
    got = {r.id: r.h for r in pts.select(
        "id", F.hex(W.wkb_point_udf()(F.col("lon"), F.col("lat")))
        .alias("h")).collect()}
    for i in range(5):
        assert got[i] == pyref.wkb_point_hex(i * 1.5 - 2, i * -0.5 + 1)
