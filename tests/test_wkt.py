"""WKT codec: codegen encode ↔ Arrow decode, grammar edges, quarantine.

The catalog `wkt_roundtrip` oracle pins the strings cross-engine; this
file pins the GRAMMAR — closure validation, nesting, negative ints,
malformed-input quarantine (error column, batch survives), and the
encode/parse identity on hand geometry including MULTIPOLYGON (which
the encoder doesn't emit but the reader must accept — foreign tiles)."""

import pytest
from pyspark.sql import functions as F

from osm2geojson_spark.functions.wkt import (
    wkt_linestring_expr,
    wkt_parse,
    wkt_parse_udf,
    wkt_point_expr,
    wkt_polygon_expr,
)


def test_parse_all_types_and_negatives():
    assert wkt_parse("POINT (-5 7)") == ("POINT", [[(-5, 7)]])
    assert wkt_parse("LINESTRING (0 0, -10 5, 3 -3)") == (
        "LINESTRING", [[(0, 0), (-10, 5), (3, -3)]])
    t, rings = wkt_parse(
        "POLYGON ((0 0, 4 0, 4 4, 0 0), (1 1, 2 1, 1 2, 1 1))")
    assert t == "POLYGON" and rings == [
        [(0, 0), (4, 0), (4, 4)], [(1, 1), (2, 1), (1, 2)]]
    t, rings = wkt_parse(
        "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 0)), ((9 9, 12 9, 9 12, 9 9)))")
    assert t == "MULTIPOLYGON" and len(rings) == 2


@pytest.mark.parametrize("bad", [
    "POINT (a b)",
    "POINT (1.5 2)",          # non-integer lattice
    "LINESTRING (1 1)",
    "POLYGON ((0 0, 1 1))",
    "POLYGON ((0 0, 1 0, 1 1, 2 2))",   # unclosed
    "POLYGON ((0 0, 1 0, 1 1, 0 0)",    # unbalanced
    "CIRCLE (0 0, 5)",
    "POLYGON (junk)",
])
def test_parse_rejects(bad):
    with pytest.raises(ValueError):
        wkt_parse(bad)


def test_spark_encode_parse_identity(spark):
    df = spark.createDataFrame(
        [(1, [(0, 0), (10, -5), (7, 7)])],
        "gid long, pts array<struct<x long, y long>>")
    enc = df.select(
        "gid",
        wkt_point_expr(F.lit(3), F.lit(-4)).alias("pt"),
        wkt_linestring_expr(F.col("pts")).alias("ls"),
        wkt_polygon_expr(F.array(F.col("pts"))).alias("pg"))
    (row,) = enc.collect()
    assert row["pt"] == "POINT (3 -4)"
    assert row["ls"] == "LINESTRING (0 0, 10 -5, 7 7)"
    assert row["pg"] == "POLYGON ((0 0, 10 -5, 7 7, 0 0))"
    parse = wkt_parse_udf()
    out = enc.select(parse("ls").alias("l"), parse("pg").alias("p")) \
             .collect()[0]
    assert out["l"]["geom_type"] == "LINESTRING"
    assert out["l"]["error"] is None
    assert [(p["x"], p["y"]) for p in out["l"]["rings"][0]] == \
        [(0, 0), (10, -5), (7, 7)]
    assert out["p"]["geom_type"] == "POLYGON"
    assert [(p["x"], p["y"]) for p in out["p"]["rings"][0]] == \
        [(0, 0), (10, -5), (7, 7)]  # closure stripped


def test_malformed_rows_quarantine_not_fail(spark):
    parse = wkt_parse_udf()
    df = spark.createDataFrame(
        [(1, "POINT (1 2)"), (2, "POINT (x y)"), (3, "LINESTRING (1 1)")],
        "gid long, wkt string")
    got = {r["gid"]: r["p"] for r in
           df.select("gid", parse("wkt").alias("p")).collect()}
    assert got[1]["error"] is None and got[1]["geom_type"] == "POINT"
    assert got[2]["error"] is not None and got[2]["rings"] is None
    assert got[3]["error"] is not None
