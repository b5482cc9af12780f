from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm2geojson_spark.functions.polyline import (
    polyline6_decode,
    polyline6_decode_udf,
    polyline6_encode_expr,
)


def loop_encode(pts: list[tuple[int, int]]) -> str:
    """Independent reference: the textbook while-loop encoder."""
    out = []
    plat = plon = 0
    for x, y in pts:
        for v in (y - plat, x - plon):
            v = ~(v << 1) if v < 0 else v << 1
            while v >= 0x20:
                out.append(chr((0x20 | (v & 0x1F)) + 63))
                v >>= 5
            out.append(chr(v + 63))
        plat, plon = y, x
    return "".join(out)


def test_known_google_vector():
    # the canonical Maps-API example, scaled to precision 6
    pts = [(-120_200_000, 38_500_000), (-120_950_000, 40_700_000),
           (-126_453_000, 43_252_000)]
    s = loop_encode(pts)
    assert polyline6_decode(s) == pts


def spark_encode(spark, pts_lists: list[list[tuple[int, int]]]) -> list[str]:
    df = spark.createDataFrame(pd.DataFrame({
        "pts": [[{"x": x, "y": y} for x, y in pts] for pts in pts_lists]}))
    return [r["s"] for r in
            df.select(polyline6_encode_expr(F.col("pts")).alias("s"))
            .collect()]


def test_codegen_encoder_matches_loop_reference(spark):
    cases = [
        [(0, 0)],
        [(0, 0), (0, 0)],                      # zero deltas
        [(-120_200_000, 38_500_000), (-120_950_000, 40_700_000),
         (-126_453_000, 43_252_000)],
        [(1, -1), (-1, 1), (31, -32), (32, 33), (-1024, 1024)],
        [(150_000_000, -60_000_000), (-150_000_000, 60_000_000)],
    ]
    got = spark_encode(spark, cases)
    for pts, s in zip(cases, got):
        assert s == loop_encode(pts), pts
        assert polyline6_decode(s) == pts


def test_decode_udf_roundtrip_and_quarantine(spark):
    good = loop_encode([(5, 7), (-3, 11)])
    df = spark.createDataFrame(pd.DataFrame({"s": [good, "\x01bad"]}))
    rows = df.select(polyline6_decode_udf()(F.col("s")).alias("p")).collect()
    assert [(p["x"], p["y"]) for p in rows[0]["p"]] == [(5, 7), (-3, 11)]
    assert rows[1]["p"] is None


@pytest.mark.parametrize("bad", ["_", "`" * 13, "_pol"])
def test_decode_rejects_malformed(bad):
    with pytest.raises(ValueError):
        polyline6_decode(bad)
