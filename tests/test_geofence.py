"""Geofence zone assignment + transitions (spatial/geofence.py) vs hand
cases, an overlapping-zones contract check, and the streaming twin."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from osm2geojson_spark.spatial.geofence import (
    assign_zones,
    geofence_transitions,
)

ZONES = "zone_id long, x0 double, x1 double, y0 double, y1 double"
PTS = "user_id long, ts long, lon double, lat double"


def _zones(spark):
    return spark.createDataFrame(
        [(1, 0.0, 10.0, 0.0, 10.0), (2, 20.0, 30.0, 0.0, 10.0)], ZONES)


def test_transitions_hand_case(spark):
    # user 7: outside -> z1 -> z1 -> outside -> z2 ; user 8: starts in
    # z1 (first ping emits), stays
    pts = [(7, 1, -5.0, 5.0), (7, 2, 5.0, 5.0), (7, 3, 6.0, 6.0),
           (7, 4, 15.0, 5.0), (7, 5, 25.0, 5.0),
           (8, 1, 5.0, 5.0), (8, 2, 5.5, 5.0)]
    out = geofence_transitions(
        spark.createDataFrame(pts, PTS), _zones(spark),
        order_cols=("ts",)).collect()
    got = sorted((r.user_id, r.ts, r.from_zone, r.to_zone) for r in out)
    assert got == [
        (7, 2, None, 1), (7, 4, 1, None), (7, 5, None, 2),
        (8, 1, None, 1),
    ]


def test_half_open_edges(spark):
    # x1/y1 edges are EXCLUSIVE, x0/y0 inclusive
    pts = [(1, 1, 0.0, 0.0), (1, 2, 10.0, 5.0), (1, 3, 5.0, 10.0)]
    out = assign_zones(spark.createDataFrame(pts, PTS), _zones(spark))
    got = {r.ts: r.zone_id for r in out.collect()}
    assert got == {1: 1, 2: None, 3: None}


def test_overlapping_zones_min_id(spark):
    zones = spark.createDataFrame(
        [(5, 0.0, 10.0, 0.0, 10.0), (3, 5.0, 15.0, 0.0, 10.0)], ZONES)
    pts = [(1, 1, 7.0, 5.0)]
    df = spark.createDataFrame(pts, PTS)
    got = assign_zones(df, zones, overlapping=True).collect()
    assert len(got) == 1 and got[0].zone_id == 3
    # default (disjoint contract violated) would duplicate the ping
    assert assign_zones(df, zones).count() == 2


def test_streaming_twin_matches_batch(spark, tmp_path):
    """geofence_stream == batch geofence_transitions on replayed pings."""
    from osm2geojson_spark.streaming.events import (
        geofence_stream,
        run_stream_to_memory,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    for u in range(6):
        for i in range(40):
            k = u * 40 + i
            rows.append((u, base + dt.timedelta(minutes=k), k,
                         float((k * 37) % 45 - 10), float((k * 53) % 20 - 5)))
    schema = ("user_id long, ts timestamp, event_id long, "
              "lon double, lat double")
    batch_df = spark.createDataFrame(rows, schema)
    zones = _zones(spark)

    want = {
        (r.user_id, r.event_id, r.from_zone, r.to_zone)
        for r in geofence_transitions(
            batch_df, zones, order_cols=("ts", "event_id")).collect()
    }
    assert len(want) > 20  # fixture produces real churn

    src = str(tmp_path / "pings")
    batch_df.write.parquet(src)
    stream = (spark.readStream.schema(batch_df.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    run_stream_to_memory(geofence_stream(stream, zones),
                         "gf_stream", output_mode="append")
    got = {
        (r.user_id, r.event_id, r.from_zone, r.to_zone)
        for r in spark.sql("select * from gf_stream").collect()
    }
    assert got == want


def test_assignment_is_broadcast(spark):
    pts = spark.createDataFrame([(1, 1, 5.0, 5.0)], PTS)
    plan = assign_zones(pts, _zones(spark))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Broadcast" in plan and "CartesianProduct" not in plan


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
