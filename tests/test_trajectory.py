"""Trajectory statistics (spatial/trajectory.py) vs hand values and a
pure-Python left-fold reference."""

from __future__ import annotations

import datetime as dt
import math
import random

import pytest
from pyspark.sql import functions as F

from osm2geojson_spark.spatial.trajectory import segment_trips, trajectory_stats

SCHEMA = ("user_id long, ts timestamp_ntz, event_id long, "
          "lon double, lat double")


def _t(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i)


def test_right_triangle_hand_values(spark):
    rows = [(1, _t(0), 0, 0.0, 0.0), (1, _t(1), 1, 3.0, 0.0),
            (1, _t(2), 2, 3.0, 4.0)]
    df = spark.createDataFrame(rows, SCHEMA)
    r = trajectory_stats(df).first()
    assert (r["n_pts"], r["path_len"], r["net_disp"], r["max_step"]) == \
        (3, 7.0, 5.0, 4.0)
    assert r["straightness"] == 5.0 / 7.0
    assert (r["min_x"], r["min_y"], r["max_x"], r["max_y"]) == \
        (0.0, 0.0, 3.0, 4.0)


def test_single_point(spark):
    df = spark.createDataFrame([(1, _t(0), 0, 2.0, 3.0)], SCHEMA)
    r = trajectory_stats(df).first()
    assert (r["n_pts"], r["path_len"], r["net_disp"], r["straightness"],
            r["max_step"]) == (1, 0.0, 0.0, 0.0, 0.0)


def test_input_order_irrelevant(spark):
    rows = [(1, _t(i), i, float(i % 7), float((i * 3) % 5))
            for i in range(20)]
    shuffled = rows[::-1][3:] + rows[::-1][:3]
    a = trajectory_stats(spark.createDataFrame(rows, SCHEMA)).first()
    b = trajectory_stats(
        spark.createDataFrame(shuffled, SCHEMA).repartition(5)).first()
    assert a == b


def test_matches_python_left_fold(spark):
    rng = random.Random(7)
    rows, ref = [], {}
    for uid in range(5):
        pts = [(rng.uniform(-10, 10), rng.uniform(-10, 10))
               for _ in range(rng.randint(1, 30))]
        for i, (x, y) in enumerate(pts):
            rows.append((uid, _t(i), i, x, y))
        acc, mx = 0.0, 0.0
        for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
            s = math.sqrt((x1 - x0) * (x1 - x0) + (y1 - y0) * (y1 - y0))
            acc += s            # left-to-right, same order as F.aggregate
            mx = max(mx, s)
        ref[uid] = (len(pts), acc, mx)
    got = {r["user_id"]: r for r in
           trajectory_stats(spark.createDataFrame(rows, SCHEMA)).collect()}
    for uid, (n, acc, mx) in ref.items():
        r = got[uid]
        assert r["n_pts"] == n
        assert r["path_len"] == acc, uid     # bit-exact: same fold order
        assert r["max_step"] == mx


def test_ts_tie_breaks_on_order_col(spark):
    rows = [(1, _t(0), 2, 1.0, 0.0), (1, _t(0), 1, 0.0, 0.0),
            (1, _t(0), 3, 1.0, 1.0)]
    r = trajectory_stats(spark.createDataFrame(rows, SCHEMA)).first()
    assert r["path_len"] == 2.0             # 0,0 -> 1,0 -> 1,1


def test_segment_trips_gap_boundaries(spark):
    # gaps of exactly max_gap_sec do NOT split; gap+1 does; trip ids
    # start at 1 and are per-user counters.
    rows = [(1, _t(0), 0, 0.0, 0.0),
            (1, _t(600), 1, 1.0, 0.0),      # gap == max_gap -> same trip
            (1, _t(1201), 2, 2.0, 0.0),     # gap == max_gap+1 -> new trip
            (2, _t(50), 0, 5.0, 5.0)]
    out = segment_trips(spark.createDataFrame(rows, SCHEMA),
                        max_gap_sec=600)
    got = {(r["user_id"], r["event_id"]): r["trip_id"]
           for r in out.collect()}
    assert got == {(1, 0): 1, (1, 1): 1, (1, 2): 2, (2, 0): 1}


def test_segment_trips_python_reference(spark):
    rng = random.Random(11)
    rows = []
    ref = {}
    for uid in range(4):
        sec = 0
        trip, prev = 0, None
        for i in range(rng.randint(1, 40)):
            sec += rng.choice([10, 100, 2000, 5000])
            if prev is None or sec - prev > 1800:
                trip += 1
            prev = sec
            rows.append((uid, _t(sec), i, float(i), 0.0))
            ref[(uid, i)] = trip
    out = segment_trips(spark.createDataFrame(rows, SCHEMA).repartition(7),
                        max_gap_sec=1800)
    got = {(r["user_id"], r["event_id"]): r["trip_id"]
           for r in out.collect()}
    assert got == ref


def test_compound_key_trajectory_equals_per_trip_slices(spark):
    # trajectory_stats over (user_id, trip_id) must equal running
    # trajectory_stats on each trip's rows separately.
    rng = random.Random(23)
    rows = []
    sec = 0
    for i in range(60):
        sec += rng.choice([30, 4000])
        rows.append((1, _t(sec), i, rng.uniform(-5, 5), rng.uniform(-5, 5)))
    df = spark.createDataFrame(rows, SCHEMA)
    seg = segment_trips(df, max_gap_sec=1800)
    combined = {(r["user_id"], r["trip_id"]): r for r in
                trajectory_stats(seg, id_col=["user_id", "trip_id"])
                .collect()}
    trips = sorted({r["trip_id"] for r in seg.collect()})
    assert len(trips) >= 2
    for t in trips:
        solo = trajectory_stats(seg.where(F.col("trip_id") == t)).first()
        comb = combined[(1, t)]
        for c in ("n_pts", "path_len", "net_disp", "straightness",
                  "max_step", "min_x", "min_y", "max_x", "max_y"):
            assert comb[c] == solo[c], (t, c)


def test_od_matrix_hand_case(spark):
    from osm2geojson_spark.spatial.trajectory import od_matrix
    # res=1: world is a 2x2 grid -> cells 0 (SW) 1 (SE) 2 (NW) 3 (NE)
    rows = [
        (1, _t(0), 0, -90.0, -45.0),     # trip 1: SW -> ... -> NE
        (1, _t(10), 1, 10.0, 10.0),
        (1, _t(20), 2, 90.0, 45.0),
        (1, _t(2000), 3, 90.0, -45.0),   # trip 2 (gap>600): SE -> NW
        (1, _t(2010), 4, -90.0, 45.0),
        (2, _t(5), 0, -90.0, -45.0),     # single-ping trip: o == d
    ]
    out = od_matrix(spark.createDataFrame(rows, SCHEMA),
                    res=1, max_gap_sec=600)
    got = {(r["o_cell"], r["d_cell"]): (r["n_trips"], r["n_users"],
                                        r["n_pings"])
           for r in out.collect()}
    assert got == {(0, 3): (1, 1, 3), (1, 2): (1, 1, 2), (0, 0): (1, 1, 1)}


def test_od_matrix_endpoint_is_whole_row(spark):
    from osm2geojson_spark.functions.cells import encode_np
    from osm2geojson_spark.spatial.trajectory import od_matrix
    import numpy as np
    # struct min must select the first ROW's (lon, lat) pair, not the
    # column-wise minimum across the trip.
    rows = [(1, _t(0), 0, 50.0, 80.0),   # origin: large lon AND lat
            (1, _t(10), 1, -170.0, -80.0)]
    r = od_matrix(spark.createDataFrame(rows, SCHEMA),
                  res=4, max_gap_sec=600).first()
    o = encode_np(np.array([50.0]), np.array([80.0]), 4)[0]
    d = encode_np(np.array([-170.0]), np.array([-80.0]), 4)[0]
    assert (r["o_cell"], r["d_cell"]) == (o, d)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_staypoints_runs_and_filters(spark):
    from osm2geojson_spark.spatial.trajectory import staypoints

    # user 1: 3 pings in cell (0,0) spanning 100s, hop to (1,0), return
    # to (0,0) for a single ping (dropped: min_pings), user 2: 2 pings
    # same cell 0s apart (dropped: min_dwell)
    rows = [
        (1, 10, 100, 5, 5), (1, 60, 101, 8, 9), (1, 110, 102, 3, 2),
        (1, 200, 103, 15, 5),                       # cell (1, 0)
        (1, 300, 104, 2, 2),                        # back, run of 1
        (2, 50, 200, 5, 5), (2, 50, 201, 6, 6),     # dwell 0
    ]
    df = spark.createDataFrame(
        rows, "user_id long, sec long, event_id long, ix long, iy long")
    got = [(r["user_id"], r["cell_x"], r["cell_y"], r["n_pings"],
            r["t_start"], r["t_end"], r["dwell_sec"])
           for r in staypoints(df, cell_size=10, min_dwell_sec=1,
                               min_pings=2).collect()]
    assert got == [(1, 0, 0, 3, 10, 110, 100)]


def test_staypoints_cell_boundary_is_floor_div(spark):
    from osm2geojson_spark.spatial.trajectory import staypoints

    # ix 9 and 10 straddle the cell boundary -> two runs, no staypoint
    rows = [(1, 0, 1, 9, 0), (1, 10, 2, 10, 0)]
    df = spark.createDataFrame(
        rows, "user_id long, sec long, event_id long, ix long, iy long")
    assert staypoints(df, cell_size=10, min_pings=2).count() == 0
    # same cell -> one staypoint
    rows2 = [(1, 0, 1, 10, 0), (1, 10, 2, 19, 0)]
    df2 = spark.createDataFrame(
        rows2, "user_id long, sec long, event_id long, ix long, iy long")
    (sp,) = staypoints(df2, cell_size=10, min_pings=2).collect()
    assert (sp["cell_x"], sp["n_pings"], sp["dwell_sec"]) == (1, 2, 10)


def test_heading_octants_hand_paths(spark):
    from osm2geojson_spark.spatial.trajectory import heading_octants

    # user 1 walks E, NE-steep, N, stays; user 2 walks W, S
    pts = [(1, 0, 0, 0), (1, 1, 10, 0), (1, 2, 12, 8), (1, 3, 12, 20),
           (1, 4, 12, 20),
           (2, 0, 0, 0), (2, 1, -9, 0), (2, 2, -9, -5)]
    df = spark.createDataFrame(
        pts, "user_id long, event_id long, ix long, iy long")
    got = {r["sector"]: (r["n"], r["n_users"]) for r in
           heading_octants(df, "user_id", "event_id", "ix", "iy")
           .collect()}
    # deltas: u1 (10,0)->0, (2,8)->1, (0,12)->2, (0,0)->8
    # u2 (-9,0): dy>=0, dx<0, |dy|<|dx| -> 3 ; (0,-5) -> 6
    assert got == {0: (1, 1), 1: (1, 1), 2: (1, 1), 8: (1, 1),
                   3: (1, 1), 6: (1, 1)}
