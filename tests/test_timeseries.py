"""EWMA fold order and gap-fill grid enumeration, hand-computed."""

import pytest

from osm2geojson_spark.operators.timeseries import ewma_last, gap_fill_linear


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, sec long, event_id long, value double")


def test_ewma_fold_matches_hand_computation(spark):
    rows = [(1, 10, 1, 8.0), (1, 20, 2, 4.0), (1, 30, 3, 0.0)]
    out = {r.user_id: r for r in
           ewma_last(_ev(spark, rows), "user_id", "sec", "event_id",
                     "value", alpha=0.25).collect()}
    # e1=8; e2=8+(4-8)*.25=7; e3=7+(0-7)*.25=5.25
    r = out[1]
    assert (r.n_events, r.last_value, r.ewma) == (3, 0.0, 5.25)


def test_ewma_orders_by_sec_then_id_not_input_order(spark):
    # same values, shuffled input order + a sec tie broken by event_id
    rows = [(1, 30, 3, 0.0), (1, 10, 2, 4.0), (1, 10, 1, 8.0)]
    r = ewma_last(_ev(spark, rows), "user_id", "sec", "event_id",
                  "value", alpha=0.25).collect()[0]
    assert r.ewma == 5.25  # (8 -> 7 -> 5.25), NOT input order


def test_ewma_single_observation_is_identity(spark):
    r = ewma_last(_ev(spark, [(7, 5, 1, 3.5)]), "user_id", "sec",
                  "event_id", "value").collect()[0]
    assert (r.n_events, r.last_value, r.ewma) == (1, 3.5, 3.5)


def test_gap_fill_strict_interior_minutes(spark):
    # gap 90 -> 250: interior minutes 120, 180, 240 (both ends strict)
    rows = [(1, 90, 1, 0.0), (1, 250, 2, 16.0)]
    out = gap_fill_linear(_ev(spark, rows), "user_id", "sec",
                          "event_id", "value", step=60).collect()
    got = {r.t_sec: r.value_interp for r in out}
    assert got == {120: 16.0 * 30 / 160, 180: 16.0 * 90 / 160,
                   240: 16.0 * 150 / 160}


def test_gap_fill_boundary_events_excluded(spark):
    # events exactly ON minute marks: 60 and 180 -> only 120 emitted
    rows = [(1, 60, 1, 0.0), (1, 180, 2, 12.0)]
    out = gap_fill_linear(_ev(spark, rows), "user_id", "sec",
                          "event_id", "value").collect()
    assert {(r.t_sec, r.value_interp) for r in out} == {(120, 6.0)}


def test_gap_fill_no_grid_point_inside(spark):
    # 61 -> 119 contains no minute boundary; 119 -> 121 contains 120
    rows = [(1, 61, 1, 1.0), (1, 119, 2, 2.0), (1, 121, 3, 4.0)]
    out = gap_fill_linear(_ev(spark, rows), "user_id", "sec",
                          "event_id", "value").collect()
    assert [(r.t_sec,) for r in out] == [(120,)]
    assert out[0].value_interp == pytest.approx(2.0 + 2.0 * (1 / 2), abs=0)


def test_gap_fill_ties_produce_nothing(spark):
    rows = [(1, 100, 1, 1.0), (1, 100, 2, 9.0)]
    assert gap_fill_linear(_ev(spark, rows), "user_id", "sec",
                           "event_id", "value").count() == 0


def test_locf_resample_bruteforce(spark):
    from osm2geojson_spark.operators.timeseries import locf_resample

    # planted: observations at irregular secs incl. a tied second
    rows = [(1, 1, 95, 10.0), (1, 2, 230, 20.0), (1, 3, 230, 21.0),
            (1, 4, 600, 30.0), (2, 5, 0, 5.0), (2, 6, 305, 6.0)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, sec long, value double")
    got = sorted((r["user_id"], r["t_sec"], r["value_locf"]) for r in
                 locf_resample(df, "user_id", "sec", "event_id",
                               "value", step=100).collect())
    # user 1: grid 100..599 inside [95, 600): 100,200 carry 10.0;
    # 300..500 carry 21.0 (LAST of the tied second 230); nothing at
    # or past 600 (no extrapolation). user 2: 0..300 from 5.0.
    exp = [(1, 100, 10.0), (1, 200, 10.0), (1, 300, 21.0),
           (1, 400, 21.0), (1, 500, 21.0),
           (2, 0, 5.0), (2, 100, 5.0), (2, 200, 5.0), (2, 300, 5.0)]
    assert got == exp
