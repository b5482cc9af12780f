"""Spatiotemporal co-location: exact thresholds, cross-bucket pairs,
single-count guarantees."""

from osm2geojson_spark.spatial.colocation import (
    colocation_pairs,
    cotravel_counts,
)


def _pings(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, x long, y long, sec long")


def test_exact_thresholds_inclusive(spark):
    # users 1 and 2: distance exactly eps, time gap exactly window ->
    # both inclusive; user 3 one unit over on each axis -> excluded
    rows = [(1, 1, 0, 0, 1000),
            (2, 2, 100, 0, 1050),       # vs 1: d=100=eps, dt=50<=60
            (3, 3, 2000, 0, 1000),      # far from everyone in space
            (4, 4, 0, 0, 1061)]         # vs 1: dt=61 > window
    out = colocation_pairs(_pings(spark, rows), eps=100,
                           window_sec=60).collect()
    got = {(r.user_a, r.user_b, r.d2, r.dt_sec) for r in out}
    # (1,2) at the exact thresholds is IN; (1,4) one second over is
    # OUT; (2,4) is in range on both axes (d=100, dt=11)
    assert got == {(1, 2, 10000, 50), (2, 4, 10000, 11)}


def test_cross_bucket_pairs_found(spark):
    # points straddling a cell AND time-bucket boundary: x=99 vs
    # x=101 (cells 0/1 at eps=100), sec=99 vs 101 (buckets 1/...)
    rows = [(1, 1, 99, 0, 59), (2, 2, 101, 0, 61)]
    out = colocation_pairs(_pings(spark, rows), eps=100,
                           window_sec=60).collect()
    assert len(out) == 1 and out[0].d2 == 4 and out[0].dt_sec == 2


def test_same_user_never_pairs(spark):
    rows = [(1, 7, 0, 0, 0), (2, 7, 1, 0, 1)]
    assert colocation_pairs(_pings(spark, rows), eps=100,
                            window_sec=60).count() == 0


def test_each_pair_counted_once(spark):
    # both pings in the SAME cell and bucket — the 27-image join must
    # not duplicate the pair
    rows = [(1, 1, 10, 10, 5), (2, 2, 12, 10, 6)]
    out = colocation_pairs(_pings(spark, rows), eps=100,
                           window_sec=60).collect()
    assert len(out) == 1 and (out[0].user_a, out[0].user_b) == (1, 2)


def test_cotravel_rollup(spark):
    # users 1/2 meet twice; user 3's ping is near BOTH of the first
    # meeting's pings (d=25 to user 1, d=25 to user 2, dt 30/25)
    rows = [(1, 1, 0, 0, 0), (2, 2, 10, 0, 5),
            (3, 1, 1000, 0, 5000), (4, 2, 1010, 0, 5020),
            (5, 3, 5, 0, 30)]
    out = {(r.user_a, r.user_b): (r.n_meetings, r.d2_sum, r.dt_sum)
           for r in cotravel_counts(_pings(spark, rows), eps=100,
                                    window_sec=60).collect()}
    assert out[(1, 2)] == (2, 200, 25)
    assert out[(1, 3)] == (1, 25, 30)
    assert out[(2, 3)] == (1, 25, 25)
