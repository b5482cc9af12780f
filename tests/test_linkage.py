"""Record linkage + link prediction: blocking, thresholds, wedge math."""

from pyspark.sql import functions as F

from osm2geojson_spark.operators.linkage import (
    fuzzy_match_pairs,
    link_prediction,
)


def _names(spark, rows):
    return spark.createDataFrame(rows, "id long, name string")


def test_fuzzy_blocking_and_threshold(spark):
    left = _names(spark, [(1, "acme corp"), (2, "zebra inc")])
    right = _names(spark, [
        (10, "acme corpp"),   # dist 1, same last-2 block? 'pp' vs 'rp'
        (11, "acme corp"),    # dist 0, same block
        (12, "acme co-p"),    # dist 1 vs left 1, block 'p '? no: '-p'
        (13, "zebra ink"),    # dist 1 vs left 2 but block 'nk' != 'nc'
        (14, "zebra inc"),    # dist 0
    ])
    got = {(r.id_a, r.id_b): r.dist
           for r in fuzzy_match_pairs(
               left, right,
               block_expr=lambda n: F.substring(n, -2, 2),
               max_distance=2).collect()}
    # blocking is on the LAST TWO characters: candidates must agree
    # there first, then pass the distance check
    assert got == {(1, 11): 0, (2, 14): 0}


def test_fuzzy_distance_values(spark):
    left = _names(spark, [(1, "abcdef")])
    right = _names(spark, [
        (10, "abcdef"),    # 0
        (11, "abXdef"),    # 1
        (12, "aXYdef"),    # 2
        (13, "XYZdef"),    # 3 -> excluded by threshold
    ])
    got = {r.id_b: r.dist
           for r in fuzzy_match_pairs(
               left, right,
               block_expr=lambda n: F.substring(n, -3, 3),
               max_distance=2).collect()}
    assert got == {10: 0, 11: 1, 12: 2}


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_link_prediction_path_graph(spark):
    # path 1-2-3: the only distance-2 pair is (1,3) through mid 2
    # (deg 2) -> ra = 1000000 // 2
    out = link_prediction(_edges(spark, [(1, 2), (2, 3)])).collect()
    assert [(r.src, r.dst, r.common, r.ra_ppm) for r in out] == \
        [(1, 3, 1, 500_000)]


def test_link_prediction_excludes_existing_edges(spark):
    # triangle 1-2-3 plus tail 3-4: (1,3) is an EDGE so excluded even
    # though it has a common neighbor; (2,4) and (1,4) predicted via 3
    out = {(r.src, r.dst): (r.common, r.ra_ppm)
           for r in link_prediction(
               _edges(spark, [(1, 2), (1, 3), (2, 3), (3, 4)])).collect()}
    # deg(3) = 3 -> 1000000 // 3 = 333333
    assert out == {(1, 4): (1, 333_333), (2, 4): (1, 333_333)}


def test_link_prediction_multiple_common_neighbors(spark):
    # square with both diagonals absent: 1-2, 2-3, 3-4, 4-1
    # (1,3) shares mids {2,4}; (2,4) shares mids {1,3}; all degs 2
    out = {(r.src, r.dst): (r.common, r.ra_ppm)
           for r in link_prediction(
               _edges(spark, [(1, 2), (2, 3), (3, 4), (1, 4)])).collect()}
    assert out == {(1, 3): (2, 1_000_000), (2, 4): (2, 1_000_000)}


def test_link_prediction_degree_cap_drops_hub_mids(spark):
    # star: hub 10 connected to 1..4 -> every leaf pair is a wedge
    # through the hub (deg 4); cap 3 removes ALL predictions
    star = [(i, 10) for i in range(1, 5)]
    assert link_prediction(_edges(spark, star), max_degree=3).count() == 0
    full = link_prediction(_edges(spark, star)).count()
    assert full == 6  # C(4,2) leaf pairs
