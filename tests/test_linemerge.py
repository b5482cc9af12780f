"""Line merging: degree rules, corner turns, junction breaks."""

from osm2geojson_spark.spatial.linemerge import merge_lines


def _segs(spark, rows):
    return spark.createDataFrame(
        rows, "seg_id long, node_a long, node_b long")


def _run(spark, rows, **kw):
    out = merge_lines(_segs(spark, rows), **kw).collect()
    return {r.chain_id: (r.n_segs, r.seg_sum) for r in out}


def test_simple_path_merges(spark):
    # 1-2-3-4: interior nodes degree 2 -> one chain
    rows = [(10, 1, 2), (11, 2, 3), (12, 3, 4)]
    assert _run(spark, rows) == {10: (3, 33)}


def test_junction_breaks_chain(spark):
    # T: path 1-2-3 plus a branch 2-9 -> node 2 has degree 3, so ALL
    # three segments are separate chains
    rows = [(10, 1, 2), (11, 2, 3), (12, 2, 9)]
    assert _run(spark, rows) == {10: (1, 10), 11: (1, 11), 12: (1, 12)}


def test_corner_turn_via_degree_two(spark):
    # L-shape: 1-2, 2-3 (turn at 2, degree 2) -> one chain
    rows = [(5, 1, 2), (6, 2, 3)]
    assert _run(spark, rows) == {5: (2, 11)}


def test_cross_breaks_into_four(spark):
    # X: four segments meeting at node 0 (degree 4)
    rows = [(1, 0, 10), (2, 0, 20), (3, 0, 30), (4, 0, 40)]
    assert _run(spark, rows) == {1: (1, 1), 2: (1, 2), 3: (1, 3),
                                 4: (1, 4)}


def test_closed_ring_single_chain(spark):
    # square ring: every node degree 2 -> one chain of 4
    rows = [(1, 10, 11), (2, 11, 12), (3, 12, 13), (4, 13, 10)]
    assert _run(spark, rows) == {1: (4, 10)}


def test_two_disjoint_paths(spark):
    rows = [(1, 0, 1), (2, 1, 2), (7, 100, 101), (8, 101, 102)]
    assert _run(spark, rows) == {1: (2, 3), 7: (2, 15)}
