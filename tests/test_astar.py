"""ALT A* point-to-point routing: exactness vs plain SSSP and real
goal-direction (strictly fewer relaxations than the unguided run)."""

from __future__ import annotations

import pytest

from osm2geojson_spark.spatial.route import (
    astar_route,
    grid_edges,
    landmark_dist_table,
    shortest_paths,
)

N = 10  # 100 nodes — rounds are driver-barrier-bound at toy scale


@pytest.fixture(scope="module")
def edges(spark):
    return grid_edges(spark, N).cache()


@pytest.fixture(scope="module")
def ldists(spark, edges):
    # four corner landmarks — the standard ALT pick for a grid
    corners = [0, N - 1, N * (N - 1), N * N - 1]
    t = landmark_dist_table(edges, corners).cache()
    t.count()
    return t, corners


def test_astar_exact_vs_sssp(spark, edges, ldists):
    lt, lms = ldists
    full = {r.node_id: r.dist
            for r in shortest_paths(edges, 0, max_iters=64).collect()}
    for target in (N - 1, N * N // 2 + 5):
        got = astar_route(edges, 0, target, lt, lms).collect()
        assert len(got) == 1
        assert got[0].dist == full[target]


def test_astar_prunes_vs_unguided(spark, edges, ldists):
    lt, lms = ldists
    empty_lt = spark.createDataFrame([], "id long, ldists array<long>")
    for target in (N - 1, N * N // 2 + 5):
        s_guided: dict = {}
        astar_route(edges, 0, target, lt, lms, stats=s_guided)
        s_plain: dict = {}
        astar_route(edges, 0, target, empty_lt, lms, stats=s_plain)
        assert s_guided["best"] == s_plain["best"]
        assert s_guided["expanded"] < s_plain["expanded"], \
            (target, s_guided, s_plain)


def test_astar_unreachable_target(spark):
    small = grid_edges(spark.builder.getOrCreate(), 4)
    lms = [0, 15]
    lt = landmark_dist_table(small, lms)
    out = astar_route(small, 0, 999, lt, lms)
    assert out.count() == 0


def test_landmark_table_shape(spark, edges, ldists):
    lt, lms = ldists
    rows = lt.collect()
    assert len(rows) == N * N
    by_id = {r.id: r.ldists for r in rows}
    for i, lm in enumerate(lms):
        assert by_id[lm][i] == 0
    assert all(len(v) == len(lms) for v in by_id.values())
