from __future__ import annotations

import pytest

from osm2geojson_spark.operators.graph import strongly_connected_components


def edges_df(spark, pairs):
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame(pairs, columns=["src", "dst"]))


def run(spark, pairs, **kw):
    return {r["id"]: r["scc_id"] for r in
            strongly_connected_components(edges_df(spark, pairs),
                                          **kw).collect()}


def test_two_cycles_and_a_bridge(spark):
    pairs = [(0, 1), (1, 2), (2, 0),        # cycle A
             (2, 3),                        # bridge (one-way)
             (3, 4), (4, 5), (5, 3)]        # cycle B
    got = run(spark, pairs)
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}


def test_dag_is_all_singletons(spark):
    pairs = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    got = run(spark, pairs)
    assert got == {i: i for i in range(6)}


def test_nested_merge_through_back_edge(spark):
    # A → B forward and B → A backward merges both cycles into one SCC
    pairs = [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2), (3, 0)]
    got = run(spark, pairs)
    assert set(got.values()) == {0}


def test_chain_of_roots_needs_phases(spark):
    # 3 singleton nodes in a line: the max-id node shadows the others'
    # colors, so each phase resolves one suffix — exercises the outer
    # loop (root chain), and the budget failure is loud
    pairs = [(2, 1), (1, 0)]
    assert run(spark, pairs) == {0: 0, 1: 1, 2: 2}
    with pytest.raises(RuntimeError, match="phases"):
        run(spark, pairs, max_outer=1)


def test_matches_tarjan_on_the_catalog_graph(spark):
    from osm2geojson_spark.pyref import ref_scc, scc_graph_edges

    got = run(spark, scc_graph_edges(n_blocks=4, b=8, tail=5))
    want = dict(ref_scc(n_blocks=4, b=8, tail=5))
    assert got == want
