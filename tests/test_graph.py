"""Deterministic integer PageRank (operators/graph): == pure-Python
integer twin bit-for-bit, converges to float PageRank, partition
invariant, dangling handling."""

from __future__ import annotations

import numpy as np

from osm2geojson_spark import pyref
from osm2geojson_spark.operators.graph import pagerank


def _run(spark, edges, n_iters=10, parts=None):
    df = spark.createDataFrame(edges, "src long, dst long")
    if parts:
        df = df.repartition(parts)
    return sorted((r.node_id, r.mass)
                  for r in pagerank(df, n_iters=n_iters).collect())


def test_matches_integer_reference_and_partitions(spark):
    import random

    rng = random.Random(5)
    edges = list({(rng.randrange(40), rng.randrange(40))
                  for _ in range(160)})
    edges = [(u, v) for u, v in edges if u != v]
    got = _run(spark, edges, n_iters=10)
    assert got == pyref.ref_pagerank(edges, n_iters=10)
    assert _run(spark, edges, n_iters=10, parts=7) == got


def test_converges_to_float_pagerank(spark):
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 2), (4, 2), (1, 5)]
    got = dict(_run(spark, edges, n_iters=40))
    # float power iteration, same dangling convention
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for u, _ in edges:
        deg[idx[u]] += 1
    pr = np.full(n, 1.0 / n)
    for _ in range(40):
        dang = pr[deg == 0].sum()
        new = np.full(n, 0.15 / n) + 0.85 * dang / n
        for u, v in edges:
            new[idx[v]] += 0.85 * pr[idx[u]] / deg[idx[u]]
        pr = new
    for v in nodes:
        assert abs(got[v] / 1e12 - pr[idx[v]]) < 1e-6, v
    # total mass conserved to within integer floor loss
    assert 0 <= 1e12 - sum(got.values()) < 100 * n


def test_dangling_and_sink_dominance(spark):
    # star into a sink: the sink must hold the highest rank
    edges = [(i, 9) for i in range(9)]
    got = dict(_run(spark, edges, n_iters=10))
    assert max(got, key=got.get) == 9
    assert got == dict(pyref.ref_pagerank(edges, n_iters=10))


# ----------------------------------------------------------- triangles
def _tri_brute(edges):
    from itertools import combinations
    adj = {}
    for u, v in edges:
        if u == v:
            continue
        a, b = min(u, v), max(u, v)
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    cnt = {}
    for a, b, c in combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                cnt[n] = cnt.get(n, 0) + 1
    return cnt


def _tri_run(spark, edges):
    from osm2geojson_spark.operators.graph import triangle_count
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["n_tri"] for r in triangle_count(df).collect()}


def test_triangle_clique_and_star(spark):
    k5 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    assert _tri_run(spark, k5) == {i: 6 for i in range(5)}  # C(4,2)
    star = [(0, i) for i in range(1, 10)]
    assert _tri_run(spark, star) == {}  # bipartite: none


def test_triangle_random_vs_bruteforce(spark):
    import random
    rng = random.Random(11)
    edges = list({(rng.randint(0, 30), rng.randint(0, 30))
                  for _ in range(150)})
    assert _tri_run(spark, edges) == _tri_brute(edges)


def test_triangle_duplicate_and_reversed_edges_collapse(spark):
    tri = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1), (1, 1)]
    assert _tri_run(spark, tri) == {1: 1, 2: 1, 3: 1}


def _kc(spark, edges, k):
    from osm2geojson_spark.operators.graph import k_core
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["deg"] for r in k_core(df, k).collect()}


def test_k_core_clique_plus_tail(spark):
    # K5 with a pendant path: 3-core = the clique, tail peels off in
    # cascading rounds (5->6->7 each depend on the previous removal)
    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    tail = [(4, 5), (5, 6), (6, 7)]
    got = _kc(spark, clique + tail, 3)
    assert got == {n: 4 for n in range(5)}


def test_k_core_matches_pyref_random(spark):
    rng = np.random.RandomState(7)
    edges = [(int(a), int(b)) for a, b in rng.randint(0, 60, (400, 2))]
    for k in (2, 3, 5):
        got = _kc(spark, edges, k)
        assert sorted(got.items()) == pyref.ref_k_core(edges, k)


def test_k_core_duplicate_and_self_edges_ignored(spark):
    # parallel edges must not inflate degree; self-loops dropped
    edges = [(1, 2)] * 10 + [(2, 1)] * 5 + [(3, 3)] * 8 + [(2, 3), (3, 1)]
    got = _kc(spark, edges, 2)
    assert got == {1: 2, 2: 2, 3: 2}


def test_k_core_empty_result(spark):
    got = _kc(spark, [(1, 2), (2, 3)], 2)
    assert got == {}
