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
