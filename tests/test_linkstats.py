"""Otsu thresholding (operators/stats) + link prediction
(operators/graph) vs brute-force references."""

import itertools

import numpy as np
import pytest

from osm2geojson_spark.operators.graph import link_prediction
from osm2geojson_spark.operators.stats import otsu_curve, otsu_threshold


def test_otsu_matches_float_reference(spark):
    rng = np.random.RandomState(3)
    vals = np.concatenate([rng.randint(5, 40, 300),
                           rng.randint(150, 230, 200)])
    df = spark.createDataFrame([(int(v),) for v in vals], "v long")
    got = otsu_threshold(df, "v")
    best, bv = None, -1.0
    for t in sorted(set(vals.tolist()))[:-1]:
        c0, c1 = vals[vals <= t], vals[vals > t]
        s = len(c0) * len(c1) * (c0.mean() - c1.mean()) ** 2
        if s > bv:
            bv, best = s, t
    assert got == best


def test_otsu_curve_algebra(spark):
    df = spark.createDataFrame([(v,) for v in (1, 1, 2, 5, 5, 5)],
                               "v long")
    rows = {r["t"]: (r["num"], r["den"])
            for r in otsu_curve(df, "v").collect()}
    # N=6, S=19. t=2: n0=3, s0=4 → num=(24-57)^2=1089, den=9
    assert rows[2] == (1089, 9)
    assert rows[5] == (0, 0)  # full mass left: den 0, num 0


def test_otsu_guard(spark):
    df = spark.createDataFrame([(7,), (7,)], "v long")
    with pytest.raises(ValueError):
        otsu_threshold(df, "v")


EDGES = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 5), (5, 6), (2, 1)]


def _ref_lp(edges):
    e = {tuple(sorted(p)) for p in edges}
    nodes = sorted({n for p in e for n in p})
    adj = {n: set() for n in nodes}
    for u, v in e:
        adj[u].add(v)
        adj[v].add(u)
    out = {}
    for u, v in itertools.combinations(nodes, 2):
        if (u, v) in e:
            continue
        cn = len(adj[u] & adj[v])
        if cn:
            out[(u, v)] = (cn, len(adj[u]), len(adj[v]),
                           len(adj[u]) * len(adj[v]))
    return out


def test_link_prediction_bruteforce(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {(r["u"], r["v"]): (r["cn"], r["deg_u"], r["deg_v"], r["pa"])
           for r in link_prediction(df).collect()}
    assert got == _ref_lp(EDGES)


def test_link_prediction_hub_cap(spark):
    # star: hub 0 connects 1..9; every leaf pair shares only hub 0
    star = [(0, i) for i in range(1, 10)]
    df = spark.createDataFrame(star, "src long, dst long")
    assert link_prediction(df).count() == 36
    assert link_prediction(df, max_degree=5).count() == 0


def test_ols_trend_exact_line(spark):
    # y = 3x + 5 exactly → slope_num/den == 3, icept_num/den == 5
    from osm2geojson_spark.queries import q_ols_trend  # noqa: F401
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(int(x), 3 * x + 5) for x in range(1, 21)], "x long, y long")
    a = df.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy")).collect()[0]
    num = a["n"] * a["sxy"] - a["sx"] * a["sy"]
    den = a["n"] * a["sxx"] - a["sx"] * a["sx"]
    icept = a["sy"] * a["sxx"] - a["sx"] * a["sxy"]
    assert num == 3 * den
    assert icept == 5 * den


def test_exact_quantiles_bruteforce(spark):
    import random

    from osm2geojson_spark.operators.stats import exact_quantiles

    rng = random.Random(9)
    vals = [rng.uniform(0, 1000) for _ in range(3000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    ps = [1, 250_000, 500_000, 750_000, 1_000_000]
    got = {r["p_ppm"]: (r["k"], r["value"])
           for r in exact_quantiles(df, "x", ps).collect()}
    sv = sorted(vals)
    n = len(sv)
    for p in ps:
        k = (p * n + 999_999) // 1_000_000
        assert got[p] == (k, sv[k - 1]), p
    # max and min land on actual extremes
    assert got[1_000_000][1] == sv[-1]
    assert got[1][1] == sv[0]


def test_exact_quantiles_auto_coarsen(spark):
    """A pathological value spread (every row its own bucket, values
    spanning 2^50) must self-coarsen instead of building a histogram
    window with one row per input row — and stay EXACT: coarsening
    only merges buckets, the in-bucket sort still picks the true
    order statistic."""
    import random

    from osm2geojson_spark.operators.stats import exact_quantiles

    rng = random.Random(21)
    vals = [float(rng.randrange(1 << 50)) for _ in range(4000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    ps = [1, 100_000, 500_000, 900_000, 1_000_000]
    got = {r["p_ppm"]: (r["k"], r["value"])
           for r in exact_quantiles(df, "x", ps,
                                    max_buckets=100).collect()}
    sv = sorted(vals)
    n = len(sv)
    for p in ps:
        k = (p * n + 999_999) // 1_000_000
        assert got[p] == (k, sv[k - 1]), p


def test_exact_quantiles_guards(spark):
    from osm2geojson_spark.operators.stats import exact_quantiles

    df = spark.createDataFrame([(1.0,)], "x double")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        exact_quantiles(df, "x", [])
    with _pytest.raises(ValueError):
        exact_quantiles(df, "x", [0])
    with _pytest.raises(ValueError):
        exact_quantiles(df.where("x > 5"), "x", [500_000])


def test_clustering_coeff_bruteforce(spark):
    import itertools

    from osm2geojson_spark.operators.graph import clustering_coeff

    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 3), (5, 6),
             (6, 1), (2, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: (r["deg"], r["n_tri"], r["possible"])
           for r in clustering_coeff(df).collect()}

    e = {tuple(sorted(p)) for p in edges}
    nodes = sorted({n for p in e for n in p})
    adj = {n: set() for n in nodes}
    for u, v in e:
        adj[u].add(v)
        adj[v].add(u)
    for n in nodes:
        tri = sum(1 for a, b in itertools.combinations(sorted(adj[n]), 2)
                  if (a, b) in e)
        d = len(adj[n])
        assert got[n] == (d, tri, d * (d - 1) // 2), n
