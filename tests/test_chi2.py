from __future__ import annotations

import numpy as np

from osm2geojson_spark.operators.stats import cramers_v2_ppb, contingency_chi2


def pairs_df(spark, a_vals, b_vals):
    import pandas as pd

    return spark.createDataFrame(pd.DataFrame({
        "ca": a_vals, "cb": b_vals})).repartition(4)


def brute_cells(a_vals, b_vals):
    from collections import Counter

    o = Counter(zip(a_vals, b_vals))
    avs, bvs = sorted(set(a_vals)), sorted(set(b_vals))
    r = Counter(a_vals)
    c = Counter(b_vals)
    n = len(a_vals)
    out = {}
    for a in avs:
        for b in bvs:
            dev = o[(a, b)] * n - r[a] * c[b]
            out[(a, b)] = (o[(a, b)], r[a], c[b], n,
                           1_000_000 * dev * dev // (n * r[a] * c[b]))
    return out


def test_cells_match_bruteforce_including_zeros(spark):
    i = np.arange(300)
    a = (i % 4).tolist()
    b = ((i * 7 + i // 5) % 6).tolist()
    # force a structurally-missing cell: erase every (3, 4) pair
    a = [x if not (x == 3 and y == 4) else 0 for x, y in zip(a, b)]
    got = {(r["a"], r["b"]): (r["o"], r["r"], r["c"], r["n"],
                              r["cell_ppm"])
           for r in contingency_chi2(pairs_df(spark, a, b),
                                     "ca", "cb").collect()}
    want = brute_cells(a, b)
    assert got == want
    assert any(v[0] == 0 and v[4] > 0 for v in got.values())  # zero cell


def test_independent_columns_have_tiny_v2(spark):
    i = np.arange(4000)
    a = (i % 4).tolist()           # perfectly balanced independent grids
    b = ((i // 4) % 5).tolist()
    r = cramers_v2_ppb(contingency_chi2(
        pairs_df(spark, a, b), "ca", "cb")).collect()[0]
    assert r["chi2_ppm"] == 0      # exact independence
    assert r["v2_ppb"] == 0


def test_perfect_association_v2_is_one(spark):
    i = np.arange(900)
    a = (i % 3).tolist()
    b = [x * 10 for x in a]        # b determined by a
    r = cramers_v2_ppb(contingency_chi2(
        pairs_df(spark, a, b), "ca", "cb")).collect()[0]
    # chi2 = N·(k−1) exactly; V² = 1
    assert r["chi2_ppm"] == 1_000_000 * 900 * 2
    assert r["v2_ppb"] == 1_000_000_000
