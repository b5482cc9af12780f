from __future__ import annotations

import numpy as np
import pandas as pd

from osm2geojson_spark.operators.als import als_factors
from osm2geojson_spark.pyref import ref_als_factors, solve_linear


def synth_ratings():
    return [(u, i, float((u * 7 + i * 13) % 5 + 1))
            for u in range(40) for i in range(30) if (u + i) % 3 == 0]


def ratings_df(spark, rats, parts):
    return spark.createDataFrame(
        pd.DataFrame(rats, columns=["user", "item", "r"])).repartition(parts)


def quant(f):
    return np.floor(np.asarray(f) * (1 << 20)).astype(np.int64).tolist()


def test_solver_matches_lapack():
    rng = np.random.default_rng(5)
    for _ in range(5):
        m = rng.normal(size=(8, 8))
        a = m @ m.T + np.eye(8) * 0.1
        b = rng.normal(size=8)
        assert np.allclose(solve_linear(a, b), np.linalg.solve(a, b))


def test_bit_parity_with_pyref_across_partitionings(spark):
    rats = synth_ratings()
    want = {u: list(q) for u, *q in ref_als_factors(
        [(u, i, int(r)) for u, i, r in rats], d=4, lam=0.1, iters=2)}
    for parts in (1, 7):
        fu, _ = als_factors(ratings_df(spark, rats, parts),
                            d=4, lam=0.1, iters=2)
        got = {r["user"]: quant(r["f"]) for r in fu.collect()}
        assert got == want, parts


def test_reconstruction_improves_with_iterations(spark):
    rats = synth_ratings()
    df = ratings_df(spark, rats, 4)

    def rmse(iters):
        fu, fi = als_factors(df, d=4, lam=0.1, iters=iters)
        u = {r["user"]: np.asarray(r["f"]) for r in fu.collect()}
        i = {r["item"]: np.asarray(r["f"]) for r in fi.collect()}
        errs = [(float(np.dot(u[a], i[b])) - r) ** 2 for a, b, r in rats]
        return float(np.sqrt(np.mean(errs)))

    e1, e3 = rmse(0), rmse(2)
    assert e3 < e1 * 0.9          # alternation genuinely optimizes
    assert e3 < 1.5               # and lands in a sane range
