from __future__ import annotations

import numpy as np

from osm2geojson_spark.operators.similarity import (
    gram_matrix,
    pca_project,
    vector_moments,
)
from osm2geojson_spark.pyref import jacobi_eigh


def synth_vectors(n: int = 400, d: int = 12) -> np.ndarray:
    """Deterministic anisotropic cloud: one dominant planted axis."""
    i = np.arange(n)[:, None]
    j = np.arange(d)[None, :]
    base = np.sin(i * 0.37 + j * 1.3) * 0.05
    planted = np.sin(i * 0.11) * (j == 3) * 0.4
    return (base + planted).astype(np.float32)


def vec_df(spark, v: np.ndarray, parts: int):
    import pandas as pd

    return spark.createDataFrame(pd.DataFrame({
        "vec_id": np.arange(len(v), dtype="int64"),
        "embedding": [row.tolist() for row in v]})).repartition(parts)


def test_gram_matches_numpy_across_partitionings(spark):
    v = synth_vectors()
    q = np.floor(v.astype(np.float64) * (1 << 20)).astype(np.int64)
    want = q.T @ q
    for parts in (1, 7):
        rows = gram_matrix(vec_df(spark, v, parts)).collect()
        assert len(rows) == 12 * 13 // 2
        for r in rows:
            assert r["g"] == want[r["i"] - 1, r["j"] - 1], (r["i"], r["j"])


def test_moments_match_numpy(spark):
    v = synth_vectors()
    q = np.floor(v.astype(np.float64) * (1 << 20)).astype(np.int64)
    got = {r["i"]: r["s"] for r in
           vector_moments(vec_df(spark, v, 5)).collect()}
    assert got[0] == len(v)
    for i in range(12):
        assert got[i + 1] == int(q[:, i].sum())


def test_jacobi_matches_lapack_subspace():
    v = synth_vectors().astype(np.float64)
    c = (v - v.mean(axis=0)).T @ (v - v.mean(axis=0))
    vals, vecs = jacobi_eigh(c)
    w = np.linalg.eigvalsh(c)
    assert np.allclose(np.sort(vals), w)
    assert np.allclose(vecs @ np.diag(vals) @ vecs.T, c)
    assert np.allclose(vecs.T @ vecs, np.eye(12))
    assert list(vals) == sorted(vals, reverse=True)


def test_projection_finds_planted_axis(spark):
    v = synth_vectors()
    rows = pca_project(vec_df(spark, v, 6), k=2).orderBy("vec_id").collect()
    assert len(rows) == len(v)
    z1 = np.array([r["z1"] for r in rows], dtype=np.float64)
    # PC1 must track the planted dim-3 signal (up to sign)
    sig = np.sin(np.arange(len(v)) * 0.11)
    corr = np.corrcoef(z1, sig)[0, 1]
    assert abs(corr) > 0.99
    # exact integer projection: independent pyref replay is identical
    from osm2geojson_spark.pyref import ref_pca_project

    ref = ref_pca_project(list(range(len(v))),
                          [row.tolist() for row in v], k=2)
    got = [(r["vec_id"], r["z1"], r["z2"]) for r in rows]
    assert got == ref
