"""ANN recall floors vs the exact brute-force baseline, on the driver's
embeddings table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm2geojson_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_ivf,
    cosine_topk_lsh,
)

SF = "/root/testdata/sf0.01"
K = 5
N_QUERIES = 20


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def exact(emb, spark):
    q = emb.filter(F.col("vec_id") < N_QUERIES)
    rows = cosine_topk_bruteforce(emb, q, k=K).collect()
    out: dict[int, set] = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["corpus_id"])
    return out


def _recall(approx_rows, exact_map) -> float:
    got: dict[int, set] = {}
    for r in approx_rows:
        got.setdefault(r["query_id"], set()).add(r["corpus_id"])
    hits = sum(len(got.get(qid, set()) & want) for qid, want in exact_map.items())
    return hits / (len(exact_map) * K)


def test_bruteforce_self_top1(emb, exact):
    """Every query's own vector must rank #1 (cosine 1)."""
    for qid, want in exact.items():
        assert qid in want


def test_ivf_recall_floor(emb, exact, spark):
    q = emb.filter(F.col("vec_id") < N_QUERIES)
    rows = cosine_topk_ivf(emb, q, k=K, n_centroids=16, nprobe=6).collect()
    r = _recall(rows, exact)
    assert r >= 0.6, f"IVF recall@{K} = {r}"


def test_ivf_full_probe_is_exact(emb, exact, spark):
    """nprobe == n_centroids degenerates to exact search."""
    q = emb.filter(F.col("vec_id") < N_QUERIES)
    rows = cosine_topk_ivf(emb, q, k=K, n_centroids=8, nprobe=8).collect()
    assert _recall(rows, exact) == 1.0


def test_lsh_recall_floor(emb, exact, spark):
    q = emb.filter(F.col("vec_id") < N_QUERIES)
    # few planes: the synthetic embeddings are near-orthogonal (max
    # pairwise cosine ~0.5), so tight buckets would starve candidates
    rows = cosine_topk_lsh(emb, q, k=K, dim=64, n_planes=4, n_tables=12).collect()
    r = _recall(rows, exact)
    assert r >= 0.7, f"LSH recall@{K} = {r}"


def test_ivf_matches_pure_numpy_recompute(emb, spark):
    """Beyond the recall floor: the Spark IVF pipeline (UDF assignment →
    cluster equi-join → window top-k) must EXACTLY equal a driver-side
    numpy recompute with the same centroids — pins the distributed
    plumbing, not just the quality."""
    import numpy as np

    from osm2geojson_spark.operators.similarity import kmeans_centroids

    k, n_centroids, nprobe = 5, 8, 3
    cent = kmeans_centroids(emb, n_centroids=n_centroids, sample=1000)
    q = emb.filter(F.col("vec_id") < N_QUERIES)
    got = {(r["query_id"], r["rank"]): (r["corpus_id"], r["cosine"])
           for r in cosine_topk_ivf(emb, q, k=k, n_centroids=n_centroids,
                                    nprobe=nprobe, centroids=cent).collect()}

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    corpus_cluster = np.argmax(Xn @ cent.T, axis=1)
    want = {}
    for qi in range(len(ids)):
        if ids[qi] >= N_QUERIES:
            continue
        probes = np.argsort(-(Xn[qi] @ cent.T))[:nprobe]
        cand = np.flatnonzero(np.isin(corpus_cluster, probes))
        # same double arithmetic as cosine_expr: dot / (|a| * |b|)
        dots = X[cand] @ X[qi]
        cos = dots / (np.linalg.norm(X[cand], axis=1) * np.linalg.norm(X[qi]))
        order = sorted(range(len(cand)), key=lambda j: (-cos[j], ids[cand[j]]))
        for rank, j in enumerate(order[:k], start=1):
            want[(int(ids[qi]), rank)] = (int(ids[cand[j]]), cos[j])
    assert set(got) == set(want)
    for key, (cid, cos) in want.items():
        gcid, gcos = got[key]
        assert gcid == cid, key
        assert abs(gcos - cos) < 1e-12, key
