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
