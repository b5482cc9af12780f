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


# ------------------------------------------------------------------- PQ

def test_pq_recall_floor(emb, exact, spark):
    from osm2geojson_spark.operators.similarity import cosine_topk_pq

    q = emb.filter(F.col("vec_id") < N_QUERIES)
    rows = cosine_topk_pq(emb, q, k=K, m=8, n_codes=16, refine=64).collect()
    assert _recall(rows, exact) >= 0.75


def test_pq_full_refine_is_exact(emb, exact, spark):
    """refine = corpus size ⇒ the ADC cut keeps everything, so the
    exact-cosine re-rank must equal brute force outright."""
    from osm2geojson_spark.operators.similarity import cosine_topk_pq

    n = emb.count()
    q = emb.filter(F.col("vec_id") < 5)
    rows = cosine_topk_pq(emb, q, k=K, m=4, n_codes=16, refine=n).collect()
    got = {(r["query_id"], r["rank"]): r["corpus_id"] for r in rows}
    brute = {(r["query_id"], r["rank"]): r["corpus_id"]
             for r in cosine_topk_bruteforce(emb, q, k=K).collect()}
    assert got == brute


def test_pq_matches_pure_numpy_recompute(emb, spark):
    """Bit-exact end-to-end parity with pyref.ref_pq_topk (ids, cosines,
    ranks) — codebook sample order, rng stream, lexsort cut, fold-order
    cosine all replicated."""
    from osm2geojson_spark.operators.similarity import cosine_topk_pq
    from osm2geojson_spark.pyref import ref_pq_topk

    data = [(r["vec_id"], list(r["embedding"])) for r in
            emb.select("vec_id", "embedding").collect()]
    want = {(r[0], r[1]): (r[2], r[3])
            for r in ref_pq_topk([d[0] for d in data], [d[1] for d in data],
                                 query_max_id=10, k=K, m=4, n_codes=16,
                                 refine=32)}
    q = emb.filter(F.col("vec_id") < 10)
    rows = cosine_topk_pq(emb, q, k=K, m=4, n_codes=16, refine=32).collect()
    got = {(r["query_id"], r["corpus_id"]): (r["cosine"], r["rank"])
           for r in rows}
    assert got.keys() == want.keys()
    for key, (cos, rank) in want.items():
        gcos, grank = got[key]
        assert grank == rank and gcos == cos, key


def test_pq_partition_invariance(emb, spark):
    """The per-partition partial top-refine cut must not depend on the
    partition layout (total order ⇒ associative top-R)."""
    from osm2geojson_spark.operators.similarity import cosine_topk_pq

    q = emb.filter(F.col("vec_id") < 5)
    a = sorted(map(tuple, cosine_topk_pq(
        emb.repartition(1), q, k=K, refine=32).collect()))
    b = sorted(map(tuple, cosine_topk_pq(
        emb.repartition(7), q, k=K, refine=32).collect()))
    assert a == b


def test_pq_codes_shape(emb, spark):
    from osm2geojson_spark.operators.similarity import (
        pq_codebooks,
        pq_encode,
    )

    books = pq_codebooks(emb, m=4, n_codes=16)
    assert books.shape == (4, 16, 16)
    codes = pq_encode(emb, books).collect()
    for r in codes:
        assert len(r["codes"]) == 4
        assert all(0 <= c < 16 for c in r["codes"])
