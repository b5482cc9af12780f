"""Scale-hardening tests for the dedup/similarity family (round 2):

- pair_jaccard candidate mode must score ONLY the supplied pairs (no
  inverted-index self-join) and agree value-for-value with discovery mode.
- ngram_jaccard_pairs max_df document-frequency cap prunes boilerplate
  shingles consistently (candidates AND sizes).
- bucket caps (simhash / phash / embedding near-dup) prune planted hot
  buckets without touching surviving pairs' values.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm2geojson_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    pair_jaccard,
    shingle_postings,
    simhash_near_dup_pairs,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet").cache()
    df.count()
    return df


def test_pair_jaccard_candidate_mode_matches_discovery(spark, docs):
    """Candidate mode is a pure restriction of discovery mode: same
    jaccard per pair, plus zero-rows for no-overlap candidates."""
    postings = shingle_postings(docs).persist()
    full = {(r["id_a"], r["id_b"]): r["jaccard"]
            for r in pair_jaccard(postings).collect()}
    some = sorted(full)[:10]
    ids = sorted({i for p in some for i in p})
    # include one pair guaranteed to share no shingle? use two ids whose
    # pair is absent from `full` (no shared shingle) if one exists
    no_overlap = None
    for a in ids:
        for b in ids:
            if a < b and (a, b) not in full:
                no_overlap = (a, b)
                break
        if no_overlap:
            break
    cand = list(some) + ([no_overlap] if no_overlap else [])
    pairs = spark.createDataFrame(cand, "id_a long, id_b long")
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in pair_jaccard(postings, pairs).collect()}
    assert set(got) == set(cand)
    for p in some:
        assert got[p] == pytest.approx(full[p], abs=0.0), p
    if no_overlap:
        assert got[no_overlap] == 0.0
    postings.unpersist()


def test_pair_jaccard_candidate_plan_has_no_self_join(spark, docs):
    """Plan audit (VERDICT r1 №1): with candidates supplied, the scoring
    plan must contain NO non-equi join — the quadratic inverted-index
    self-join's signature is its `id < id` condition. All joins in the
    candidate path are pure equi-joins."""
    postings = shingle_postings(docs)
    pairs = spark.createDataFrame([(0, 1), (2, 3)], "id_a long, id_b long")
    plan = pair_jaccard(postings, pairs)._jdf.queryExecution().optimizedPlan().toString()
    join_lines = [ln for ln in plan.splitlines() if "Join" in ln]
    assert join_lines, "expected joins in the candidate-mode plan"
    for ln in join_lines:
        assert " < " not in ln, f"non-equi (self-join) condition leaked: {ln}"
    # discovery mode DOES carry the non-equi self-join — sanity-check the
    # detector actually detects it
    plan_full = pair_jaccard(postings)._jdf.queryExecution().optimizedPlan().toString()
    assert any(" < " in ln for ln in plan_full.splitlines() if "Join" in ln)


def test_minhash_plan_scores_candidates_only(spark, docs):
    """Every non-equi join in the minhash_lsh_pairs plan must be the LSH
    banding join (condition on band/bucket) — the scoring path must add NO
    unfiltered postings self-join (whose signature would be a `g = g AND
    id < id` condition without band columns). Plan copies under cached
    (InMemoryRelation) subtrees are fine — they execute once."""
    plan = minhash_lsh_pairs(docs)._jdf.queryExecution().optimizedPlan().toString()
    nonequi = [ln for ln in plan.splitlines() if "Join" in ln and " < " in ln]
    assert nonequi, "expected the LSH banding join in the plan"
    for ln in nonequi:
        assert "band" in ln, f"non-banding non-equi join (postings self-join?): {ln.strip()[:160]}"


def test_minhash_pairs_values_unchanged_by_rewrite(spark, docs):
    """The candidate-mode rewrite must not change minhash output values:
    every emitted pair's jaccard equals the exact postings jaccard."""
    got = minhash_lsh_pairs(docs).collect()
    assert got, "minhash produced no pairs on sf0.001"
    postings = shingle_postings(docs).persist()
    exact = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in pair_jaccard(postings).collect()}
    for r in got:
        key = (r["id_a"], r["id_b"])
        want = exact.get(key, 0.0)
        assert r["jaccard"] == pytest.approx(want, abs=0.0), key
    postings.unpersist()


def test_ngram_max_df_prunes_boilerplate(spark):
    """Docs sharing ONLY a boilerplate shingle pair up without the cap and
    are pruned with it; genuinely similar docs survive with jaccard
    recomputed over the capped shingle universe."""
    boiler = "standard legal disclaimer text"
    rows = [(i, f"unique words {i} alpha beta {boiler}") for i in range(8)]
    rows += [(100, "the quick brown fox jumps high"),
             (101, "the quick brown fox jumps far")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = {(r["id_a"], r["id_b"])
                for r in ngram_jaccard_pairs(docs, threshold=0.05).collect()}
    capped = {(r["id_a"], r["id_b"])
              for r in ngram_jaccard_pairs(docs, threshold=0.05, max_df=4).collect()}
    assert (100, 101) in uncapped and (100, 101) in capped
    boiler_pairs = {p for p in uncapped if p[0] < 100 and p[1] < 100}
    assert boiler_pairs, "boilerplate docs should pair without the cap"
    assert not (capped & boiler_pairs), "df-cap must prune boilerplate-only pairs"


def test_simhash_bucket_cap_subset(spark):
    """Planted hot bucket (identical docs) pruned by the cap; surviving
    pairs keep identical hamming values."""
    rows = [(i, "identical boilerplate document body here") for i in range(10)]
    rows += [(100, "some other distinct words entirely one"),
             (101, "some other distinct words entirely two")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    full = {(r["id_a"], r["id_b"]): r["hamming"]
            for r in simhash_near_dup_pairs(docs, max_hamming=10).collect()}
    capped = {(r["id_a"], r["id_b"]): r["hamming"]
              for r in simhash_near_dup_pairs(
                  docs, max_hamming=10, max_bucket_size=4).collect()}
    assert set(capped) <= set(full)
    for k, v in capped.items():
        assert v == full[k]
    hot = {p for p in full if p[0] < 100 and p[1] < 100}
    assert hot and not (set(capped) & hot)


def test_phash_bucket_cap_subset(spark):
    from osm2geojson_spark.operators.images import phash_near_dup_pairs

    rows = [(f"img{i:03d}", 0x1234_5678_9ABC_DEF0) for i in range(10)]
    rows += [("imgx", 0x0F0F_0F0F_0F0F_0F0F), ("imgy", 0x0F0F_0F0F_0F0F_0F0E)]
    imgs = spark.createDataFrame(rows, "image_id string, phash long")
    full = {(r["id_a"], r["id_b"]): r["hamming"]
            for r in phash_near_dup_pairs(imgs).collect()}
    capped = {(r["id_a"], r["id_b"]): r["hamming"]
              for r in phash_near_dup_pairs(imgs, max_bucket_size=4).collect()}
    assert set(capped) <= set(full)
    for k, v in capped.items():
        assert v == full[k]
    assert ("imgx", "imgy") in capped
    hot = {p for p in full if p[0].startswith("img0") or p[0].startswith("img1")}
    hot = {p for p in hot if p not in {("imgx", "imgy")}}
    assert hot and not (set(capped) & hot)


def test_embedding_bucket_cap_subset(spark):
    from osm2geojson_spark.operators.similarity import embedding_near_dup_pairs

    # 10 identical vectors (hot bucket) + 2 near-identical distinct ones
    base = [0.1 * ((i % 7) + 1) for i in range(64)]
    near = list(base)
    near[0] += 0.001
    rows = [(i, [1.0] + [0.0] * 63) for i in range(10)]
    rows += [(100, base), (101, near)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    full = {(r["id_a"], r["id_b"]) for r in
            embedding_near_dup_pairs(emb, threshold=0.99).collect()}
    capped = {(r["id_a"], r["id_b"]) for r in
              embedding_near_dup_pairs(
                  emb, threshold=0.99, max_bucket_size=4).collect()}
    assert capped <= full
    assert (100, 101) in capped
    hot = {p for p in full if p[0] < 100}
    assert hot and not (capped & hot)


def test_ivf_centroids_deterministic_across_layout(spark):
    """kmeans_centroids must not depend on partition layout (ADVICE r1:
    bare limit is layout-dependent). Same corpus, different partitioning →
    identical centroids."""
    import numpy as np

    from osm2geojson_spark.operators.similarity import kmeans_centroids

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    c1 = kmeans_centroids(emb.repartition(1), n_centroids=8, sample=200)
    c2 = kmeans_centroids(emb.repartition(7, "vec_id"), n_centroids=8, sample=200)
    assert np.array_equal(c1, c2)


def test_dup_clusters_components(spark):
    """Min-label propagation: chain, clique, and pair converge to their
    min-id roots; keep-list marks exactly one representative each."""
    from osm2geojson_spark.operators.dedup import dedup_keep_list, dup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),          # chain 1-2-3-4
         (10, 11), (10, 12), (11, 12),    # clique {10,11,12}
         (20, 21)],                       # pair
        "id_a long, id_b long")
    got = {r["id"]: r["cluster_id"] for r in dup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    keep = {r["id"]: r["keep"] for r in dedup_keep_list(pairs).collect()}
    assert {k for k, v in keep.items() if v} == {1, 10, 20}


def test_dup_clusters_long_chain_converges(spark):
    """A 12-node path needs diameter rounds of min-label propagation;
    the loop (localCheckpoint-truncated lineage) must converge within
    max_iters and label everything with the chain head."""
    from osm2geojson_spark.operators.dedup import dup_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long")
    got = {r["id"]: r["cluster_id"]
           for r in dup_clusters(pairs, max_iters=20).collect()}
    assert set(got.values()) == {0} and len(got) == 13


def test_dup_clusters_nonconvergence_raises(spark):
    """A 12-node chain has diameter 11 > max_iters=3: must fail loudly,
    not return partially-converged labels (ADVICE round-2)."""
    import pytest
    from osm2geojson_spark.operators.dedup import dup_clusters

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        dup_clusters(chain, max_iters=3)
    # and with enough rounds the same chain fully converges to label 0
    out = dup_clusters(chain, max_iters=15)
    assert {r["cluster_id"] for r in out.collect()} == {0}
