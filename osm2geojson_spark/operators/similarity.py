"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk_bruteforce` — exact top-k, the correctness baseline.
  Dot products via zip_with/aggregate (JVM-side, sums in index order so the
  DuckDB oracle's list_dot_product matches bit-for-bit on doubles).
- :func:`cosine_topk_lsh` — the scale path: random-hyperplane LSH buckets
  shrink the candidate set; query side broadcast when small.
- :func:`embedding_near_dup_pairs` — near-duplicate pairs (cosine ≥ τ)
  via the same LSH bucketing, for embedding-based dedup.

At 100 TB the corpus side stays partitioned; only queries/centroids are
broadcast. No cross join without a bucket equi-prefilter (except the
explicitly-named bruteforce baseline).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dot_expr(a: Column, b: Column) -> Column:
    """Index-order double-precision dot product."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk_bruteforce(
    corpus: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact kNN: broadcast queries x corpus, window top-k.
    Deterministic tie-break on corpus id."""
    from pyspark.sql import Window

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("cv"))
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id", "corpus_id", cosine_expr(F.col("qv"), F.col("cv")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: bit i = sign(vec . plane_i)."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        d = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(x) for x in p]),
                       lambda a, b: a.cast("double") * b),
            F.lit(0.0), lambda acc, v: acc + v,
        )
        bucket = bucket.bitwiseOR(
            F.when(d > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        )
    return bucket


def cosine_topk_lsh(
    corpus: DataFrame, queries: DataFrame, k: int = 5, dim: int = 64,
    n_planes: int = 8, n_tables: int = 4, seed: int = 3,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Approximate kNN: n_tables independent hyperplane bucketings; a
    corpus row is a candidate if it shares a bucket in ANY table. One
    equi-join per union leg on (table, bucket) — shuffle keyed on buckets,
    never all-pairs. Recall tunable via n_planes/n_tables."""
    from pyspark.sql import Window

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("cv"))
    legs = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        qb = q.withColumn("bucket", lsh_bucket_expr(F.col("qv"), planes))
        cb = c.withColumn("bucket", lsh_bucket_expr(F.col("cv"), planes))
        legs.append(cb.join(F.broadcast(qb), "bucket").drop("bucket"))
    cand = legs[0]
    for leg in legs[1:]:
        cand = cand.unionByName(leg)
    cand = cand.dropDuplicates(["query_id", "corpus_id"])
    scored = cand.select(
        "query_id", "corpus_id", cosine_expr(F.col("qv"), F.col("cv")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def kmeans_centroids(
    corpus: DataFrame, n_centroids: int = 16, dim: int = 64,
    iters: int = 8, sample: int = 4096, seed: int = 13,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> np.ndarray:
    """Seeded Lloyd's k-means on a driver-side SAMPLE (the coarse
    quantizer is tiny — centroids broadcast everywhere; only the sample
    ever leaves the executors). Deterministic: fixed seed, fixed sample
    (sorted limit), numpy float64.

    The sample is sorted by ``id_col`` BEFORE the limit: a bare
    ``limit(n)`` is partition-layout dependent in Spark, so centroids
    (and IVF recall) would otherwise vary with parallelism/input splits.
    Sort+limit compiles to TakeOrderedAndProject (per-partition top-n +
    driver merge), not a full sort — cheap even on a big corpus."""
    rows = (
        corpus.select(id_col, vec_col).orderBy(id_col)
        .limit(sample).select(vec_col).collect()
    )
    x = np.asarray([list(r[0]) for r in rows], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ cent.T
        assign = np.argmax(sims, axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = x[m].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def _cluster_assign_udf(cent: np.ndarray, nprobe: int):
    """Vectorized batch matmul → top-nprobe cluster ids per vector."""

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def assign(vec: pd.Series) -> pd.Series:
        x = np.asarray([np.asarray(v, dtype=np.float64) for v in vec])
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        sims = x @ cent.T
        top = np.argsort(-sims, axis=1)[:, :nprobe].astype(np.int32)
        return pd.Series(list(top))

    return assign


def cosine_topk_ivf(
    corpus: DataFrame, queries: DataFrame, k: int = 5,
    n_centroids: int = 16, nprobe: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF-style ANN: corpus rows live in their nearest-centroid cluster
    (1 int per row); queries probe their ``nprobe`` nearest clusters.
    The join is an equi-join on cluster id — shuffle keyed on ≤
    n_centroids values, never all-pairs; the centroid table travels in
    the UDF closure (broadcast). Recall grows with nprobe/n_centroids
    (pytest pins a floor vs brute force)."""
    from pyspark.sql import Window

    cent = centroids if centroids is not None else kmeans_centroids(
        corpus, n_centroids, vec_col=vec_col, id_col=id_col)
    c_assign = _cluster_assign_udf(cent, 1)
    q_assign = _cluster_assign_udf(cent, nprobe)
    c = corpus.select(
        F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("cv")
    ).withColumn("cluster", F.element_at(c_assign(F.col("cv")), 1))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("cluster", F.explode(q_assign(F.col("qv"))))
    cand = c.join(F.broadcast(q), "cluster").drop("cluster")
    scored = cand.select(
        "query_id", "corpus_id", cosine_expr(F.col("qv"), F.col("cv")).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "corpus_id", "cosine", "rank"))


def embedding_near_dup_exact(
    df: DataFrame, threshold: float = 0.95,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """EXACT near-duplicate pairs (id_a < id_b, cosine ≥ τ) — the O(n²)
    correctness baseline for :func:`embedding_near_dup_pairs`, same role
    brute-force top-k plays for ANN. Bound the corpus before calling."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine_expr(F.col("va"), F.col("vb")).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def embedding_near_dup_pairs(
    df: DataFrame, threshold: float = 0.95, dim: int = 64,
    n_planes: int = 12, n_tables: int = 3, seed: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥ τ).

    ``max_bucket_size`` caps pathological LSH buckets (e.g. a spike of
    zero/constant vectors all hashing to one bucket emits B²/2 pairs) —
    same skew guard as the text-dedup family (dedup.cap_bucket_size)."""
    from .dedup import cap_bucket_size

    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    legs = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        b = base.withColumn("bucket", lsh_bucket_expr(F.col("v"), planes))
        b = cap_bucket_size(b, ["bucket"], max_bucket_size)
        legs.append(
            b.alias("a").join(
                b.alias("b"),
                (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")),
            ).select(
                F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a.v").alias("va"), F.col("b.v").alias("vb"),
            )
        )
    cand = legs[0]
    for leg in legs[1:]:
        cand = cand.unionByName(leg)
    cand = cand.dropDuplicates(["id_a", "id_b"])
    return cand.select(
        "id_a", "id_b", cosine_expr(F.col("va"), F.col("vb")).alias("cosine")
    ).filter(F.col("cosine") >= threshold)


# ------------------------------------------------------------------ PQ
# Product quantization (Jégou et al., "Product Quantization for Nearest
# Neighbor Search", TPAMI 2011 — public method): vectors are chopped
# into m subvectors, each quantized against its own tiny codebook, so a
# 64-float vector compresses to m small ints. Search runs in the
# COMPRESSED domain: a per-query distance lookup table (m × n_codes)
# turns scoring into m table lookups per corpus row — no raw vectors
# are read during the scan, which at 100 TB is the difference between
# scanning bytes and scanning floats. Top-`refine` ADC candidates are
# then re-ranked with the exact cosine (the standard refine step), so
# the output is exact cosines over a PQ-selected candidate set.


def pq_codebooks(
    corpus: DataFrame, m: int = 4, n_codes: int = 16,
    iters: int = 8, sample: int = 4096, seed: int = 29,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> np.ndarray:
    """Per-subspace L2 Lloyd's k-means on the same deterministic
    sorted-limit driver sample as :func:`kmeans_centroids` (partition-
    layout invariant). Returns (m, n_codes, dim/m) float64 codebooks —
    tiny, shipped in UDF closures (broadcast)."""
    rows = (
        corpus.select(id_col, vec_col).orderBy(id_col)
        .limit(sample).select(vec_col).collect()
    )
    x = np.asarray([list(r[0]) for r in rows], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, n_codes, dsub), dtype=np.float64)
    for s in range(m):
        xs = x[:, s * dsub:(s + 1) * dsub]
        cent = xs[rng.choice(len(xs), size=min(n_codes, len(xs)),
                             replace=False)].copy()
        for _ in range(iters):
            d = ((xs[:, None, :] - cent[None]) ** 2).sum(-1)
            assign = np.argmin(d, axis=1)
            for c in range(len(cent)):
                msk = assign == c
                if msk.any():
                    cent[c] = xs[msk].mean(axis=0)
        books[s, : len(cent)] = cent
    return books


def _pq_encode_udf(books: np.ndarray):
    m, _k, dsub = books.shape

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def enc(vec: pd.Series) -> pd.Series:
        x = np.asarray([np.asarray(v, dtype=np.float64) for v in vec])
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        codes = np.empty((len(x), m), dtype=np.int32)
        for s in range(m):
            xs = x[:, s * dsub:(s + 1) * dsub]
            d = ((xs[:, None, :] - books[s][None]) ** 2).sum(-1)
            codes[:, s] = np.argmin(d, axis=1)
        return pd.Series(list(codes))

    return enc


def pq_encode(
    corpus: DataFrame, books: np.ndarray,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Corpus → (id, codes): the stored compressed representation."""
    enc = _pq_encode_udf(books)
    return corpus.select(
        F.col(id_col), enc(F.col(vec_col)).alias("codes"))


def cosine_topk_pq(
    corpus: DataFrame, queries: DataFrame, k: int = 5,
    m: int = 4, n_codes: int = 16, refine: int = 32,
    id_col: str = "vec_id", vec_col: str = "embedding",
    books: np.ndarray | None = None,
) -> DataFrame:
    """PQ-ADC ANN: compressed-domain scan → per-partition partial
    top-``refine`` (total order (adc, corpus_id), so partial+global
    top-R ≡ global top-R) → exact-cosine re-rank of the candidates.
    Queries are collected to build the m×n_codes lookup tables (the
    query side is small by the same contract as every broadcast here);
    the corpus side never leaves its partitions until the candidate
    rows (≤ refine per query per partition) shuffle for the global
    cut."""
    from pyspark.sql import Window

    if books is None:
        books = pq_codebooks(corpus, m=m, n_codes=n_codes,
                             id_col=id_col, vec_col=vec_col)
    mm, _kk, dsub = books.shape

    qrows = (queries.select(id_col, vec_col).orderBy(id_col).collect())
    q_ids = [r[0] for r in qrows]
    qx = np.asarray([list(r[1]) for r in qrows], dtype=np.float64)
    qn = qx / np.maximum(np.linalg.norm(qx, axis=1, keepdims=True), 1e-12)
    # luts[q, s, c] = ||q_sub - codeword||^2
    luts = np.stack([
        ((qn[:, s * dsub:(s + 1) * dsub][:, None, :] - books[s][None]) ** 2)
        .sum(-1)
        for s in range(mm)
    ], axis=1)

    coded = pq_encode(corpus, books, id_col, vec_col) \
        .withColumnRenamed(id_col, "corpus_id")

    out_schema = "query_id long, corpus_id long, adc double"

    def scan(batches):
        for pdf in batches:
            ids = pdf["corpus_id"].to_numpy()
            codes = np.asarray(list(pdf["codes"]), dtype=np.int64)  # (N, m)
            rows = []
            for qi, qid in enumerate(q_ids):
                d = luts[qi][np.arange(mm), codes].sum(axis=1)  # (N,)
                order = np.lexsort((ids, d))[:refine]
                rows.append(pd.DataFrame({
                    "query_id": qid, "corpus_id": ids[order],
                    "adc": d[order]}))
            yield pd.concat(rows) if rows else pd.DataFrame(
                columns=["query_id", "corpus_id", "adc"])

    partial = coded.mapInPandas(scan, out_schema)
    wr = Window.partitionBy("query_id").orderBy(
        F.asc("adc"), F.asc("corpus_id"))
    cand = (partial.withColumn("_r", F.row_number().over(wr))
            .filter(F.col("_r") <= refine).drop("_r", "adc"))

    c = corpus.select(F.col(id_col).alias("corpus_id"),
                      F.col(vec_col).alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"))
    scored = (cand.join(c, "corpus_id").join(F.broadcast(q), "query_id")
              .select("query_id", "corpus_id",
                      cosine_expr(F.col("qv"), F.col("cv")).alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("corpus_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "corpus_id", "cosine", "rank"))


# ------------------------------------------------------------- PCA family

def gram_matrix(df: DataFrame, vec_col: str = "embedding",
                scale_bits: int = 20) -> DataFrame:
    """EXACT int64 Gram matrix over an embedding column: vectors
    quantized to ``floor(x·2^scale_bits)`` (float32→double is exact and
    the scale is a power of two, so the quantization is bit-identical
    in every engine), then ``G = Σ qqᵀ`` — a per-partition numpy
    int64 matmul emitting one upper-triangle partial per Arrow batch,
    finished by a d²-sized groupBy sum. The d×d result is O(metadata):
    this is THE 100 TB pattern for second-moment statistics (PCA,
    whitening, ridge normal equations) — the corpus is touched once,
    map-side, and the shuffle is d(d+1)/2 rows per partition.
    Indices are 1-based (matches SQL list indexing)."""
    sb = int(scale_bits)

    def run(batches):
        acc = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            q = np.floor(v * (1 << sb)).astype(np.int64)
            g = q.T @ q
            acc = g if acc is None else acc + g
        if acc is None:
            return
        iu, ju = np.triu_indices(acc.shape[0])
        yield pd.DataFrame({"i": (iu + 1).astype("int64"),
                            "j": (ju + 1).astype("int64"),
                            "g": acc[iu, ju]})

    partials = df.select(vec_col).mapInPandas(run, "i long, j long, g long")
    return partials.groupBy("i", "j").agg(F.sum("g").alias("g"))


def vector_moments(df: DataFrame, vec_col: str = "embedding",
                   scale_bits: int = 20) -> DataFrame:
    """Exact first moments of the quantized vectors: (i, s) with
    s_i = Σ q_i, plus row count as i = 0. Same one-pass map-side
    partial shape as :func:`gram_matrix`."""
    sb = int(scale_bits)

    def run(batches):
        acc, n = None, 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            q = np.floor(v * (1 << sb)).astype(np.int64)
            acc = q.sum(axis=0) if acc is None else acc + q.sum(axis=0)
            n += q.shape[0]
        if acc is None:
            return
        yield pd.DataFrame({
            "i": np.arange(0, len(acc) + 1, dtype="int64"),
            "s": np.concatenate([[n], acc]).astype("int64")})

    partials = df.select(vec_col).mapInPandas(run, "i long, s long")
    return partials.groupBy("i").agg(F.sum("s").alias("s"))


def pca_project(df: DataFrame, k: int = 3, id_col: str = "vec_id",
                vec_col: str = "embedding",
                scale_bits: int = 20) -> DataFrame:
    """Top-k PCA projection, exact end-to-end: the centered covariance
    is assembled driver-side from the EXACT integer Gram and moments
    (``C_raw = n·G − s·sᵀ``, O(d²) driver rows — bounded metadata, not
    data), eigenvectors come from the deterministic pure-numpy Jacobi
    solver (pyref.jacobi_eigh — no LAPACK, so twins are bit-identical),
    get quantized to int64, and the projection
    ``z_c = Σᵢ (n·qᵢ − sᵢ)·vqᵢ`` is pure int64 arithmetic — order
    independent, engine independent. Output: (vec_id, z1..zk)."""
    from osm2geojson_spark.pyref import jacobi_eigh

    sb = int(scale_bits)
    d_rows = gram_matrix(df, vec_col, scale_bits).collect()  # O(d²)
    m_rows = vector_moments(df, vec_col, scale_bits).collect()  # O(d)
    d = max(r["i"] for r in d_rows)
    g = np.zeros((d, d), dtype=np.int64)
    for r in d_rows:
        g[r["i"] - 1, r["j"] - 1] = r["g"]
        g[r["j"] - 1, r["i"] - 1] = r["g"]
    s = np.zeros(d, dtype=np.int64)
    n = 0
    for r in m_rows:
        if r["i"] == 0:
            n = int(r["s"])
        else:
            s[r["i"] - 1] = r["s"]
    craw = (n * g - np.outer(s, s)).astype(np.float64)
    _vals, evecs = jacobi_eigh(craw)
    vq = np.floor(evecs[:, :k] * (1 << sb)).astype(np.int64)

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            q = np.floor(v * (1 << sb)).astype(np.int64)
            z = (n * q - s[None, :]) @ vq
            out = {"vec_id": pdf[id_col].astype("int64")}
            for c in range(k):
                out[f"z{c + 1}"] = z[:, c]
            yield pd.DataFrame(out)

    schema = "vec_id long, " + ", ".join(f"z{c + 1} long" for c in range(k))
    return df.select(id_col, vec_col).mapInPandas(run, schema)
