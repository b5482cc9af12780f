"""sf0.1 → sf1 → sf10-equivalent scale evidence for the dedup family
(VERDICT r2 item 8).

Synthesizes documents/embeddings tables at 1x (= sf0.1 size: 5k docs /
2k vecs), 10x (sf1: 50k / 20k) and optionally 100x (sf10: 500k / 200k)
with TWO planted structures:

- dup GROUPS (the signal): 5% of docs arrive in 5-member near-duplicate
  groups (45 shared tokens + 2 unique per member) — these pairs must
  survive dedup at every scale;
- a boilerplate SPIKE (the skew): 0.5% of docs share one 45-token
  boilerplate — at scale this is the hot LSH bucket that makes the
  uncapped self-join quadratic, and the ``max_bucket_size`` cap must
  neutralize it WITHOUT touching the group pairs.

Embeddings get the analogous spike (0.5% near-identical vectors = true
near-dups the operator must emit).

Usage: python tools/dedup_scale_bench.py [scales...]   (default: 1 10 100)
Prints one JSON line per (op, scale) plus pairwise cost factors.
Methodology per BENCH.md: quiet window (/proc/loadavg 1-min < ~1.2),
min-of-2 per op.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

BASE_DOCS = 5_000     # sf0.1 documents size
BASE_VECS = 2_000     # sf0.1 embeddings size
GROUP_EVERY = 100     # docs i with i%GROUP_EVERY < GROUP_SIZE form a group
GROUP_SIZE = 5
SPIKE_EVERY = 200     # docs with i%SPIKE_EVERY == 199 share boilerplate
DIM = 64
CAP = 100             # max_bucket_size: > group buckets, < spike buckets

_WORDS = ("key agg row scan slow fast table value part hash merge batch "
          "spark line sort window join group filter map shuffle plan codegen "
          "broadcast skew salt bucket probe build spill page cache block "
          "column vector arrow batch stage task core executor driver the a").split()

_BOILER = " ".join(_WORDS[(7 * i) % len(_WORDS)] for i in range(45))


def synth_docs(spark, n: int):
    """xxhash64-mixed random docs + planted groups + boilerplate spike.
    Group members share a 45-token body keyed on the group id; spike
    docs share ONE global boilerplate. Unique suffix tokens keep every
    doc distinct (near-dup, not exact-dup)."""
    gid = (F.col("doc_id") / GROUP_EVERY).cast("long")
    in_group = F.pmod(F.col("doc_id"), F.lit(GROUP_EVERY)) < GROUP_SIZE
    in_spike = F.pmod(F.col("doc_id"), F.lit(SPIKE_EVERY)) == SPIKE_EVERY - 1

    def toks(seed_col, count):
        return F.transform(
            F.sequence(F.lit(0), F.lit(count - 1)),
            lambda j: F.element_at(
                F.array(*[F.lit(w) for w in _WORDS]),
                F.pmod(F.xxhash64(seed_col, j), F.lit(len(_WORDS)))
                .cast("int") + 1))

    body_group = F.concat_ws(" ", toks(gid * 7919 + 13, 45))
    body_rand = F.concat_ws(" ", toks(F.col("doc_id"), 50))
    uniq = F.concat_ws(
        " ", *[F.concat(F.lit("u"),
                        F.pmod(F.xxhash64(F.col("doc_id"), F.lit(i)),
                               F.lit(99991)).cast("string"))
               for i in range(2)])
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(in_spike, F.concat(F.lit(_BOILER), F.lit(" "), uniq))
        .when(in_group, F.concat(body_group, F.lit(" "), uniq))
        .otherwise(body_rand).alias("text"),
    )


def synth_vecs(spark, n: int):
    """xxhash64-mixed random vectors + a 0.5% spike of near-identical
    vectors (tiny per-id perturbation of one base = true near-dups)."""
    in_spike = F.pmod(F.col("vec_id"), F.lit(SPIKE_EVERY)) == SPIKE_EVERY - 1
    base = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: ((F.pmod(F.xxhash64(F.col("vec_id"), j), F.lit(100_000))
                    - 50_000) / 50_000.0).cast("float"))
    hot = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: (F.lit(0.5)
                   + (F.pmod(F.xxhash64(F.col("vec_id"), j), F.lit(1000))
                      / 1e6)).cast("float"))
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.when(in_spike, hot).otherwise(base).alias("embedding"),
    )


def _mat(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return df.count()


def run_scale(spark, scale: int, tmp: str) -> list[dict]:
    from osm2geojson_spark.operators.dedup import dup_clusters, minhash_lsh_pairs
    from osm2geojson_spark.operators.similarity import embedding_near_dup_pairs

    n_docs, n_vecs = BASE_DOCS * scale, BASE_VECS * scale
    dpath, vpath = f"{tmp}/docs_{scale}.parquet", f"{tmp}/vecs_{scale}.parquet"
    if not os.path.exists(dpath):
        synth_docs(spark, n_docs).repartition(32).write.parquet(dpath)
    if not os.path.exists(vpath):
        synth_vecs(spark, n_vecs).repartition(32).write.parquet(vpath)
    docs = spark.read.parquet(dpath)
    vecs = spark.read.parquet(vpath)

    out = []

    def bench(op, fn, rows_in, reps=2):
        best, n_out = None, None
        for _ in range(reps):
            t0 = time.perf_counter()
            n_out = _mat(fn())
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        rec = {"op": op, "scale": scale, "rows_in": rows_in,
               "rows_out": n_out, "sec": round(best, 3),
               "rows_per_sec": round(rows_in / best)}
        print(json.dumps(rec), flush=True)
        out.append(rec)
        return rec

    bench("minhash_pairs_capped",
          lambda: minhash_lsh_pairs(docs, max_bucket_size=CAP), n_docs)
    if scale <= 10:
        # uncapped: the hot clique grows quadratically with scale — run
        # only where it stays tractable, to show what the cap prevents
        bench("minhash_pairs_uncapped",
              lambda: minhash_lsh_pairs(docs), n_docs)

    pairs = minhash_lsh_pairs(docs, max_bucket_size=CAP) \
        .filter(F.col("jaccard") >= 0.5).select("id_a", "id_b").persist()
    n_pairs = pairs.count()
    print(json.dumps({"op": "surviving_group_pairs", "scale": scale,
                      "pairs": n_pairs}), flush=True)
    bench("dup_clusters", lambda: dup_clusters(pairs), n_docs)
    pairs.unpersist()

    bench("embedding_near_dup",
          lambda: embedding_near_dup_pairs(
              vecs, threshold=0.95, dim=DIM, max_bucket_size=5000), n_vecs)
    return out


def main():
    from osm2geojson_spark.session import get_spark

    scales = [int(s) for s in sys.argv[1:]] or [1, 10, 100]
    load1 = open("/proc/loadavg").read().split()[0]
    print(json.dumps({"loadavg_1min": float(load1), "scales": scales}),
          flush=True)
    spark = get_spark("dedup-scale-bench")
    tmp = "/tmp/spark_graft_dedup_scale"
    os.makedirs(tmp, exist_ok=True)
    all_recs = []
    for s in scales:
        all_recs.extend(run_scale(spark, s, tmp))
    by = {(r["op"], r["scale"]): r for r in all_recs}
    for op in ("minhash_pairs_capped", "dup_clusters", "embedding_near_dup"):
        for a_s, b_s in zip(scales, scales[1:]):
            a, b = by.get((op, a_s)), by.get((op, b_s))
            if a and b:
                factor = b["sec"] / a["sec"]
                print(json.dumps({
                    "op": op, "from_scale": a_s, "to_scale": b_s,
                    "cost_factor": round(factor, 2),
                    "data_factor": b_s // a_s,
                    "near_linear": factor <= 1.2 * (b_s / a_s),
                }), flush=True)


if __name__ == "__main__":
    main()
