"""sf0.1 → sf1 scale evidence for the dedup family (VERDICT r2 item 8).

Synthesizes documents/embeddings tables at 1x (= sf0.1 size: 5k docs /
2k vecs) and 10x (= sf1 equivalent: 50k docs / 20k vecs) with a PLANTED
HOT BUCKET (boilerplate docs sharing 45/50 tokens; a spike of
near-identical embeddings), then times minhash_pairs, dup_clusters and
embedding_near_dup at both scales, with and without the bucket-size cap
on the planted skew.

Usage: python tools/dedup_scale_bench.py [scales...]   (default: 1 10)
Prints one JSON line per (op, scale). Near-linear scaling = cost factor
≤ ~12x for 10x rows. Methodology per BENCH.md: run only when
/proc/loadavg 1-min < ~1.2; min-of-2 per op.
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
HOT_FRACTION = 0.01   # planted boilerplate / near-identical spike
DIM = 64

_WORDS = ("key agg row scan slow fast table value part hash merge batch "
          "spark line sort window join group filter map shuffle plan codegen "
          "broadcast skew salt bucket probe build spill page cache block "
          "column vector arrow batch stage task core executor driver the a").split()

_BOILER = " ".join(_WORDS[(7 * i) % len(_WORDS)] for i in range(45))


def synth_docs(spark, n: int):
    """Deterministic ~50-token docs; the first HOT_FRACTION share a
    45-token boilerplate prefix (the hot-shingle / hot-band spike)."""
    n_hot = int(n * HOT_FRACTION)
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(49)),
        lambda j: F.element_at(
            F.array(*[F.lit(w) for w in _WORDS]),
            (F.pmod(F.col("doc_id") * 31 + j * 17 + (F.col("doc_id") * j) % 97,
                    F.lit(len(_WORDS)))).cast("int") + 1),
    )
    uniq5 = F.concat_ws(
        " ", *[F.concat(F.lit("u"),
                        ((F.col("doc_id") * (i + 3)) % 99991).cast("string"))
               for i in range(5)])
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < n_hot,
               F.concat(F.lit(_BOILER), F.lit(" "), uniq5))
        .otherwise(F.concat_ws(" ", toks)).alias("text"),
    )


def synth_vecs(spark, n: int):
    """Deterministic float vectors; the first HOT_FRACTION are tiny
    perturbations of ONE vector (hot LSH bucket + true near-dups)."""
    n_hot = int(n * HOT_FRACTION)
    base = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: ((F.pmod(F.col("vec_id") * 2654435761 + j * 40503,
                           F.lit(100_000)) - 50_000) / 50_000.0).cast("float"))
    hot = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: (F.lit(0.5)
                   + (F.pmod(F.col("vec_id") * 7 + j, F.lit(1000)) / 1e6)).cast("float"))
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.when(F.col("id") < n_hot, hot).otherwise(base).alias("embedding"),
    )


def _mat(df) -> int:
    return df.write.format("noop").mode("overwrite").save() or df.count()


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

    # capped: the production configuration (skew guard active on the
    # planted bucket); uncapped at 1x only, to show the cap's effect
    bench("minhash_pairs_capped",
          lambda: minhash_lsh_pairs(docs, max_bucket_size=200), n_docs)
    if scale == 1:
        bench("minhash_pairs_uncapped",
              lambda: minhash_lsh_pairs(docs), n_docs)

    pairs = minhash_lsh_pairs(docs, max_bucket_size=200) \
        .filter(F.col("jaccard") >= 0.5).select("id_a", "id_b").persist()
    pairs.count()
    bench("dup_clusters", lambda: dup_clusters(pairs), n_docs)
    pairs.unpersist()

    bench("embedding_near_dup",
          lambda: embedding_near_dup_pairs(
              vecs, threshold=0.95, dim=DIM, max_bucket_size=1000), n_vecs)
    return out


def main():
    from osm2geojson_spark.session import get_spark

    scales = [int(s) for s in sys.argv[1:]] or [1, 10]
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
        a, b = by.get((op, scales[0])), by.get((op, scales[-1]))
        if a and b and scales[-1] != scales[0]:
            factor = b["sec"] / a["sec"]
            print(json.dumps({
                "op": op, "cost_factor": round(factor, 2),
                "data_factor": scales[-1] // scales[0],
                "near_linear": factor <= 1.2 * (scales[-1] / scales[0]),
            }), flush=True)


if __name__ == "__main__":
    main()
