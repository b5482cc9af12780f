"""STR-pack / distributed-rank scale evidence.

Times the full STR layout (bucketed global x-rank → per-slice y-rank →
leaf MBR directory) at growing point counts and two parallelism levels,
plus the NAIVE single-window rank at the smallest size to show the
ceiling the bucketed rank removes.

Usage:  python tools/strpack_scale_bench.py [n_points ...]
Env:    SCALE_CORES=8,32   SCALE_REPEAT=3

Methodology (BENCH.md discipline): fresh JVM per level, min-of-REPEAT,
first rep after JVM start treated as warm-up at the caller's
discretion; /proc/loadavg stamped per measurement. Only trust runs with
1-min AND 5-min load < ~1-2.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def _loadavg():
    with open("/proc/loadavg") as f:
        return [float(x) for x in f.read().split()[:2]]


def _pts(spark, n):
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.col("id"),
        ((F.col("id") * F.lit(2654435761)) % F.lit(360_000_000))
        .alias("x"),
        ((F.col("id") * F.lit(2246822519) + F.lit(1013904223))
         % F.lit(170_000_000)).alias("y"))


def run_level(cores: int, sizes: list[int], repeat: int) -> list[dict]:
    from pyspark.sql import functions as F

    from osm2geojson_spark.session import get_spark
    from osm2geojson_spark.spatial.strpack import (
        global_rank,
        str_leaves,
        str_pack,
    )

    spark = get_spark(f"strscale{cores}", master=f"local[{cores}]",
                      shuffle_partitions=max(cores, 8))
    out = []
    for n in sizes:
        reps = []
        for _ in range(repeat):
            t0 = time.perf_counter()
            assigned = str_pack(_pts(spark, n), n, leaf_capacity=512,
                                x_bucket=F.expr("x div 1406250"))
            str_leaves(assigned).write.format("noop") \
                .mode("overwrite").save()
            reps.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        out.append({"cores": cores, "n": n, "reps": [round(r, 3) for r in reps],
                    "best": round(min(reps), 3), "load": _loadavg()})
        print(json.dumps(out[-1]), flush=True)
    # naive single-window rank at the smallest size — the ceiling
    n = sizes[0]
    from pyspark.sql import Window

    reps = []
    for _ in range(repeat):
        t0 = time.perf_counter()
        w = Window.orderBy("x", "id")
        (_pts(spark, n).withColumn("rank", F.row_number().over(w))
         .groupBy(F.expr("(rank - 1) div 512").alias("leaf"))
         .agg(F.count(F.lit(1)).alias("n"))
         .write.format("noop").mode("overwrite").save())
        reps.append(time.perf_counter() - t0)
    out.append({"cores": cores, "n": n, "naive_single_window": True,
                "reps": [round(r, 3) for r in reps],
                "best": round(min(reps), 3), "load": _loadavg()})
    print(json.dumps(out[-1]), flush=True)
    # sanity: bucketed rank == naive rank on a sample
    a = {r.id: r.rank for r in global_rank(
        _pts(spark, 50_000), ["x", "id"], F.expr("x div 1406250"))
        .where("id % 997 = 0").collect()}
    b = {r.id: r.rank for r in
         _pts(spark, 50_000)
         .withColumn("rank", F.row_number().over(Window.orderBy("x", "id")))
         .where("id % 997 = 0").collect()}
    assert a == b, "bucketed rank diverged from naive rank"
    print(json.dumps({"cores": cores, "rank_parity": "ok"}), flush=True)
    spark.stop()
    return out


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [600_000, 2_400_000,
                                               9_600_000]
    cores = [int(c) for c in
             os.environ.get("SCALE_CORES", "8,32").split(",")]
    repeat = int(os.environ.get("SCALE_REPEAT", "3"))
    for c in cores:
        run_level(c, sizes, repeat)


if __name__ == "__main__":
    main()
