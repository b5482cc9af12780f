"""Routing scale evidence: frontier SSSP on a 200k-node expander graph
at two parallelism levels (BASELINE.json north_rule methodology — the
sandbox has no real cluster, so N vs 4N executors is evidenced as
local[8] vs local[32] on identical input).

Graph shape matters for what this measures: a GRID graph's diameter
grows with sqrt(V), so rounds (driver latency) would dominate and the
measurement would say nothing about scale. An 8-out-degree EXPANDER
(dst_i = (src·a_i + b_i) mod n, deterministic multipliers) has O(log n)
diameter, so wall-clock is dominated by the per-round frontier⋈edges
join + min partial-agg over 1.6 M edges — the part that actually
distributes. That is also the planet-road-graph regime after
contraction hierarchies (few rounds, fat frontiers).

Each level runs in its own subprocess (fresh JVM), warm-up discarded,
min of REPS reported. Usage: python tools/route_scale_bench.py [n_nodes]
(env: SCALE_REPS, SCALE_LEVELS as in scaling_bench.py). Only trust runs
with /proc/loadavg 1-min AND 5-min < ~1-2 (CLAUDE.md host notes).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, sys, time
sys.path.insert(0, "@REPO@")
from pyspark.sql import functions as F
from osm2geojson_spark.session import get_spark
from osm2geojson_spark.spatial.route import shortest_paths

cores = int(sys.argv[1]); n = int(sys.argv[2]); reps = int(sys.argv[3])
wmax = int(sys.argv[4])
spark = get_spark("route-scale-%d" % cores, master="local[%d]" % cores,
                  shuffle_partitions=cores)

_MULS = ((3, 17), (5, 29), (7, 43), (11, 59),
         (13, 71), (17, 89), (19, 101), (23, 113))


def edges():
    offs = F.array(*[
        F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
        for a, b in _MULS])
    return (
        spark.range(n)
        .select(F.col("id").alias("src"), F.explode(offs).alias("o"))
        .select(
            "src",
            ((F.col("src") * F.col("o.a") + F.col("o.b")) % n).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .select(
            "src", "dst",
            (1 + (F.col("src") * 73856093 + F.col("dst") * 19349663)
             % wmax).cast("long").alias("w"))
    )


times = []
n_reach = None
st = {}
for rep in range(reps + 1):  # first run = warm-up, discarded
    t0 = time.perf_counter()
    dist = shortest_paths(edges(), 0, max_iters=64, stats=st)
    n_reach = dist.count()
    times.append(time.perf_counter() - t0)
times = times[1:]
print(json.dumps({"cores": cores, "times": times, "best": min(times),
                  "n_reachable": n_reach, "rounds": st.get("rounds")}))
"""


def run_level(cores: int, n: int, reps: int, wmax: int) -> dict:
    child = _CHILD.replace("@REPO@", REPO)
    out = subprocess.run(
        [sys.executable, "-c", child, str(cores), str(n), str(reps),
         str(wmax)],
        capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    reps = int(os.environ.get("SCALE_REPS", "3"))
    wmax = int(os.environ.get("SCALE_WMAX", "3"))
    levels = [int(x) for x in
              os.environ.get("SCALE_LEVELS", "8,32").split(",")]
    results = {lv: run_level(lv, n, reps, wmax) for lv in levels}
    report = {"n_nodes": n, "n_edges": n * 8, "w_range": [1, wmax]}
    for lv, r in results.items():
        report[f"local{lv}"] = {
            "best_sec": round(r["best"], 3),
            "edges_per_sec": round(n * 8 / r["best"]),
            "n_reachable": r["n_reachable"],
            "rounds": r.get("rounds"),
            "times": [round(t, 3) for t in r["times"]],
        }
    if len(levels) == 2:
        lo, hi = results[levels[0]], results[levels[1]]
        report["speedup"] = round(lo["best"] / hi["best"], 2)
        report["scaling_efficiency"] = round(
            (lo["best"] / hi["best"]) / (levels[1] / levels[0]), 3)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
