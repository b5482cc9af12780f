"""Routing ROUND-BARRIER evidence: Δ-stepping block fusion vs frontier
Bellman-Ford on a width-W weighted grid (the high-diameter regime where
r3's BENCH.md showed frontier SSSP flat from 8→32 cores).

Frontier BF's round count equals the max hop count of an optimal path —
on a width-1000 grid that is ~2,000 barriers, so running it to
completion is itself the demonstration of the ceiling (~10 min); this
tool therefore computes the frontier round count ANALYTICALLY with a
Spark-free hop-tracking heap Dijkstra (settle on lexicographic
(dist, hops): the hop count BF needs to deliver each node's final
distance; BF rounds = max+1 for the empty convergence round) and
MEASURES the fused variant at two parallelism levels per the
BASELINE.json north_rule (no real cluster in this sandbox: local[8] vs
local[32], same input, scaling efficiency reported).

Usage: python tools/grid_route_bench.py [width] [block]
Env: SCALE_REPS (default 2), SCALE_LEVELS (default "8,32"),
SCALE_SOURCES=k for the k-depot travel-matrix variant (k concurrent
wavefronts — the catchment workload, and the shape whose kernel work
actually spans all cores; a single wavefront saturates ~8),
SCALE_RUN_FRONTIER=1 to also wall-clock the frontier version (slow).
Only trust runs with /proc/loadavg 1-min AND 5-min < ~1-2 (CLAUDE.md).
"""

from __future__ import annotations

import heapq
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def frontier_rounds_analytic(n: int) -> int:
    """Max hop count of an optimal path on the deterministic grid
    (pyref.grid_graph weights), +1 for the convergence round — the exact
    number of barriers spatial.route.shortest_paths executes."""
    _WA, _WB, _WMOD = 73856093, 19349663, 9
    nn = n * n
    dist = [None] * nn
    heap = [(0, 0, 0)]  # (dist, hops, node)
    max_hops = 0
    while heap:
        d, h, u = heapq.heappop(heap)
        if dist[u] is not None:
            continue
        dist[u] = d
        if h > max_hops:
            max_hops = h
        ix, iy = u % n, u // n
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            jx, jy = ix + dx, iy + dy
            if 0 <= jx < n and 0 <= jy < n:
                v = jy * n + jx
                if dist[v] is None:
                    w = 1 + (u * _WA + v * _WB) % _WMOD
                    heapq.heappush(heap, (d + w, h + 1, v))
    return max_hops + 1


_CHILD = r"""
import json, sys, time
sys.path.insert(0, "@REPO@")
from osm2geojson_spark.session import get_spark
from osm2geojson_spark.spatial.route import (
    grid_edges, grid_block_part, shortest_paths, shortest_paths_delta,
    travel_time_matrix_delta)

cores = int(sys.argv[1]); n = int(sys.argv[2]); block = int(sys.argv[3])
reps = int(sys.argv[4]); run_frontier = int(sys.argv[5])
n_src = int(sys.argv[6])
spark = get_spark("grid-route-%d" % cores, master="local[%d]" % cores,
                  shuffle_partitions=cores)

if n_src > 1:
    # depots spread across the grid: n_src concurrent wavefronts — the
    # catchment workload, and the shape with real cross-core kernel
    # parallelism (a single source's wavefront only spans ~2*sqrt(B)
    # blocks at once, which 8 cores already saturate)
    import math
    side = int(math.isqrt(n_src))
    step = n // (side + 1)
    sources = [ (iy + 1) * step * n + (ix + 1) * step
                for iy in range(side) for ix in range(side) ]
else:
    sources = [0]

times, st = [], {}
n_reach = None
for rep in range(reps + 1):  # first run = warm-up, discarded
    t0 = time.perf_counter()
    if n_src > 1:
        dist = travel_time_matrix_delta(
            grid_edges(spark, n), sources,
            part=grid_block_part(n, block), stats=st)
    else:
        dist = shortest_paths_delta(
            grid_edges(spark, n), 0, part=grid_block_part(n, block),
            stats=st)
    n_reach = dist.count()
    times.append(time.perf_counter() - t0)
times = times[1:]
out = {"cores": cores, "times": times, "best": min(times),
       "n_reachable": n_reach, "rounds": st.get("rounds"),
       "n_sources": len(sources)}
if run_frontier:
    st_bf = {}
    t0 = time.perf_counter()
    shortest_paths(grid_edges(spark, n), 0, max_iters=8192,
                   stats=st_bf).count()
    out["frontier_sec"] = time.perf_counter() - t0
    out["frontier_rounds"] = st_bf.get("rounds")
print(json.dumps(out))
"""


def run_level(cores: int, n: int, block: int, reps: int,
              run_frontier: bool, n_src: int) -> dict:
    child = _CHILD.replace("@REPO@", REPO)
    out = subprocess.run(
        [sys.executable, "-c", child, str(cores), str(n), str(block),
         str(reps), str(int(run_frontier)), str(n_src)],
        capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    block = int(sys.argv[2]) if len(sys.argv) > 2 else max(1, n // 16)
    reps = int(os.environ.get("SCALE_REPS", "2"))
    levels = [int(x) for x in
              os.environ.get("SCALE_LEVELS", "8,32").split(",")]
    run_frontier = os.environ.get("SCALE_RUN_FRONTIER") == "1"
    n_src = int(os.environ.get("SCALE_SOURCES", "1"))

    bf_rounds = frontier_rounds_analytic(n)
    results = {lv: run_level(lv, n, block, reps,
                             run_frontier and lv == levels[-1], n_src)
               for lv in levels}
    report = {
        "width": n, "n_nodes": n * n, "n_edges": 4 * n * (n - 1) * 2,
        "block": block, "n_sources": n_src,
        "frontier_rounds_analytic": bf_rounds,
    }
    for lv, r in results.items():
        report[f"local{lv}"] = {
            "best_sec": round(r["best"], 3),
            "rounds": r["rounds"],
            "times": [round(t, 3) for t in r["times"]],
            "n_reachable": r["n_reachable"],
        }
        if "frontier_sec" in r:
            report[f"local{lv}"]["frontier_sec"] = round(
                r["frontier_sec"], 3)
            report[f"local{lv}"]["frontier_rounds"] = r["frontier_rounds"]
    any_r = next(iter(results.values()))
    report["round_reduction"] = round(bf_rounds / any_r["rounds"], 1)
    if len(levels) == 2:
        lo, hi = results[levels[0]], results[levels[1]]
        report["speedup"] = round(lo["best"] / hi["best"], 2)
        report["scaling_efficiency"] = round(
            (lo["best"] / hi["best"]) / (levels[1] / levels[0]), 3)
    try:
        with open("/proc/loadavg") as f:
            report["loadavg_end"] = [
                float(x) for x in f.read().split()[:3]]
    except OSError:
        pass
    print(json.dumps(report))


if __name__ == "__main__":
    main()
