"""Raster-iterative scale evidence: watershed pointer doubling and
Δ-stepping cost distance at megapixel scale, two parallelism levels.

Why these two: they are the round-4 iterative additions whose 100 TB
story rests on ROUND SHAPE, not just per-round parallelism —
- watershed_basins: pointer doubling ⇒ rounds = ceil(log2(longest flow
  path)); the DEM's elevation range bounds path length (~106 on the
  catalog formula), so rounds stay ~7 at ANY raster size — the
  wall-clock should scale with cores because each round is one
  size-n equi-join.
- cost_distance: Δ-stepping with the grid block partitioner ⇒ rounds =
  O(diameter in blocks); per-round work = per-block heap Dijkstra, the
  kernel with real cross-core parallelism.

Per the BASELINE.json north_rule (no real cluster in this sandbox):
same job, same input, local[8] vs local[32] in fresh JVMs, min-of-REPS,
scaling efficiency reported. Only trust runs with /proc/loadavg 1-min
AND 5-min < ~1-2 (CLAUDE.md discipline).

Usage: python tools/hydro_scale_bench.py [tiles_per_side] [tile_size]
  (default 8 128 → 1024² = 1.05M pixels)
Env: SCALE_REPS (default 2), SCALE_LEVELS (default "8,32"),
     SCALE_OPS (default "watershed,cost"), SCALE_SOURCES (costmatrix
     seed count, default 16 — the full-relax mode parallelizes over
     sources, so scaling past N cores needs >= N sources)
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
from osm2geojson_spark.session import get_spark
from osm2geojson_spark.spatial.focal import (
    synth_dem_tiles, focal_op, watershed_basins, cost_distance)

cores = int(sys.argv[1]); nt = int(sys.argv[2]); t = int(sys.argv[3])
reps = int(sys.argv[4]); ops = sys.argv[5].split(",")
w = nt * t
spark = get_spark("hydro-%d" % cores, master="local[%d]" % cores,
                  shuffle_partitions=cores)
tiles = synth_dem_tiles(spark, nt, nt, t).persist()
tiles.count()
dirs = focal_op(tiles, op="flowdir8", tile_size=t).persist()
dirs.count()

def _spread_sources(w, k):
    import math
    side = int(math.isqrt(k))
    step = w // (side + 1)
    return [(iy + 1) * step * w + (ix + 1) * step
            for iy in range(side) for ix in range(side)]

out = {}
for op in ops:
    times, stats = [], {}
    for _ in range(reps + 1):  # first rep is the discarded warm-up
        t0 = time.perf_counter()
        if op == "watershed":
            df = watershed_basins(dirs, t, w, w, stats=stats)
        elif op == "costmatrix":
            # the all-cores workload: 16 concurrent wavefronts (the
            # cost-allocation / nearest-facility shape) — a single
            # source only activates a few blocks per barrier
            from osm2geojson_spark.spatial.focal import cost_edges
            from osm2geojson_spark.spatial.route import (
                grid_block_part, travel_time_matrix_delta)
            import os as _os
            blk = int(_os.environ.get("SCALE_BLOCK", str(t)))
            nsrc = int(_os.environ.get("SCALE_SOURCES", "16"))
            df = travel_time_matrix_delta(
                cost_edges(tiles, t, w, w), _spread_sources(w, nsrc),
                part=grid_block_part(w, blk), src_groups=nsrc)
        else:
            df = cost_distance(tiles, t, w, w, source=0)
        df.write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache()
        tiles.persist().count(); dirs.persist().count()
    out[op] = {"best_sec": min(times[1:]), "times": times[1:],
               "rounds": stats.get("rounds")}
print(json.dumps(out))
"""


def run_level(cores: int, nt: int, t: int, reps: int, ops: str) -> dict:
    child = _CHILD.replace("@REPO@", REPO)
    res = subprocess.run(
        [sys.executable, "-c", child, str(cores), str(nt), str(t),
         str(reps), ops],
        capture_output=True, text=True, check=True)
    return json.loads(res.stdout.strip().splitlines()[-1])


def main() -> None:
    nt = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    reps = int(os.environ.get("SCALE_REPS", "2"))
    levels = [int(x) for x in
              os.environ.get("SCALE_LEVELS", "8,32").split(",")]
    ops = os.environ.get("SCALE_OPS", "watershed,cost")
    with open("/proc/loadavg") as f:
        load = f.read().split()[:2]
    out = {"pixels": nt * nt * t * t, "tiles": nt * nt,
           "tile_size": t, "loadavg_start": load, "levels": {}}
    for cores in levels:
        out["levels"][str(cores)] = run_level(cores, nt, t, reps, ops)
    if len(levels) == 2:
        lo, hi = (str(levels[0]), str(levels[1]))
        for op in ops.split(","):
            a = out["levels"][lo][op]["best_sec"]
            b = out["levels"][hi][op]["best_sec"]
            out[f"{op}_speedup"] = round(a / b, 2)
            out[f"{op}_efficiency"] = round(
                (a / b) / (levels[1] / levels[0]), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
