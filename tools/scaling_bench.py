"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

The sandbox has no real cluster, so the rule's "N vs 4N executors"
criterion is evidenced as the SAME job at two parallelism levels —
local[8] vs local[32] — on identical input (driver note in the brief).

Job under test = the north-star pipeline: read the image+caption parquet
→ Morton cell encode → broadcast PIP against assembled polygons →
shuffle-free tile assignment → per-(poly, tile) rollup.

Each level runs in its OWN subprocess (fresh JVM — no shared-session
contamination), warm-up run discarded, min of REPS timed runs reported
(min = steady-state; host is a shared VM with noisy neighbors).

Usage: python tools/scaling_bench.py [n_images] → prints JSON; paste into
BASELINE.md / BENCH.md. Env:
  SCALE_REPS=N      timed reps per level (default 3)
  SCALE_FMTS=all    use the FULL 6-codec rotation (incl. real JPEG +
                    WebP/VP8L decode in the hot path) instead of the
                    round-1/2-comparable 4-format mix
  SCALE_LEVELS=32   comma list of parallelism levels (default "8,32")
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, sys, time
sys.path.insert(0, "@REPO@")
from pyspark.sql import functions as F
from osm2geojson_spark.session import get_spark
from osm2geojson_spark import queries as Q
from osm2geojson_spark.spatial import tiles as TI
from osm2geojson_spark.spatial.pip import point_in_polygon_join

from osm2geojson_spark.operators.images import validate_images, quarantine_split

cores = int(sys.argv[1]); path = sys.argv[2]; reps = int(sys.argv[3])
spark = get_spark("scale-%d" % cores, master="local[%d]" % cores,
                  shuffle_partitions=cores)
region = spark.read.parquet("/root/testdata/sf0.01/region.parquet")
imgs = spark.read.parquet(path)

def job():
    # full north-star pipeline: per-row decode/PSNR/phash validation →
    # broadcast PIP → shuffle-free tile assignment → rollup
    good, _bad = quarantine_split(validate_images(imgs))
    pts = imgs.select("image_id", "lon", "lat").join(
        good.select("image_id"), "image_id")
    hits = point_in_polygon_join(pts, Q.region_boxes(region), res=7)
    out = TI.assign_tiles(hits, zoom=7).groupBy("poly_id", "tile_id").agg(
        F.count("*").alias("n"), F.min("image_id").alias("first"))
    t0 = time.perf_counter()
    out.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0

job(); job()  # warm-ups: codegen + the full Python-UDF worker pool
times = [job() for _ in range(reps)]
print(json.dumps({"cores": cores, "times": times, "best": min(times)}))
"""


def synth_input(n: int, path: str, fmts_all: bool) -> None:
    fmts = ("fmts=FMTS_ALL, " if fmts_all else "")
    code = (
        f"import sys; sys.path.insert(0, {REPO!r})\n"
        "from osm2geojson_spark.session import get_spark\n"
        "from osm2geojson_spark.synth.images import images_table, FMTS_ALL\n"
        "spark = get_spark('synth', master='local[32]')\n"
        f"images_table(spark, n={n}, seed=42, {fmts}partitions=64)"
        f".write.mode('overwrite').parquet({path!r})\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True,
                   capture_output=True, text=True)


def run_level(cores: int, path: str, reps: int) -> dict:
    r = subprocess.run(
        [sys.executable, "-c", _CHILD.replace("@REPO@", REPO),
         str(cores), path, str(reps)],
        capture_output=True, text=True, check=True)
    return json.loads(r.stdout.strip().splitlines()[-1])


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    reps = int(os.environ.get("SCALE_REPS", "3"))
    fmts_all = os.environ.get("SCALE_FMTS", "") == "all"
    levels = [int(x) for x in
              os.environ.get("SCALE_LEVELS", "8,32").split(",")]
    suffix = "_all" if fmts_all else ""
    path = os.path.join(tempfile.gettempdir(),
                        f"images_scale_{n}{suffix}.parquet")
    if not os.path.exists(path):
        synth_input(n, path, fmts_all)
    if len(levels) == 1:
        r = run_level(levels[0], path, reps)
        print(json.dumps({
            "n_images": n, "fmts": "all6" if fmts_all else "base4",
            f"local{levels[0]}": {
                "best_sec": round(r["best"], 3),
                "rows_per_sec": round(n / r["best"]),
                "times": [round(t, 3) for t in r["times"]]}}))
        return
    lo = run_level(levels[0], path, reps)
    hi = run_level(levels[1], path, reps)
    eff = (lo["best"] / hi["best"]) / (levels[1] / levels[0])
    print(json.dumps({
        "n_images": n, "fmts": "all6" if fmts_all else "base4",
        f"local{levels[0]}": {"best_sec": round(lo["best"], 3),
                              "rows_per_sec": round(n / lo["best"]),
                              "times": [round(t, 3) for t in lo["times"]]},
        f"local{levels[1]}": {"best_sec": round(hi["best"], 3),
                              "rows_per_sec": round(n / hi["best"]),
                              "times": [round(t, 3) for t in hi["times"]]},
        "speedup": round(lo["best"] / hi["best"], 2),
        "scaling_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
