"""sf1-tier evidence for the seventh-wave raster family (verdict r4
item 7): SAT box filter, GLCM, NCC template matching and the L1
distance transform at 1M → 4M → 16M pixels — does the halo/SAT shuffle
bound hold one decade up (≤ ~12× cost for 10× data)?

Same synthetic DEM substrate as the bench/catalog entries
(synth_dem_tiles — the scan is never the variable under test), tile
size 128 so the per-tile Arrow kernels stay batch-efficient at every
size. Each op is min-of-REPS after a discarded warm-up in ONE
local[32] session (cache cleared between reps — the bench.py
cache-accumulation pitfall), loadavg stamped start/end.

Usage: python tools/raster_scale_bench.py  (env: SCALE_REPS default 2,
  SCALE_SIZES default "1024,2048,4096" — side length in px,
  SCALE_OPS default "box,glcm,ncc,dt")
Only trust runs with /proc/loadavg 1-min AND 5-min < ~1-2 (CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _loadavg():
    with open("/proc/loadavg") as f:
        return [float(x) for x in f.read().split()[:3]]


def main() -> None:
    import numpy as np
    from pyspark.sql import functions as F

    from osm2geojson_spark.session import get_spark
    from osm2geojson_spark.spatial.dt import distance_transform
    from osm2geojson_spark.spatial.focal import synth_dem_tiles
    from osm2geojson_spark.spatial.ncc import match_template_tiles
    from osm2geojson_spark.spatial.sat import (
        box_filter_tiles,
        integral_image_tiles,
    )
    from osm2geojson_spark.spatial.texture import glcm_tiles

    reps = int(os.environ.get("SCALE_REPS", "2"))
    sizes = [int(x) for x in
             os.environ.get("SCALE_SIZES", "1024,2048,4096").split(",")]
    ops = os.environ.get("SCALE_OPS", "box,glcm,ncc,dt").split(",")
    t = 128
    spark = get_spark("raster-scale", master="local[32]",
                      shuffle_partitions=32)
    out = {"tile_size": t, "loadavg_start": _loadavg(), "sizes": {}}
    dy, dx = np.mgrid[0:4, 0:4]
    tmpl = 1 + dx + 2 * dy
    for side in sizes:
        nt = side // t
        tiles = synth_dem_tiles(spark, nt, nt, t).persist()
        tiles.count()
        mask = tiles.select(
            "tx", "ty",
            F.transform("data",
                        lambda v: (v >= 90).cast("long")).alias("data"))

        def build(op):
            if op == "box":
                return box_filter_tiles(
                    integral_image_tiles(tiles, t), t, 5, nt, nt)
            if op == "glcm":
                return glcm_tiles(tiles, t, nt, nt,
                                  levels=16, lo=0, hi=106)
            if op == "ncc":
                return match_template_tiles(tiles, t, tmpl, nt, nt)
            return distance_transform(mask, t, side, side)

        entry = {}
        for op in ops:
            times = []
            for _ in range(reps + 1):  # first rep = discarded warm-up
                t0 = time.perf_counter()
                build(op).write.format("noop").mode("overwrite").save()
                times.append(round(time.perf_counter() - t0, 2))
                spark.catalog.clearCache()
                tiles.persist().count()
            entry[op] = {"best_sec": min(times[1:]), "times": times[1:]}
        out["sizes"][str(side * side)] = entry
        tiles.unpersist()
    # cost ratios between consecutive sizes (4x data per step)
    keys = [str(s * s) for s in sizes]
    for op in ops:
        out[f"{op}_ratios"] = [
            round(out["sizes"][b][op]["best_sec"]
                  / max(out["sizes"][a][op]["best_sec"], 1e-9), 2)
            for a, b in zip(keys, keys[1:])]
    out["loadavg_end"] = _loadavg()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
