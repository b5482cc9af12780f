"""sf1-tier evidence for the spatial renderers (verdict r3 item 10):
heatmap tiles, vector tiles, pyramid overviews, and zonal statistics at
10× the headline substrate (6M synthetic pings / 2,400 images instead
of 600k / 240), one zoom deeper — does the tiles×extent² shuffle bound
hold (≤ ~12× cost for 10× data)?

Points are synthesized from spark.range with the SAME deterministic
int-derived lon/lat the headline queries use (no files — the scan is
never the variable under test). Each query is min-of-REPS after a
discarded warm-up, single local[32] session, loadavg stamped.

Usage: python tools/spatial_scale_bench.py  (env: SCALE_REPS default 2)
Only trust runs with /proc/loadavg 1-min AND 5-min < ~1-2 (CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from osm2geojson_spark.queries import lat_col, lon_col  # noqa: E402
from osm2geojson_spark.session import get_spark  # noqa: E402


def _loadavg():
    with open("/proc/loadavg") as f:
        return [float(x) for x in f.read().split()[:3]]


def points(spark, n: int):
    return spark.range(n).select(
        lon_col(F.col("id")).alias("lon"),
        lat_col(F.col("id")).alias("lat"))


def main() -> None:
    reps = int(os.environ.get("SCALE_REPS", "2"))
    load_start = _loadavg()
    spark = get_spark("spatial-scale")

    from osm2geojson_spark.spatial.heatmap import heatmap_tiles, overview_tiles
    from osm2geojson_spark.spatial.mvt import vector_tiles
    from osm2geojson_spark.spatial.zonal import zonal_stats
    from osm2geojson_spark.synth.images import FMTS_ALL, images_table
    from osm2geojson_spark import pyref

    def zones(spark):
        return spark.createDataFrame(
            [(zid, [{"lon": x, "lat": y} for x, y in ring])
             for zid, ring in pyref.ref_zones(3)],
            "zone_id string, ring array<struct<lon:double,lat:double>>")

    # (name, tier, builder) — small tier mirrors the sf0.1 headline
    # shape; big tier is 10× rows and one zoom deeper (4× tiles), so the
    # per-tile render work per point stays comparable
    cases = {
        "heatmap_tiles": {
            "small": lambda: heatmap_tiles(points(spark, 600_000), res=3,
                                           tile_px=64),
            "big": lambda: heatmap_tiles(points(spark, 6_000_000), res=4,
                                         tile_px=64),
        },
        "vector_tiles": {
            "small": lambda: vector_tiles(points(spark, 600_000), res=3,
                                          extent=4096),
            "big": lambda: vector_tiles(points(spark, 6_000_000), res=4,
                                        extent=4096),
        },
        "heatmap_pyramid": {
            "small": lambda: overview_tiles(
                heatmap_tiles(points(spark, 600_000), res=3, tile_px=64),
                tile_px=64),
            "big": lambda: overview_tiles(
                heatmap_tiles(points(spark, 6_000_000), res=4, tile_px=64),
                tile_px=64),
        },
        "zonal_stats": {
            "small": lambda: zonal_stats(
                images_table(spark, n=240, seed=42, fmts=FMTS_ALL),
                zones(spark), zoom=6),
            "big": lambda: zonal_stats(
                images_table(spark, n=2400, seed=42, fmts=FMTS_ALL),
                zones(spark), zoom=6),
        },
    }

    if os.environ.get("SCALE_X100") == "1":
        # 100× tier (60M synthetic pings / 24k images): the 10× tier is
        # still fixed-cost-dominated on this host, so this is where the
        # asymptotic slope shows
        cases["heatmap_tiles"]["x100"] = lambda: heatmap_tiles(
            points(spark, 60_000_000), res=5, tile_px=64)
        # one zoom per decade keeps per-tile feature density comparable;
        # res 6 at extent 4096 needs the round-4 MAX_RES raise (pix_res
        # 18) — at the old res-3 cap this tier measured a 64-way render
        # of 57M features and went linear (51× for 100×, recorded in
        # BENCH.md as the motivation)
        cases["vector_tiles"]["x100"] = lambda: vector_tiles(
            points(spark, 60_000_000), res=5, extent=4096)
        cases["heatmap_pyramid"]["x100"] = lambda: overview_tiles(
            heatmap_tiles(points(spark, 60_000_000), res=5, tile_px=64),
            tile_px=64)
        cases["zonal_stats"]["x100"] = lambda: zonal_stats(
            images_table(spark, n=24_000, seed=42, fmts=FMTS_ALL),
            zones(spark), zoom=6)

    out = {"reps": reps, "loadavg_start": load_start, "queries": {}}
    for name, tiers in cases.items():
        row = {}
        for tier, build in tiers.items():
            best = None
            for rep in range(reps + 1):  # warm-up discarded
                t0 = time.perf_counter()
                build().write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                if rep > 0:
                    best = dt if best is None else min(best, dt)
            row[tier] = round(best, 3)
        row["ratio_10x"] = round(row["big"] / row["small"], 2)
        if "x100" in row:
            row["ratio_100x"] = round(row["x100"] / row["small"], 2)
        out["queries"][name] = row
    out["loadavg_end"] = _loadavg()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
