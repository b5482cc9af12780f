"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship spatial pipeline (G1 cell encode → G2
broadcast point-in-polygon → G4 tile assignment → per-tile rollup) on
sf0.001. ``queries``/``oracle_sql`` expose the full operator catalog from
``osm2geojson_spark.queries`` (one DuckDB-SQL twin per oracle-able op).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm2geojson_spark import queries as Q
from osm2geojson_spark.spatial import tiles as TI
from osm2geojson_spark.spatial.pip import point_in_polygon_join

SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship (north-star shape): image+caption rows → broadcast PIP
    (Morton-cell prefilter + vectorized ray-cast residual) against
    polygons derived from the sf0.001 region table → shuffle-free tile
    assignment → per-(polygon, tile) rollup."""
    from osm2geojson_spark.synth.images import images_table

    region = spark.read.parquet(f"{SF_DIR}/region.parquet")
    imgs = images_table(spark, n=2000, seed=42)
    hits = point_in_polygon_join(imgs, Q.region_boxes(region), res=6)
    tiled = TI.assign_tiles(hits, zoom=5)
    return tiled.groupBy("poly_id", "tile_id").agg(
        F.count("*").alias("n_images"),
        F.min("image_id").alias("first_image"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
