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
    """Flagship: points → PIP (broadcast, cell-prefiltered) → tile
    assignment → per-tile/per-polygon aggregate."""
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    region = spark.read.parquet(f"{SF_DIR}/region.parquet")
    pts = cust.select(
        "c_custkey",
        Q.lon_col(F.col("c_custkey")).alias("lon"),
        Q.lat_col(F.col("c_custkey")).alias("lat"),
    )
    hits = point_in_polygon_join(pts, Q.region_boxes(region), res=6)
    tiled = TI.assign_tiles(hits, zoom=5)
    return tiled.groupBy("poly_id", "tile_id").agg(
        F.count("*").alias("n_points"),
        F.min("c_custkey").alias("min_custkey"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
