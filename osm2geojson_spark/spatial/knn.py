"""G3 — kNN via cell-ring expansion (SURVEY.md §2.4 G3).

Query points carry their (ix, iy) grid coords; round r joins the corpus on
the Morton cells of the (2r+1)^2 disk around each query (pure column
exprs — no de-interleave needed because ix/iy ride along). Queries that
have ≥ K candidates at round r exit with the disk expanded by one extra
ring (candidates in ring r+1 can still be closer than ring-r corners);
the rest continue. Driver loop is over ROUNDS (log-ish, bounded), never
over rows.

Distance: haversine (column expr, codegen'd). Grid-disk containment uses
Chebyshev cell distance, so results are exact for the equirectangular
cell metric; near-pole distortion documented as approximate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from osm2geojson_spark.functions import cells as C


def haversine_expr(lon1, lat1, lon2, lat2):
    """Great-circle distance in km."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = F.sin(dlat) ** 2 + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) ** 2
    return F.lit(6371.0088) * 2 * F.asin(F.sqrt(a))


def _disk_cells(ix, iy, k: int, res: int):
    """Morton cells of the (2k+1)^2 disk, clamped to the grid."""
    n = 1 << res
    return F.array_distinct(
        F.flatten(
            F.transform(
                F.sequence(F.lit(-k), F.lit(k)),
                lambda dx: F.transform(
                    F.sequence(F.lit(-k), F.lit(k)),
                    lambda dy: C.cell_from_ixiy(
                        F.least(F.greatest(ix + dx, F.lit(0)), F.lit(n - 1)),
                        F.least(F.greatest(iy + dy, F.lit(0)), F.lit(n - 1)),
                    ),
                ),
            )
        )
    )


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    res: int = 8,
    max_rounds: int = 4,
    id_col: str = "id",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """For each query row: its k nearest corpus rows.

    corpus(id, lon, lat), queries(id, lon, lat) →
    (query_id, corpus_id, dist_km, rank). Deterministic tie-break on
    corpus id. Ring radius doubles per round: 1, 2, 4, …
    """
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.col(lon_col).alias("clon"), F.col(lat_col).alias("clat"),
        C.cell_expr(F.col(lon_col), F.col(lat_col), res).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(lon_col).alias("qlon"), F.col(lat_col).alias("qlat"),
        C.lon_ix(F.col(lon_col), res).alias("ix"),
        C.lat_iy(F.col(lat_col), res).alias("iy"),
    )

    answered = None
    pending = q
    radius = 1
    for round_no in range(max_rounds):
        last = round_no == max_rounds - 1
        cand = (
            pending.withColumn("cell", F.explode(_disk_cells(F.col("ix"), F.col("iy"), radius, res)))
            .join(c, "cell")
            .select("query_id", "qlon", "qlat", "ix", "iy", "corpus_id", "clon", "clat")
        )
        counts = cand.groupBy("query_id").agg(F.count("*").alias("n_cand"))
        enough = counts.filter(F.col("n_cand") >= k).select("query_id") if not last \
            else counts.select("query_id")
        # exact within the disk: expand by one ring for the exit set
        done_q = pending.join(enough, "query_id", "semi")
        done_cand = (
            done_q.withColumn(
                "cell", F.explode(_disk_cells(F.col("ix"), F.col("iy"), radius + 1, res)))
            .join(c, "cell")
            .select(
                "query_id", "corpus_id",
                haversine_expr(F.col("qlon"), F.col("qlat"),
                               F.col("clon"), F.col("clat")).alias("dist_km"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(F.asc("dist_km"), F.asc("corpus_id"))
        topk = (
            done_cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
        answered = topk if answered is None else answered.unionByName(topk)
        pending = pending.join(enough, "query_id", "anti")
        if last:
            break
        radius *= 2
    return answered
