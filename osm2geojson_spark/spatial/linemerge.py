"""Line merging (JTS/Shapely ``linemerge``, OSM way stitching) —
engine-new.

The reference assembles single ways (`OsmJoin.java:270-323`) but never
stitches ways INTO each other; merging adjoining segments into maximal
polylines is the standard preprocessing step for routing graphs and
cartographic generalization. Semantics follow the classic definition:
a chain extends through nodes of degree EXACTLY 2 and breaks at
junctions (degree >= 3) and terminals (degree 1).

Distributed shape (the 100 TB contract):

- node degrees: one endpoint-explode + groupBy (bounded by nodes);
- chain links: two segments are linked iff they share a degree-2
  node — an equi-join restricted to deg-2 nodes, each contributing
  EXACTLY ONE link pair, so the join output is <= #nodes (no fanout,
  no theta join);
- chains = connected components of the link graph via the distributed
  min-label propagation (O(chain length) bounded by O(log) rounds per
  doubling... propagation rounds = chain diameter; adversarially long
  chains are bounded by ``max_iters``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm2geojson_spark.operators.dedup import dup_clusters


def merge_lines(segments: DataFrame, max_iters: int = 25) -> DataFrame:
    """Merge segments into maximal chains. ``segments`` needs columns
    ``(seg_id, node_a, node_b)`` (int64 ids, one row per undirected
    segment). Returns one row per chain:
    ``(chain_id, n_segs, seg_sum)`` with ``chain_id`` = the smallest
    member seg_id and ``seg_sum`` the exact sum of member ids (an
    order-independent membership fingerprint)."""
    ends = (segments.select(F.col("seg_id"),
                            F.col("node_a").alias("node"))
            .unionByName(segments.select(
                F.col("seg_id"), F.col("node_b").alias("node"))))
    deg2 = (ends.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
            .where(F.col("deg") == 2)
            .select("node"))
    e2 = ends.join(deg2, "node", "left_semi")
    links = (e2.alias("a")
             .join(e2.alias("b"), "node")
             .where(F.col("a.seg_id") < F.col("b.seg_id"))
             .select(F.col("a.seg_id").alias("id_a"),
                     F.col("b.seg_id").alias("id_b")))
    labels = dup_clusters(links, max_iters=max_iters)
    return (segments
            .join(labels, segments.seg_id == labels.id, "left")
            .select("seg_id",
                    F.coalesce("cluster_id", "seg_id").alias("chain_id"))
            .groupBy("chain_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_segs"),
                 F.sum("seg_id").cast("long").alias("seg_sum")))
