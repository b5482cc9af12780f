"""Record linkage and graph link prediction — engine-new operators.

The reference has nothing in this family (its one join is the exact
OSM id equi-join, `OsmJoin.java:44`); these are the two standard
"almost-join" shapes a large curation/recommendation pipeline needs:

- :func:`fuzzy_match_pairs` — entity resolution between two sources
  whose keys do NOT line up: block on a cheap derived key, then verify
  candidates with bounded edit distance. The scale contract is the
  classic one: NEVER a cross join — candidate generation is an
  equi-join on the block key (one shuffle, bucket-bounded), and the
  expensive Levenshtein runs only inside blocks, JVM-side
  (``F.levenshtein`` with an early-exit threshold, codegen — no UDF).

- :func:`link_prediction` — "people who bought X also…" candidate
  edges: for every non-adjacent pair at distance 2, count common
  neighbors and a resource-allocation score. Wedge generation is an
  equi-join of the adjacency list with itself on the middle vertex, so
  the cost is sum(deg(v)^2) — the documented skew knob ``max_degree``
  drops super-hub middles (exactly the cap discipline minhash/simhash
  buckets use) before the join, keeping the blowup bounded at any
  scale. Scores stay in exact int64 (ppm fixed-point), so partial
  aggregation is order-independent and cross-engine bit-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fuzzy_match_pairs(
    left: DataFrame,
    right: DataFrame,
    block_expr,
    max_distance: int = 2,
) -> DataFrame:
    """Blocked fuzzy join: candidates share ``block_expr(name)`` (an
    equi-join — the only shuffle), matches have Levenshtein distance
    <= ``max_distance``.

    ``left``/``right`` need columns ``(id, name)``. Returns
    ``(id_a, id_b, name_a, name_b, dist)``.

    Spark's three-arg ``levenshtein(l, r, threshold)`` early-exits the
    DP once the band exceeds the threshold and returns -1 above it —
    the verify step is O(max_distance * len) per candidate instead of
    O(len^2), inside whole-stage codegen.
    """
    a = left.select(
        F.col("id").alias("id_a"), F.col("name").alias("name_a"),
        block_expr(F.col("name")).alias("block"))
    b = right.select(
        F.col("id").alias("id_b"), F.col("name").alias("name_b"),
        block_expr(F.col("name")).alias("block"))
    dist = F.levenshtein("name_a", "name_b", max_distance)
    return (a.join(b, "block")
            .select("id_a", "id_b", "name_a", "name_b",
                    dist.cast("long").alias("dist"))
            .where(F.col("dist") >= 0))


def link_prediction(
    edges: DataFrame,
    max_degree: int | None = None,
    ppm: int = 1_000_000,
) -> DataFrame:
    """Common-neighbor link prediction over an undirected simple graph.

    ``edges`` has columns ``(src, dst)`` with src < dst, one row per
    edge. Returns, for every NON-adjacent pair at distance 2:
    ``(src, dst, common, ra_ppm)`` where ``common`` is the number of
    shared neighbors and ``ra_ppm`` the resource-allocation index
    ``sum(1/deg(mid))`` in exact parts-per-million fixed point
    (``ppm div deg`` — integer division, order-independent partials,
    no float summation drift).

    ``max_degree`` drops middle vertices above the cap BEFORE the
    wedge join (sum(deg^2) bound), mirroring the LSH bucket caps.
    """
    und = (edges.select(F.col("src").alias("x"), F.col("dst").alias("y"))
           .unionAll(edges.select(F.col("dst").alias("x"),
                                  F.col("src").alias("y"))))
    deg = und.groupBy("x").agg(F.count(F.lit(1)).alias("deg"))
    if max_degree is not None:
        deg = deg.where(F.col("deg") <= max_degree)
    # adjacency annotated with the middle vertex's degree (broadcast:
    # the degree table is |V|-sized, tiny next to the wedge fanout)
    adj = und.join(F.broadcast(deg), "x")
    l = adj.select(F.col("x").alias("mid"), F.col("y").alias("src"),
                   F.col("deg").alias("mdeg"))
    r = adj.select(F.col("x").alias("mid"), F.col("y").alias("dst"))
    wedges = (l.join(r, "mid")
              .where(F.col("src") < F.col("dst")))
    scored = (wedges.groupBy("src", "dst")
              .agg(F.count(F.lit(1)).cast("long").alias("common"),
                   F.sum(F.expr(f"{ppm} div mdeg"))
                    .cast("long").alias("ra_ppm")))
    existing = edges.select(F.col("src"), F.col("dst"))
    return scored.join(existing, ["src", "dst"], "left_anti")
