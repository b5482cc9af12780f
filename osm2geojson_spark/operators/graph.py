"""Graph ranking — deterministic integer PageRank.

Completes the repo's large-graph trio (connected components in
``operators/dedup.dup_clusters``, shortest paths in ``spatial/route``):
rank near-dup cluster representatives, road-network hubs, link graphs.

Float PageRank sums contributions in shuffle order, so two runs (or two
engines) disagree in the last ulps — unacceptable under this repo's
value-exact oracle discipline. This implementation diffuses INTEGER
mass instead: ranks are fixed-point integers summing is associative and
order-free, per-edge contributions are floor divisions, and the damping
step is integer ``(85 · x) // 100`` — every engine and every
partitioning produces bit-identical ranks. The float interpretation
``mass / scale`` converges to standard PageRank as scale → ∞ (pinned
within 1e-6 of a numpy power iteration in tests).

Scale shape per iteration: one equi-join of the mass table against the
(pre-partitioned, cached) edge table + one map-side-combinable integer
sum — the ``dup_clusters``/``shortest_paths`` loop discipline
(localCheckpoint truncation). Dangling mass rides along as a one-row
broadcast aggregate, so each iteration is ONE job and the driver sees
no row data at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "triangle_count", "k_core", "link_prediction",
           "strongly_connected_components"]


def pagerank(
    edges: DataFrame,
    n_iters: int = 10,
    damping_pct: int = 85,
    scale: int = 10**12,
) -> DataFrame:
    """→ ``(node_id, mass)`` after ``n_iters`` rounds; ``mass/scale`` is
    the PageRank score. ``damping_pct`` is an integer percentage (the
    usual 0.85 → 85). Dangling-node mass is redistributed uniformly
    (the standard convention), in integer arithmetic."""
    spark = edges.sparkSession
    e = (
        edges.select(
            F.col("src").cast("long").alias("e_src"),
            F.col("dst").cast("long").alias("e_dst"),
        )
        .distinct()
        .repartition(F.col("e_src"))
        .sortWithinPartitions("e_src")
        .persist()
    )
    nodes = (
        e.select(F.col("e_src").alias("id"))
        .unionByName(e.select(F.col("e_dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    outdeg = e.groupBy(F.col("e_src").alias("id")).agg(
        F.count("*").alias("deg"))
    base = (
        nodes.join(outdeg, "id", "left")
        .select("id", F.coalesce("deg", F.lit(0)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    teleport = ((100 - damping_pct) * scale // 100) // n
    mass = base.select("id", "deg", F.lit(scale // n).alias("mass"))
    for _ in range(n_iters):
        # dangling mass stays a ONE-ROW broadcast DataFrame instead of a
        # driver collect: both it and contrib re-read the checkpointed
        # mass table, so the whole update is a single job per iteration
        # (the localCheckpoint materialization) — the driver never sees
        # a scalar, halving the per-round job barriers
        dangling = (
            mass.where(F.col("deg") == 0)
            .agg(F.coalesce(F.sum("mass"), F.lit(0)).alias("dang"))
        )
        contrib = (
            mass.where(F.col("deg") > 0)
            .join(e, mass.id == e.e_src)
            # `div`, not `/`: long / long is DOUBLE division in Spark
            # and the truncating cast can disagree with exact floor at
            # representation boundaries — `div` stays in int64
            .select(
                F.col("e_dst").alias("id"),
                F.expr("mass div deg").alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
        )
        mass = (
            base.join(contrib, "id", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                "deg",
                (
                    F.lit(teleport)
                    + F.expr(
                        f"({damping_pct} * (coalesce(inflow, 0L) "
                        f"+ (dang div {n}))) div 100"
                    )
                ).cast("long").alias("mass"),
            )
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    return mass.select(F.col("id").alias("node_id"), "mass")


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-vertex triangle counts over an undirected edge list —
    ``(node, n_tri)`` for every vertex in ≥1 triangle.

    Degree-ordered orientation (the standard skew killer): each
    undirected edge points from its lower-(degree, id) endpoint to the
    higher one, which (a) makes the orientation an acyclic total order
    so every triangle is generated EXACTLY once as a wedge at its
    lowest vertex closed by one oriented edge, and (b) bounds every
    out-degree by O(sqrt(m)) — the wedge self-join that explodes on a
    celebrity vertex in the naive formulation stays polynomial on
    power-law graphs. Three shuffles total (degree agg, wedge join,
    closing join) + the final per-vertex count; no driver data, no
    iteration.
    """
    a = F.least(F.col(src), F.col(dst)).alias("a")
    b = F.greatest(F.col(src), F.col(dst)).alias("b")
    canon = (edges.select(a, b)
             .where(F.col("a") != F.col("b")).distinct())
    deg = (
        canon.select(F.col("a").alias("node"))
        .unionAll(canon.select(F.col("b").alias("node")))
        .groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient by (deg, id): u -> v iff (deg_u, u) < (deg_v, v)
    oriented = (
        canon
        .join(deg.withColumnRenamed("node", "a")
                 .withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("node", "b")
                 .withColumnRenamed("deg", "db"), "b")
        .select(
            F.when((F.col("da") < F.col("db"))
                   | ((F.col("da") == F.col("db"))
                      & (F.col("a") < F.col("b"))),
                   F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when((F.col("da") < F.col("db"))
                   | ((F.col("da") == F.col("db"))
                      & (F.col("a") < F.col("b"))),
                   F.col("b")).otherwise(F.col("a")).alias("v"),
        )
    )
    o1 = oriented.alias("o1")
    o2 = oriented.alias("o2")
    wedges = o1.join(
        o2,
        (F.col("o1.u") == F.col("o2.u")) & (F.col("o1.v") < F.col("o2.v")),
    ).select(
        F.col("o1.u").alias("u"),
        F.col("o1.v").alias("x"),
        F.col("o2.v").alias("y"),
    )
    # close the wedge: the oriented edge between x and y can point
    # either way under the (deg, id) order
    closer = oriented.select(
        F.least("u", "v").alias("x"), F.greatest("u", "v").alias("y"))
    tris = wedges.withColumn("lo", F.least("x", "y")) \
                 .withColumn("hi", F.greatest("x", "y")) \
                 .drop("x", "y") \
                 .join(closer.withColumnRenamed("x", "lo")
                             .withColumnRenamed("y", "hi"),
                       ["lo", "hi"])
    members = (
        tris.select(F.col("u").alias("node"))
        .unionAll(tris.select(F.col("lo").alias("node")))
        .unionAll(tris.select(F.col("hi").alias("node")))
    )
    return members.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_tri"))


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 1_000,
) -> DataFrame:
    """Vertices of the k-core (the maximal subgraph where every vertex
    keeps degree ≥ k) with their in-core degree — the standard peel:
    repeatedly delete vertices of degree < k until a fixpoint. The
    corpus-curation use is the same as dup_clusters': a near-dup edge
    graph's 2-core separates clustered boilerplate from incidental
    pairs; on link graphs it is the classic spam/core split.

    Distributed shape per round: one degree aggregation (map-side
    combinable int count) + two broadcast-able anti-joins against the
    kill set (the kill set is the SMALL side by construction — it only
    holds vertices whose degree just dropped below k). O(1) driver rows
    per round (a limit(1) emptiness probe on the kill set);
    localCheckpoint truncates lineage. Rounds = peel depth ≤ graph
    degeneracy ≤ O(sqrt m); each round strictly shrinks the edge set,
    so late rounds are cheap. No skew surface: a celebrity vertex that
    SURVIVES never moves; one that dies is one row in the kill set.

    Degree = number of distinct neighbors (parallel edges and self
    loops dropped up front). Returns ``(node, deg)``."""
    if k < 1:
        raise ValueError("k must be >= 1")
    a = F.least(F.col(src), F.col(dst)).alias("a")
    b = F.greatest(F.col(src), F.col(dst)).alias("b")
    canon = (edges.select(a, b)
             .where(F.col("a") != F.col("b")).distinct())
    adj = (canon.select(F.col("a").alias("u"), F.col("b").alias("v"))
           .unionAll(canon.select(F.col("b").alias("u"),
                                  F.col("a").alias("v")))
           .repartition("u")
           .localCheckpoint(eager=True))
    for _ in range(max_rounds):
        deg = adj.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
        kill = deg.where(F.col("deg") < k).select("u")
        if kill.limit(1).count() == 0:
            return deg.select(F.col("u").alias("node"), "deg")
        adj = (adj.join(kill, "u", "left_anti")
               .join(kill.withColumnRenamed("u", "v"), "v", "left_anti")
               .select("u", "v")
               .localCheckpoint(eager=True))
    raise RuntimeError(
        f"k_core did not reach a fixpoint within {max_rounds} rounds")


def strongly_connected_components(
    edges: DataFrame, max_outer: int = 12, max_inner: int = 200,
) -> DataFrame:
    """Strongly connected components of a DIRECTED graph →
    ``(id, scc_id)`` with scc_id = the smallest member id (canonical).

    The Pregel/Orzan COLORING algorithm — the standard distributed SCC
    recipe (Tarjan is inherently sequential):

    per outer phase, over the still-unassigned subgraph:
      1. **forward max-color fixpoint**: color(v) ← max over v and its
         in-neighbors' colors, to convergence ⇒ color(v) = the max id
         that can reach v. A node with color(v) == v is a root.
      2. **backward reach within color**: starting from the roots, add
         u whenever an edge u→w has w reached AND color(u) == color(w).
         The reached set of root r is exactly SCC(r) (w reaches r
         inside r's color class, and r reaches w by definition of the
         color) — every color class resolves ONE SCC per phase, all
         classes in parallel.
      3. assign, subtract, repeat on the remainder.

    Loop discipline is dup_clusters': every carried frame is
    localCheckpoint-truncated, the driver sees one count per round,
    edges live pre-partitioned+persisted per phase. Phases needed =
    the length of the longest root-chain (≤ #SCCs, O(log) typical);
    inner rounds = subgraph diameter. Both bounds fail LOUDLY when
    exceeded (silent partial labels are worse than a retry with a
    bigger budget)."""
    nodes = (
        edges.select(F.col("src").cast("long").alias("id"))
        .unionByName(edges.select(F.col("dst").cast("long").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    rem_edges = (
        edges.select(F.col("src").cast("long").alias("src"),
                     F.col("dst").cast("long").alias("dst"))
        .distinct()
        .repartition(F.col("dst"))
        .persist()
    )
    remaining = nodes
    assigned = None
    for _phase in range(max_outer):
        if remaining.isEmpty():
            break
        color = remaining.withColumn(
            "color", F.col("id")).localCheckpoint(eager=True)
        for _ in range(max_inner):
            msgs = (
                rem_edges.join(color, rem_edges.src == color.id)
                .groupBy(F.col("dst").alias("id"))
                .agg(F.max("color").alias("mc"))
            )
            upd = (
                color.join(msgs, "id", "left")
                .select(
                    "id",
                    F.greatest(F.col("color"),
                               F.coalesce("mc", F.col("color")))
                    .alias("color"),
                    (F.col("mc") > F.col("color")).alias("_chg"))
                .localCheckpoint(eager=True)
            )
            chg = upd.filter(F.col("_chg")).count()
            color = upd.select("id", "color")
            if chg == 0:
                break
        else:
            raise RuntimeError(
                f"SCC forward fixpoint exceeded {max_inner} rounds "
                "(subgraph diameter too large); raise max_inner")
        reached = (color.where(F.col("color") == F.col("id"))
                   .localCheckpoint(eager=True))
        for _ in range(max_inner):
            cand = (
                rem_edges
                .join(reached.select(F.col("id").alias("dst"),
                                     F.col("color").alias("rcolor")),
                      "dst")
                .select(F.col("src").alias("id"), "rcolor")
                .join(color, "id")
                .where(F.col("color") == F.col("rcolor"))
                .select("id", "color")
            )
            new_reached = (reached.unionByName(cand).distinct()
                           .localCheckpoint(eager=True))
            grew = new_reached.count() - reached.count()
            reached = new_reached
            if grew == 0:
                break
        else:
            raise RuntimeError(
                f"SCC backward reach exceeded {max_inner} rounds; "
                "raise max_inner")
        part = reached.select("id", F.col("color").alias("root"))
        assigned = part if assigned is None else (
            assigned.unionByName(part).localCheckpoint(eager=True))
        remaining = (remaining.join(reached.select("id"), "id",
                                    "left_anti")
                     .localCheckpoint(eager=True))
        still = remaining.select("id")
        rem_edges = (
            rem_edges
            .join(still.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(still.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .repartition(F.col("dst"))
            .persist()
        )
    else:
        raise RuntimeError(
            f"SCC did not finish in {max_outer} phases; raise max_outer")
    # canonical relabel: root id (max-reaching) → min member id. Plain
    # shuffle join — #SCCs is O(n) on a DAG, never assume broadcastable
    mins = assigned.groupBy("root").agg(F.min("id").alias("scc_id"))
    return assigned.join(mins, "root").select("id", "scc_id")


def link_prediction(edges: DataFrame,
                    max_degree: int | None = None) -> DataFrame:
    """Common-neighbor link prediction over an undirected graph:
    for every NON-adjacent pair sharing ≥ 1 neighbor, the classic
    exact-integer scores — common-neighbor count ``cn`` and the
    preferential-attachment product ``deg_u·deg_v`` (Adamic-Adar's
    1/log weights are floats; these two are the order-stable integer
    members of the family). ``edges`` is (src, dst) in any
    orientation/duplication — canonicalized first.

    Distributed shape: one wedge join through the shared neighbor
    (fan-out Σ_w deg(w)² — the same bound as triangle counting), one
    pair-key count shuffle, an anti-join against the edge set, two
    broadcast-friendly degree joins. ``max_degree`` drops hub WEDGE
    CENTERS above the cap (the standard production guard: a
    celebrity node contributes deg² candidate pairs and ~zero
    signal); None = exact."""
    e = (edges.select(
        F.least(F.col("src"), F.col("dst")).cast("long").alias("u"),
        F.greatest(F.col("src"), F.col("dst")).cast("long").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct())
    adj = (e.select(F.col("u").alias("a"), F.col("v").alias("b"))
           .unionAll(e.select(F.col("v").alias("a"),
                              F.col("u").alias("b"))))
    deg = adj.groupBy("a").agg(F.count("*").alias("dg"))
    center = adj
    if max_degree is not None:
        center = adj.join(
            deg.where(F.col("dg") <= int(max_degree)).select("a"), "a")
    cn = (center.alias("x")
          .join(center.alias("y"),
                (F.col("x.a") == F.col("y.a"))
                & (F.col("x.b") < F.col("y.b")))
          .groupBy(F.col("x.b").alias("u"), F.col("y.b").alias("v"))
          .agg(F.count("*").alias("cn")))
    ne = cn.join(e, ["u", "v"], "left_anti")
    du = deg.select(F.col("a").alias("u"), F.col("dg").alias("deg_u"))
    dv = deg.select(F.col("a").alias("v"), F.col("dg").alias("deg_v"))
    return (ne.join(du, "u").join(dv, "v")
            .select("u", "v", "cn", "deg_u", "deg_v",
                    (F.col("deg_u") * F.col("deg_v")).alias("pa")))


def clustering_coeff(edges: DataFrame) -> DataFrame:
    """Local clustering coefficient as EXACT rationals: per node
    ``(node, deg, n_tri, possible)`` with possible = C(deg, 2) —
    the coefficient is n_tri/possible, compared cross-multiplied,
    never divided. Rides :func:`triangle_count`'s degree-ordered
    orientation (the wedge-join skew bound) plus one degree join;
    degree-1 nodes report possible = 0 (coefficient undefined —
    callers filter, the honest convention)."""
    a = F.least(F.col("src"), F.col("dst")).alias("a")
    b = F.greatest(F.col("src"), F.col("dst")).alias("b")
    canon = (edges.select(a, b)
             .where(F.col("a") != F.col("b")).distinct())
    deg = (
        canon.select(F.col("a").alias("node"))
        .unionAll(canon.select(F.col("b").alias("node")))
        .groupBy("node").agg(F.count(F.lit(1)).alias("deg")))
    tri = triangle_count(canon, "a", "b")
    return (deg.join(tri, "node", "left")
            .select("node", "deg",
                    F.coalesce("n_tri", F.lit(0)).alias("n_tri"),
                    F.expr("(deg * (deg - 1)) div 2").alias("possible")))
