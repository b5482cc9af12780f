"""Trajectory analytics over point streams: per-entity ordered path
reconstruction and movement statistics (path length, displacement,
straightness, step extremes, bbox).

The GPS-trace / fleet-telemetry shape: billions of (entity, ts, lon,
lat) pings → one row per entity. ONE shuffle (the groupBy on the
entity key); everything after the ordered collect is array expressions
inside codegen.

Cross-engine exactness (the catalog twin is value-exact, not
approximate): segment lengths are IEEE doubles — identical in any
engine — but a parallel SUM would reorder them. Both sides therefore
fold the ordered step list LEFT-TO-RIGHT (``F.aggregate`` here,
``list_reduce`` in the oracle), the same trick as
``similarity.dot_expr``/``pyref.dot_fold``. Planar metric (sqrt of
exact squared deltas) per the repo determinism rules — no trig.

Scale note: ``collect_list`` bounds state by the longest single
trajectory (fine for real traces, 10^3..10^5 pings); a multi-day
mega-trajectory should be time-bucketed first (``F.window`` on ts)
and the per-bucket stats summed — same operators, one more group key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def trajectory_stats(
    df: DataFrame,
    id_col: str | list[str] = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Per-entity movement statistics over the (ts, order_col)-ordered
    ping sequence: (*ids, n_pts, path_len, net_disp, straightness,
    max_step, min_x, min_y, max_x, max_y). ``id_col`` may be a list for
    compound keys (e.g. (user_id, trip_id) after :func:`segment_trips`)."""
    ids = [id_col] if isinstance(id_col, str) else list(id_col)
    pt = F.struct(
        F.col(ts_col).alias("ts"), F.col(order_col).alias("o"),
        F.col(lon_col).alias("x"), F.col(lat_col).alias("y"),
    )
    g = df.groupBy(*ids).agg(
        F.array_sort(F.collect_list(pt)).alias("path"))

    path = F.col("path")

    def seg(i: Column) -> Column:
        a, b = F.element_at(path, i), F.element_at(path, i + 1)
        dx, dy = b["x"] - a["x"], b["y"] - a["y"]
        return F.sqrt(dx * dx + dy * dy)

    # materialize steps in its own projection: referencing the builder
    # inside later lambdas would re-evaluate it per element (the
    # HOF-no-CSE pitfall)
    steps = F.when(
        F.size(path) >= 2,
        F.transform(F.sequence(F.lit(1), F.size(path) - 1), seg),
    ).otherwise(F.array().cast("array<double>"))
    staged = g.select(*ids, "path", steps.alias("steps"))

    st = F.col("steps")
    first, last = F.element_at(path, 1), F.element_at(path, F.size(path))
    ndx, ndy = last["x"] - first["x"], last["y"] - first["y"]
    net = F.sqrt(ndx * ndx + ndy * ndy)
    path_len = F.aggregate(st, F.lit(0.0), lambda acc, s: acc + s)
    xs = F.transform(path, lambda p: p["x"])
    ys = F.transform(path, lambda p: p["y"])
    return staged.select(
        *[F.col(c) for c in ids],
        F.size(path).cast("int").alias("n_pts"),
        path_len.alias("path_len"),
        net.alias("net_disp"),
        F.when(path_len > 0.0, net / path_len).otherwise(F.lit(0.0))
        .alias("straightness"),
        F.when(F.size(st) > 0, F.array_max(st)).otherwise(F.lit(0.0))
        .alias("max_step"),
        F.array_min(xs).alias("min_x"),
        F.array_min(ys).alias("min_y"),
        F.array_max(xs).alias("max_x"),
        F.array_max(ys).alias("max_y"),
    )


def segment_trips(
    df: DataFrame,
    max_gap_sec: int = 1800,
    id_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Trip segmentation (movement sessionization): a new ``trip_id``
    starts whenever consecutive pings of an entity are more than
    ``max_gap_sec`` apart — the GPS-trace analog of the event
    sessionizer (SURVEY §2.5 sessionize), expressed as one window pass:
    lag → gap flag → running sum. One shuffle on the entity key, shared
    with the downstream :func:`trajectory_stats` groupBy.

    ``ts`` is normalized through TIMESTAMP_NTZ (the testdata parquet
    convention) before the epoch diff."""
    from pyspark.sql import Window

    ep = F.expr(
        f"timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        f"CAST({ts_col} AS TIMESTAMP_NTZ))")
    w = Window.partitionBy(id_col).orderBy(ts_col, order_col)
    gap = ep - F.lag(ep).over(w)
    new_trip = (gap.isNull() | (gap > max_gap_sec)).cast("int")
    trip = F.sum(new_trip).over(
        w.rowsBetween(Window.unboundedPreceding, 0))
    return df.withColumn("trip_id", trip.cast("int"))


def od_matrix(
    df: DataFrame,
    res: int = 3,
    max_gap_sec: int = 86400,
    id_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Origin→destination flow matrix: segment pings into trips
    (:func:`segment_trips`), take each trip's first/last ping, assign
    both to Morton cells at resolution ``res`` and count flows per
    (o_cell, d_cell) zone pair — the transit-planning rollup over raw
    GPS traces.

    Scale shape: the trip endpoints come from ``min``/``max`` over a
    ``(ts, order, lon, lat)`` struct — lexicographic struct min with the
    unique (ts, order) prefix picks the whole first/last ROW in one
    map-side-combinable aggregation (no per-trip path arrays through
    the shuffle). The window pass, the trip groupBy, and the final OD
    groupBy are the only exchanges; the first two share the entity key.
    All output measures are exact integers (counts), so the result is
    bit-stable under any partitioning."""
    from osm2geojson_spark.functions import cells as C

    seg = segment_trips(df, max_gap_sec, id_col, ts_col, order_col)
    key = F.struct(
        F.col(ts_col).alias("ts"), F.col(order_col).alias("o"),
        F.col(lon_col).alias("x"), F.col(lat_col).alias("y"),
    )
    trips = seg.groupBy(id_col, "trip_id").agg(
        F.min(key).alias("o_pt"), F.max(key).alias("d_pt"),
        F.count("*").alias("n_pings"))
    labelled = trips.select(
        F.col(id_col),
        C.cell_expr(F.col("o_pt.x"), F.col("o_pt.y"), res).alias("o_cell"),
        C.cell_expr(F.col("d_pt.x"), F.col("d_pt.y"), res).alias("d_cell"),
        "n_pings")
    return labelled.groupBy("o_cell", "d_cell").agg(
        F.count("*").alias("n_trips"),
        F.countDistinct(id_col).alias("n_users"),
        F.sum("n_pings").alias("n_pings"))


def staypoints(
    df: DataFrame,
    cell_size: int,
    min_dwell_sec: int = 0,
    min_pings: int = 2,
    id_col: str = "user_id",
    sec_col: str = "sec",
    ix_col: str = "ix",
    iy_col: str = "iy",
    order_col: str = "event_id",
) -> DataFrame:
    """Staypoint (dwell) detection — the trajectory op between raw
    pings and trips: a staypoint is a MAXIMAL run of consecutive pings
    (per entity, time-ordered) inside the same ``cell_size`` grid cell,
    kept when it spans ≥ ``min_pings`` pings and ≥ ``min_dwell_sec``
    seconds. The grid variant (vs the Li et al. radius walk, whose
    variable lookahead has no bounded window shape) is what scales: one
    window pass (lag → cell-change flag → running sum = run id) + one
    groupBy — both keyed on the entity, so AQE coalesces onto ONE
    shuffle, the segment_trips discipline exactly.

    Coordinates are INTEGER (micro-degrees or any int lattice):
    ``cell = coord div cell_size`` stays in int64 end to end, so the
    DuckDB oracle is value-exact with no float traps. Run ids are
    deterministic under the (sec, order_col) total order.

    Returns ``(id_col, sp_id, cell_x, cell_y, n_pings, t_start, t_end,
    dwell_sec)``."""
    from pyspark.sql import Window

    cs = int(cell_size)
    if cs < 1:
        raise ValueError("cell_size must be >= 1")
    cx = F.expr(f"`{ix_col}` div {cs}")
    cy = F.expr(f"`{iy_col}` div {cs}")
    w = Window.partitionBy(id_col).orderBy(sec_col, order_col)
    pts = df.select(
        F.col(id_col), F.col(sec_col), F.col(order_col),
        cx.alias("cell_x"), cy.alias("cell_y"))
    moved = (
        F.lag("cell_x").over(w).isNull()
        | (F.lag("cell_x").over(w) != F.col("cell_x"))
        | (F.lag("cell_y").over(w) != F.col("cell_y"))).cast("int")
    runs = pts.withColumn(
        "sp_id",
        F.sum(moved).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    agg = (runs.groupBy(id_col, "sp_id")
           .agg(F.min("cell_x").alias("cell_x"),
                F.min("cell_y").alias("cell_y"),
                F.count(F.lit(1)).alias("n_pings"),
                F.min(sec_col).alias("t_start"),
                F.max(sec_col).alias("t_end"))
           .withColumn("dwell_sec", F.col("t_end") - F.col("t_start")))
    return agg.where((F.col("n_pings") >= int(min_pings))
                     & (F.col("dwell_sec") >= int(min_dwell_sec)))


def heading_octants(pts: DataFrame, user_col: str, order_col: str,
                    x_col: str, y_col: str) -> DataFrame:
    """Movement-direction census: consecutive-ping deltas per entity
    bucketed into 8 octants by the EXACT integer comparison ladder
    (sign tests + |dy| vs |dx|, no atan2 — the spatial/texture.py
    edge-histogram ladder, documented there; zero delta → bucket 8)
    → global ``(sector, n, n_users)``. Integer coordinates in, one
    entity-key window + one 9-key groupBy."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(order_col)
    d = (pts.select(
        F.col(user_col).alias("u"),
        (F.lead(x_col).over(w) - F.col(x_col)).alias("dx"),
        (F.lead(y_col).over(w) - F.col(y_col)).alias("dy"))
        .where(F.col("dx").isNotNull()))
    sector = F.expr("""
      CASE WHEN (dx = 0) AND (dy = 0) THEN 8
           WHEN (dy >= 0) AND (dx > 0) AND (abs(dy) < abs(dx)) THEN 0
           WHEN (dy >= 0) AND (dx > 0) THEN 1
           WHEN (dy >= 0) AND (dx = 0) THEN 2
           WHEN (dy >= 0) AND (abs(dy) >= abs(dx)) THEN 2
           WHEN (dy >= 0) THEN 3
           WHEN (dy < 0) AND (dx < 0) AND (abs(dy) < abs(dx)) THEN 4
           WHEN (dy < 0) AND (dx < 0) THEN 5
           WHEN (dy < 0) AND (dx = 0) THEN 6
           WHEN (dy < 0) AND (abs(dy) >= abs(dx)) THEN 6
           ELSE 7 END""").cast("int")
    return (d.select("u", sector.alias("sector"))
            .groupBy("sector")
            .agg(F.count("*").alias("n"),
                 F.countDistinct("u").alias("n_users")))


def convoys(
    pts: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    x_col: str = "lon",
    y_col: str = "lat",
    cell: int = 8,
    bucket_secs: int = 86_400,
    min_len: int = 3,
) -> DataFrame:
    """Co-movement (convoy/flock) detection → one row per user pair
    and maximal co-location run: ``(user_a, user_b, start_bucket,
    end_bucket, run_len)`` for runs of ≥ ``min_len`` CONSECUTIVE time
    buckets in which both users pinged the same spatial cell.

    The classic three-stage distributed shape, no all-pairs scan:
    (1) presence — distinct (user, bucket, cell) rows, one shuffle;
    (2) pair generation — a self-equi-join ON (bucket, cell), so only
        users sharing a cell-bucket ever meet (the LSH-bucket
        discipline from dedup: candidate pairs are bounded by
        occupancy², never user-count²; a skew-prone mega-cell should
        be capped upstream exactly like ``max_bucket_size`` in
        minhash);
    (3) gaps-and-islands — per pair, ``bucket − row_number`` groups
        consecutive buckets into runs (one partitioned window + one
        groupBy).

    Cells/buckets are integer floors (truncating div after an
    int-exact floor(x) — the repo's floor/pmod discipline), so the
    SQL twin is literal."""
    b = F.expr(
        f"CAST(floor(CAST(unix_timestamp({ts_col}) AS DOUBLE)"
        f" / {bucket_secs}) AS BIGINT)")
    pres = (
        pts.select(
            F.col(user_col).alias("u"),
            b.alias("bucket"),
            F.expr(f"CAST(floor({x_col} / {cell}) AS BIGINT)").alias("cx"),
            F.expr(f"CAST(floor({y_col} / {cell}) AS BIGINT)").alias("cy"))
        .distinct())
    a = pres.alias("a")
    bb = pres.alias("b")
    pairs = (
        a.join(bb, (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.cx") == F.col("b.cx"))
               & (F.col("a.cy") == F.col("b.cy"))
               & (F.col("a.u") < F.col("b.u")))
        .select(F.col("a.u").alias("user_a"),
                F.col("b.u").alias("user_b"),
                F.col("a.bucket").alias("bucket"))
        .distinct())
    from pyspark.sql import Window as W

    w = W.partitionBy("user_a", "user_b").orderBy("bucket")
    runs = pairs.withColumn(
        "grp", F.col("bucket") - F.row_number().over(w))
    return (
        runs.groupBy("user_a", "user_b", "grp")
        .agg(F.min("bucket").alias("start_bucket"),
             F.max("bucket").alias("end_bucket"),
             F.count("*").alias("run_len"))
        .where(F.col("run_len") >= int(min_len))
        .drop("grp"))
