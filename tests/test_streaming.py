"""Streaming twins vs their batch oracles: the windowed-agg stream over
the events parquet must equal the batch events_hourly aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm2geojson_spark.streaming.events import (
    hourly_counts_stream,
    run_stream_to_memory,
    stream_events_from_parquet,
)

SF = "/root/testdata/sf0.001"


def test_hourly_stream_matches_batch(spark):
    stream = stream_events_from_parquet(spark, SF)
    run_stream_to_memory(hourly_counts_stream(stream), "hourly_t", "complete")
    got = {(r["hour"], r["event_type"]): (r["n"], round(r["sum_value"], 6))
           for r in spark.sql("SELECT * FROM hourly_t").collect()}

    ev = spark.read.parquet(f"{SF}/events.parquet")
    want = {(r["hour"], r["event_type"]): (r["n"], round(r["sum_value"], 6))
            for r in ev.groupBy(
                F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH").alias("hour"),
                "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                 .alias("sum_value")).collect()}
    assert got == want and len(got) > 0


def test_sessionize_stream_closes_sessions(spark):
    """The stateful operator emits every CLOSED session; sessions closed
    by a later event (gap > 30 min) must match the batch sessionizer's
    non-final sessions per user."""
    from osm2geojson_spark.queries import q_sessionize
    from osm2geojson_spark.streaming.events import sessionize_stream

    stream = stream_events_from_parquet(spark, SF)
    run_stream_to_memory(sessionize_stream(stream, emit_on_timeout=False),
                         "sess_t", "append")
    got = {(r["user_id"], r["start_sec"]): (r["n_events"], r["end_sec"])
           for r in spark.sql("SELECT * FROM sess_t").collect()}

    batch = q_sessionize(spark, SF).collect()
    # drop each user's LAST session (still open at end-of-stream; only
    # emitted on timeout, which availableNow runs don't wait for)
    last_start = {}
    for r in batch:
        last_start[r["user_id"]] = max(
            last_start.get(r["user_id"], -1), r["start_sec"])
    want = {(r["user_id"], r["start_sec"]): (r["n_events"], r["end_sec"])
            for r in batch if r["start_sec"] != last_start[r["user_id"]]}
    assert got == want


def test_dedup_stream_matches_batch_distinct(spark):
    """Streaming dedup (dropDuplicatesWithinWatermark) over the events
    stream equals batch dropDuplicates on the same keys (single
    availableNow batch ⇒ all duplicates inside the horizon)."""
    from osm2geojson_spark.streaming.events import dedup_stream

    stream = stream_events_from_parquet(spark, SF)
    out = dedup_stream(stream, ["user_id", "event_type"]).select(
        "user_id", "event_type")
    run_stream_to_memory(out, "dedup_t", "append")
    got = {(r["user_id"], r["event_type"])
           for r in spark.sql("SELECT * FROM dedup_t").collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet")
    want = {(r["user_id"], r["event_type"])
            for r in ev.select("user_id", "event_type").distinct().collect()}
    assert got == want and len(got) > 0


def test_tile_counts_stream_matches_batch(spark):
    from osm2geojson_spark.functions import cells as C
    from osm2geojson_spark.queries import lat_col, lon_col
    from osm2geojson_spark.streaming.events import tile_counts_stream

    def with_coords(df):
        return df.select(
            "ts",
            lon_col(F.col("event_id")).alias("lon"),
            lat_col(F.col("event_id")).alias("lat"),
        )

    stream = with_coords(stream_events_from_parquet(spark, SF))
    run_stream_to_memory(tile_counts_stream(stream, res=6),
                         "tiles_t", "complete")
    got = {(r["hour"], r["tile"]): r["n"]
           for r in spark.sql("SELECT * FROM tiles_t").collect()}

    ev = with_coords(spark.read.parquet(f"{SF}/events.parquet"))
    want = {(r["hour"], r["tile"]): r["n"]
            for r in ev.groupBy(
                F.date_format(F.date_trunc("hour", "ts"),
                              "yyyy-MM-dd HH").alias("hour"),
                C.cell_expr(F.col("lon"), F.col("lat"), 6).alias("tile"))
            .agg(F.count("*").alias("n")).collect()}
    assert got == want and len(got) > 50


def test_mvt_stream_matches_batch(spark):
    from osm2geojson_spark.queries import lat_col, lon_col
    from osm2geojson_spark.streaming.events import (
        mvt_pixel_counts_stream,
        mvt_stream_to_memory,
        render_mvt_tiles,
    )

    def with_coords(df):
        return df.select(
            "ts",
            lon_col(F.col("event_id")).alias("lon"),
            lat_col(F.col("event_id")).alias("lat"),
        )

    stream = with_coords(stream_events_from_parquet(spark, SF))
    mvt_stream_to_memory(
        mvt_pixel_counts_stream(stream, res=3), "mvt_t")
    got = {(r["hour"], r["tile"]):
           (r["n_features"], r["n_pts"], bytes(r["mvt"]).hex())
           for r in spark.table("global_temp.mvt_t").collect()}

    # batch twin: the SAME windowed pixel counts from a static read,
    # rendered by the same (independently oracle-checked) serializer
    ev = with_coords(spark.read.parquet(f"{SF}/events.parquet"))
    from osm2geojson_spark.functions import cells as C

    pix_res = 3 + 12
    ix = C.lon_ix(F.col("lon"), pix_res)
    iy = C.lat_iy(F.col("lat"), pix_res)
    batch_pc = ev.groupBy(
        F.date_format(F.date_trunc("hour", "ts"),
                      "yyyy-MM-dd HH").alias("hour"),
        C.cell_from_ixiy(
            F.shiftright(ix, 12), F.shiftright(iy, 12)).alias("tile"),
        ix.bitwiseAND(F.lit(4095)).alias("pxl"),
        iy.bitwiseAND(F.lit(4095)).alias("pyl"),
    ).agg(F.count("*").alias("n"))
    want = {(r["hour"], r["tile"]):
            (r["n_features"], r["n_pts"], bytes(r["mvt"]).hex())
            for r in render_mvt_tiles(batch_pc).collect()}
    assert got == want and len(got) > 20
    # decoded tile counts are self-consistent
    from osm2geojson_spark.spatial.mvt import decode_tile

    any_tile = next(iter(got.values()))
    lay = decode_tile(bytes.fromhex(any_tile[2]))[0]
    assert sum(lay["values"][f["tags"][1]]
               for f in lay["features"]) == any_tile[1]


def test_attribution_stream_stream_join_matches_batch(spark, tmp_path):
    """Stream-stream inner join with time bound: multi-file replay ==
    the same join on the static table (horizon covers the replay span,
    so no late drops — see attribution_pairs docstring)."""
    from osm2geojson_spark.streaming.events import (
        attribution_pairs,
        attribution_stream,
    )

    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .withColumn("ts", F.col("ts").cast("timestamp")))
    # land as 4 drops so view/click matches must cross micro-batches
    ev.repartition(4).write.parquet(str(tmp_path / "evdrops"))
    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(tmp_path / "evdrops")))
    q = (attribution_stream(stream, horizon="30 days").writeStream
         .format("memory").queryName("attrib_t")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = sorted((r.view_id, r.click_id, r.user_id, r.delay_sec)
                 for r in spark.sql("SELECT * FROM attrib_t").collect())

    views = ev.where("event_type = 'view'")
    clicks = ev.where("event_type = 'click'")
    want = sorted((r.view_id, r.click_id, r.user_id, r.delay_sec)
                  for r in attribution_pairs(
                      views, clicks, horizon="30 days").collect())
    assert got == want and len(got) > 0
    # delays respect the bound and are non-negative
    assert all(0 <= d <= 30 * 86400 for *_x, d in got)
