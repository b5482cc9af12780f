"""Checkpoint / resume orchestration with per-partition lineage (M5).

The reference's restartability model is "each stage is a file on disk"
(OsmJoin.java:423-461: six named gz datasets; a crashed run restarts from
the last completed file). This module is the distributed generalization:

- ``run_stage``     — stage-level checkpoint: compute → atomic parquet
  snapshot + manifest; a completed stage is never recomputed (resume =
  read).
- ``run_bucketed_stage`` — PARTITION-level checkpoint (north_rule
  "resumable from per-partition checkpoints with lineage"): the stage is
  bucketed on a key column; each completed bucket is recorded in the
  lineage table; resume recomputes ONLY missing buckets and appends.
- lineage + metrics live as parquet tables under ``<root>/_lineage`` /
  ``<root>/_metrics`` (Iceberg-ready layout: swap the writer for
  ``format("iceberg")`` when the runtime jar is on the cluster — this
  sandbox has no network-fetched jars, SURVEY.md §7 risk 7).

Atomicity: data lands in ``<stage>.tmp-<token>`` and is renamed into
place before the manifest/lineage row is written — a crash mid-write
leaves no half-visible stage (same discipline as SortingWriter's bucket
swap, SortingWriter.java:88-115).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LINEAGE_SCHEMA = ("stage string, bucket int, n_rows long, wall_ms long, "
                   "finished_at string, status string")


def _manifest_path(root: str, stage: str) -> str:
    return os.path.join(root, stage, "_MANIFEST.json")


def _data_path(root: str, stage: str) -> str:
    return os.path.join(root, stage, "data")


def stage_is_complete(root: str, stage: str) -> bool:
    return os.path.exists(_manifest_path(root, stage))


def run_stage(
    spark: SparkSession, root: str, stage: str,
    fn: Callable[[], DataFrame],
) -> DataFrame:
    """Stage-level checkpoint: returns the stage output, computing it only
    if no completed snapshot exists."""
    data = _data_path(root, stage)
    if stage_is_complete(root, stage):
        return spark.read.parquet(data)
    t0 = time.perf_counter()
    df = fn()
    tmp = data + ".tmp-" + uuid.uuid4().hex[:8]
    df.write.mode("overwrite").parquet(tmp)
    if os.path.exists(data):
        shutil.rmtree(data)
    os.rename(tmp, data)
    out = spark.read.parquet(data)
    n = out.count()
    manifest = {
        "stage": stage, "n_rows": n,
        "schema": out.schema.jsonValue(),
        "wall_ms": int((time.perf_counter() - t0) * 1000),
        "finished_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    mp = _manifest_path(root, stage)
    with open(mp + ".tmp", "w") as f:
        json.dump(manifest, f)
    os.rename(mp + ".tmp", mp)
    return out


# ------------------------------------------------------------------ lineage
def lineage_table(spark: SparkSession, root: str) -> DataFrame:
    p = os.path.join(root, "_lineage")
    if not os.path.exists(p):
        return spark.createDataFrame([], _LINEAGE_SCHEMA)
    return spark.read.parquet(p)


def _append_lineage(spark: SparkSession, root: str, rows: list[tuple]) -> None:
    spark.createDataFrame(rows, _LINEAGE_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(os.path.join(root, "_lineage"))


def completed_buckets(spark: SparkSession, root: str, stage: str) -> set[int]:
    lt = lineage_table(spark, root)
    return {
        r["bucket"]
        for r in lt.filter((F.col("stage") == stage) & (F.col("status") == "done"))
        .select("bucket").distinct().collect()
    }


def run_bucketed_stage(
    spark: SparkSession, root: str, stage: str,
    input_df: DataFrame,
    fn: Callable[[DataFrame], DataFrame],
    bucket_expr,
    n_buckets: int = 16,
    buckets_per_wave: int = 4,
    layout: str = "parquet",
) -> DataFrame:
    """Per-partition checkpoint + resume.

    ``bucket_expr``: a Column mapping each INPUT row to its bucket in
    [0, n_buckets) — must be deterministic (hash of a stable key).
    ``fn`` must be bucket-local (row's output bucket == input bucket),
    which holds for any per-row/per-group transform keyed within the
    bucket column.

    Missing buckets are processed in WAVES of ``buckets_per_wave`` — each
    wave is one Spark job whose output is appended under ``_bucket=<b>``
    partition dirs and then recorded in the lineage table. A crash (or a
    thrown exception) between waves loses at most one wave; the next call
    reads lineage and recomputes ONLY the still-missing buckets. Set
    ``buckets_per_wave=1`` for strict per-partition granularity,
    ``=n_buckets`` for a single job.

    Atomicity — two layouts behind the same interface:

    - ``layout="parquet"`` (default): the lineage table is the SINGLE
      source of bucket visibility. A crash in the window between a
      wave's parquet append and its lineage append leaves orphan
      ``_bucket=<b>`` dirs; resume deletes every bucket dir NOT recorded
      done before recomputing, so the recompute can never append a
      second copy.
    - ``layout="iceberg"``: each wave is one snapshot commit of an
      :class:`~osm2geojson_spark.plans.iceberg_layout.IcebergLikeTable`
      (manifest + metadata + atomic version-hint swap). Bucket
      visibility IS snapshot membership — a crash anywhere before the
      hint swap leaves invisible orphan files, no sweep needed; resume
      reads committed buckets from manifests (metadata-only). Lineage
      rows are still appended for observability but are not the
      authority."""
    if layout == "iceberg":
        return _run_bucketed_stage_iceberg(
            spark, root, stage, input_df, fn, bucket_expr,
            n_buckets, buckets_per_wave)
    data = _data_path(root, stage)
    done = completed_buckets(spark, root, stage)
    missing = sorted(set(range(n_buckets)) - done)
    if os.path.exists(data):
        for b in missing:
            orphan = os.path.join(data, f"_bucket={b}")
            if os.path.exists(orphan):
                shutil.rmtree(orphan)
    for w in range(0, len(missing), buckets_per_wave):
        wave = [int(b) for b in missing[w:w + buckets_per_wave]]
        t0 = time.perf_counter()
        todo = input_df.withColumn("_bucket", bucket_expr.cast("int")) \
            .filter(F.col("_bucket").isin(wave))
        out = fn(todo)
        if "_bucket" not in out.columns:
            raise ValueError("fn must preserve the _bucket column")
        out.write.mode("append").partitionBy("_bucket").parquet(data)
        wall = int((time.perf_counter() - t0) * 1000)
        written = spark.read.parquet(data).filter(F.col("_bucket").isin(wave))
        counts = {r["_bucket"]: r["n"] for r in
                  written.groupBy("_bucket").agg(F.count("*").alias("n")).collect()}
        now = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        _append_lineage(spark, root, [
            (stage, b, int(counts.get(b, 0)), wall, now, "done") for b in wave
        ])
    return spark.read.parquet(data)


def iceberg_completed_buckets(root: str, stage: str) -> set[int]:
    """Committed buckets from snapshot summaries (metadata-only, no data
    IO). Summaries — not manifest partitions — are the authority so that
    a committed wave whose bucket produced ZERO rows (no data file) still
    counts as done."""
    from osm2geojson_spark.plans.iceberg_layout import IcebergLikeTable

    tbl = IcebergLikeTable(os.path.join(root, stage))
    out: set[int] = set()
    for s in tbl.snapshots():
        out.update(int(b) for b in s.get("summary", {}).get("buckets", []))
    # after expire_snapshots, old summaries are gone but the data files
    # survive in the current snapshot's manifests — recover non-empty
    # buckets from partition values so resume never re-appends them
    out.update(int(dict(p)["_bucket"]) for p in tbl.partitions())
    return out


def _run_bucketed_stage_iceberg(
    spark, root, stage, input_df, fn, bucket_expr,
    n_buckets, buckets_per_wave,
) -> DataFrame:
    from osm2geojson_spark.plans.iceberg_layout import IcebergLikeTable

    tbl = IcebergLikeTable(os.path.join(root, stage))
    done = iceberg_completed_buckets(root, stage)
    missing = sorted(set(range(n_buckets)) - done)
    for w in range(0, len(missing), buckets_per_wave):
        wave = [int(b) for b in missing[w:w + buckets_per_wave]]
        t0 = time.perf_counter()
        todo = input_df.withColumn("_bucket", bucket_expr.cast("int")) \
            .filter(F.col("_bucket").isin(wave))
        out = fn(todo)
        if "_bucket" not in out.columns:
            raise ValueError("fn must preserve the _bucket column")
        tbl.append(out, partition_by="_bucket",
                   summary={"stage": stage, "buckets": wave})
        wall = int((time.perf_counter() - t0) * 1000)
        written = tbl.read(spark).filter(F.col("_bucket").isin(wave))
        counts = {r["_bucket"]: r["n"] for r in
                  written.groupBy("_bucket").agg(F.count("*").alias("n")).collect()}
        now = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        _append_lineage(spark, root, [
            (stage, b, int(counts.get(b, 0)), wall, now, "done") for b in wave
        ])
    return tbl.read(spark)


# ------------------------------------------------------------------ metrics
def write_metrics(spark: SparkSession, root: str, stage: str,
                  metrics: dict[str, float]) -> None:
    """Append one metrics row per key (A2/A3 counters → metrics table,
    replacing LoggingCounter/EnumCounter logs)."""
    now = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    rows = [(stage, k, float(v), now) for k, v in metrics.items()]
    spark.createDataFrame(rows, "stage string, name string, value double, ts string") \
        .coalesce(1).write.mode("append").parquet(os.path.join(root, "_metrics"))


def observe_counts(df: DataFrame, name: str) -> DataFrame:
    """df.observe wrapper: row count + null-free check hook (A2)."""
    return df.observe(name, F.count(F.lit(1)).alias("n_rows"))


def metrics_table(spark: SparkSession, root: str) -> DataFrame:
    p = os.path.join(root, "_metrics")
    if not os.path.exists(p):
        return spark.createDataFrame(
            [], "stage string, name string, value double, ts string")
    return spark.read.parquet(p)
