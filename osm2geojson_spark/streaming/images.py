"""Structured-Streaming twins for the IMAGE payload pipeline — the
ingest-time shape of the north-star job: images land continuously
(parquet file drops), each micro-batch is decoded/validated with the
SAME Arrow kernels as the batch path, quarantined rows split off, and
near-dup suppression runs incrementally with watermark-bounded state.

Design notes (100 TB/day ingest):

- ``validate_stream`` reuses ``operators/images.validate_images``
  verbatim — mapInPandas is stream-capable, so batch/stream parity is
  by construction (and pinned by test_streaming_images).
- ``phash_dedup_stream`` uses ``dropDuplicatesWithinWatermark`` on the
  recomputed phash: state is bounded by the watermark horizon (phashes
  seen in the last N hours), not phashes ever seen — the difference
  between O(day) and O(forever) state at production rates.
- The ingest timestamp is a COLUMN (``ingest_ts``) so replays are
  deterministic in tests; production would stamp it at the source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm2geojson_spark.operators.images import validate_images
from osm2geojson_spark.synth.images import IMG_SCHEMA


def stream_images_from_parquet(
    spark: SparkSession, path: str, max_files_per_trigger: int = 2
) -> DataFrame:
    """File-drop source: each micro-batch picks up at most
    ``max_files_per_trigger`` newly-landed parquet files."""
    return (
        spark.readStream.schema(IMG_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def with_ingest_ts(imgs: DataFrame) -> DataFrame:
    """Deterministic per-image ingest timestamp (seed arithmetic on the
    id) so stream replays and the batch twin see identical event time."""
    seed = F.element_at(F.split(F.col("image_id"), "-"), -1).cast("long")
    return imgs.withColumn(
        "ingest_ts",
        F.timestamp_seconds(F.lit(1_700_000_000) + seed % 7200),
    )


def validate_stream(imgs: DataFrame) -> DataFrame:
    """Streaming decode/validate — the batch operator applied per
    micro-batch (same Arrow kernel, same quarantine columns)."""
    return validate_images(imgs)


def phash_dedup_stream(
    imgs: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Incremental exact-phash dedup at ingest: keep the first-seen row
    per phash with watermark-bounded state. (Near-dup banding on top of
    this uses the batch ``phash_near_dup_pairs`` over the deduped
    output — banding needs a self-join, which streaming defers to the
    periodic batch compaction, the standard lambda split.)"""
    return (
        with_ingest_ts(imgs)
        .withWatermark("ingest_ts", watermark)
        .dropDuplicatesWithinWatermark(["phash"])
    )
