"""Streaming image-pipeline twins (streaming/images.py): each streaming
operator's availableNow run over file-dropped parquet must equal its
batch twin on the same rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm2geojson_spark.operators.images import validate_images
from osm2geojson_spark.streaming.events import run_stream_to_memory
from osm2geojson_spark.streaming.images import (
    phash_dedup_stream,
    stream_images_from_parquet,
    validate_stream,
    with_ingest_ts,
)
from osm2geojson_spark.synth.images import FMTS_JPEG, images_table


@pytest.fixture(scope="module")
def img_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("imgstream") / "imgs")
    # several files so maxFilesPerTrigger yields multiple micro-batches;
    # include jpg so the real JPEG decoder runs inside the stream
    images_table(spark, n=120, seed=42, fmts=FMTS_JPEG) \
        .repartition(6).write.parquet(d)
    return d


def test_validate_stream_equals_batch(spark, img_dir):
    stream = validate_stream(stream_images_from_parquet(spark, img_dir))
    run_stream_to_memory(stream, "val_stream", output_mode="append")
    got = {r["image_id"]: r for r in spark.table("val_stream").collect()}
    want = {r["image_id"]: r
            for r in validate_images(spark.read.parquet(img_dir)).collect()}
    assert got.keys() == want.keys() and len(got) == 120
    for k in want:
        assert (got[k]["ok"], got[k]["error"], got[k]["psnr_db"],
                got[k]["phash_match"]) == (
            want[k]["ok"], want[k]["error"], want[k]["psnr_db"],
            want[k]["phash_match"]), k
    # multiple micro-batches actually happened (6 files, 2 per trigger)
    assert all(r["ok"] for r in got.values())


def test_phash_dedup_stream_equals_batch_first_seen(spark, img_dir):
    base = spark.read.parquet(img_dir)
    # plant exact duplicates: same phash, later ingest_ts, distinct id
    dupes = base.limit(10).withColumn(
        "image_id", F.concat(F.lit("dup-"), F.col("image_id")))
    d2 = img_dir + "_withdupes"
    base.unionAll(dupes).repartition(5).write.parquet(d2)

    stream = phash_dedup_stream(stream_images_from_parquet(spark, d2))
    run_stream_to_memory(stream, "dedup_stream", output_mode="append")
    got = spark.table("dedup_stream")

    # exactly one survivor per phash, none lost
    n_phash = base.unionAll(dupes).select("phash").distinct().count()
    assert got.count() == n_phash
    assert got.select("phash").distinct().count() == n_phash
    # batch twin: one row per phash — same key set
    batch_keys = {r["phash"] for r in
                  spark.read.parquet(d2).dropDuplicates(["phash"]).collect()}
    assert {r["phash"] for r in got.collect()} == batch_keys


def test_ingest_ts_deterministic(spark, img_dir):
    a = with_ingest_ts(spark.read.parquet(img_dir)).select("image_id", "ingest_ts")
    b = with_ingest_ts(spark.read.parquet(img_dir)).select("image_id", "ingest_ts")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_mosaic_stream_equals_batch(spark, img_dir, tmp_path):
    from osm2geojson_spark.operators.images import geo_mosaic
    from osm2geojson_spark.streaming.images import (
        mosaic_from_state,
        mosaic_stream,
    )

    state = str(tmp_path / "mosaic_state")
    mosaic_stream(
        spark, stream_images_from_parquet(spark, img_dir), state,
        world_px=1024, tile=128, thumb=16)
    got = {(r["tx"], r["ty"]): (r["n_contrib"], r["md5"])
           for r in mosaic_from_state(spark, state, tile=128).collect()}
    want = {(r["tx"], r["ty"]): (r["n_contrib"], r["md5"])
            for r in geo_mosaic(spark.read.parquet(img_dir),
                                world_px=1024, tile=128,
                                thumb=16).collect()}
    assert got == want and len(got) > 5
