"""Streaming video-pipeline twins (streaming/video.py): availableNow
runs over file-dropped clip parquet must equal their batch twins."""

from __future__ import annotations

import pytest

from osm2geojson_spark.operators.video import (
    scene_cuts,
    shot_signatures,
    video_dup_pairs,
)
from osm2geojson_spark.streaming.events import run_stream_to_memory
from osm2geojson_spark.streaming.video import (
    scene_cut_stream,
    shot_dedup_stream,
    shot_signature_stream,
    stream_videos_from_parquet,
)
from osm2geojson_spark.synth.video import shotpool_video_table


@pytest.fixture(scope="module")
def vid_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("vidstream") / "clips")
    shotpool_video_table(spark, n=60, seed=0).repartition(6) \
        .write.parquet(d)
    return d


def test_shot_signature_stream_equals_batch(spark, vid_dir):
    stream = shot_signature_stream(stream_videos_from_parquet(spark, vid_dir))
    run_stream_to_memory(stream, "shots_stream", output_mode="append")
    got = {(r["media_id"], r["shot_idx"]): (r["start_frame"], r["phash"])
           for r in spark.table("shots_stream").collect()}
    want = {(r["media_id"], r["shot_idx"]): (r["start_frame"], r["phash"])
            for r in shot_signatures(spark.read.parquet(vid_dir)).collect()}
    assert got == want and len(got) == 240


def test_scene_cut_stream_equals_batch(spark, vid_dir):
    stream = scene_cut_stream(stream_videos_from_parquet(spark, vid_dir))
    run_stream_to_memory(stream, "cuts_stream", output_mode="append")
    got = sorted((r["media_id"], r["cut_at"], r["d2"])
                 for r in spark.table("cuts_stream").collect())
    want = sorted((r["media_id"], r["cut_at"], r["d2"])
                  for r in scene_cuts(spark.read.parquet(vid_dir)).collect())
    assert got == want


def test_shot_dedup_stream_equals_batch(spark, vid_dir, tmp_path):
    store = str(tmp_path / "sigstore")
    pairs = str(tmp_path / "pairs")
    q = shot_dedup_stream(spark, stream_videos_from_parquet(spark, vid_dir),
                          store, pairs, min_shared=2)
    q.awaitTermination()
    got = {(r["id_a"], r["id_b"]): (r["shared"], r["jaccard_ppm"])
           for r in spark.read.parquet(pairs).collect()}
    batch = video_dup_pairs(
        shot_signatures(spark.read.parquet(vid_dir)), min_shared=2)
    want = {(r["id_a"], r["id_b"]): (r["shared"], r["jaccard_ppm"])
            for r in batch.collect()}
    assert got == want and len(got) > 0
    # every pair emitted exactly once across micro-batches
    assert spark.read.parquet(pairs).count() == len(got)
