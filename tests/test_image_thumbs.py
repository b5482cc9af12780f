"""Exact-integer thumbnails, SSE verify, and color histograms."""

from __future__ import annotations

import numpy as np
import pytest

from osm2geojson_spark.operators.images import (
    _thumb_px,
    color_histograms,
    mse_verify_pairs,
    phash_near_dup_pairs,
    thumb_vectors,
)
from osm2geojson_spark.pyref import _thumb_ref
from osm2geojson_spark.synth.images import images_table


@pytest.fixture(scope="module")
def images(spark):
    return images_table(spark, n=24, seed=42).cache()


def test_thumb_kernel_matches_python_route():
    rng = np.random.default_rng(7)
    for h, w in [(16, 16), (24, 40), (9, 13)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert [int(v) for v in _thumb_px(px, 8, 8).reshape(-1)] \
            == _thumb_ref(px, 8, 8)


def test_thumb_rounding_half_up():
    # 2x2 block mean of [0, 1, 1, 1] = 0.75 -> 1; [0, 0, 1, 1] = 0.5 -> 1
    px = np.array([[[0] * 3, [1] * 3], [[1] * 3, [1] * 3]], dtype=np.uint8)
    assert _thumb_px(px, 1, 1)[0, 0, 0] == 1
    px2 = np.array([[[0] * 3, [0] * 3], [[1] * 3, [1] * 3]], dtype=np.uint8)
    assert _thumb_px(px2, 1, 1)[0, 0, 0] == 1


def test_thumb_vectors_schema_and_quarantine(spark, images):
    out = thumb_vectors(images).collect()
    assert len(out) == 24
    assert all(r.error is None and len(r.vec) == 192 for r in out)
    bad = spark.createDataFrame(
        [("x", b"\x00\x01junk", "png")],
        "image_id string, bytes binary, fmt string")
    q = thumb_vectors(bad).collect()
    assert q[0].vec is None and q[0].error


def test_mse_identical_is_zero(spark, images):
    thumbs = thumb_vectors(images)
    first = images.select("image_id").first().image_id
    pairs = spark.createDataFrame(
        [(first, first, 0)], "id_a string, id_b string, hamming int")
    out = mse_verify_pairs(pairs, thumbs).collect()
    assert out[0].sse == 0


def test_mse_verify_filters(spark, images):
    pairs = phash_near_dup_pairs(images, max_hamming=30)
    thumbs = thumb_vectors(images)
    all_rows = mse_verify_pairs(pairs, thumbs).collect()
    if not all_rows:
        pytest.skip("no candidate pairs at this corpus size")
    cut = sorted(r.sse for r in all_rows)[len(all_rows) // 2]
    kept = mse_verify_pairs(pairs, thumbs, max_sse=cut).collect()
    assert kept and all(r.sse <= cut for r in kept)
    assert len(kept) <= len(all_rows)


def test_color_histograms_invariants(images):
    rows = color_histograms(images).collect()
    assert len(rows) == 24
    for r in rows:
        assert r.error is None
        assert 1 <= r.n_bins_used <= 64
        assert 0 <= r.top_bin < 64
        assert 0 < r.top_count <= r.n_px
        # dominant bin holds at least the mean share
        assert r.top_count * r.n_bins_used >= r.n_px


def test_color_histograms_rejects_bad_bins(images):
    with pytest.raises(ValueError):
        color_histograms(images, bins_per_channel=1)
