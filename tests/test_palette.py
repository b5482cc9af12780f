"""Median-cut palette quantization (operators/images.palette_quantize).

Pins (1) a hand-checkable two-cluster image (palette = the two
cluster means, split on the widest channel), (2) engine == pyref twin
on a real-codec corpus slice, (3) the unsplittable constant image
(fewer boxes than k), (4) decode-failure quarantine, (5) the guard."""

import numpy as np
import pytest

from osm2geojson_spark.operators.images import palette_quantize
from osm2geojson_spark.synth.images import encode_ppm


def _img_df(spark, rows):
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string")


def test_two_cluster_image(spark):
    # left half ~dark red, right half ~bright blue → k=2 splits them
    px = np.zeros((4, 8, 3), dtype=np.uint8)
    px[:, :4] = (40, 10, 10)
    px[:, 4:] = (10, 10, 200)
    px[0, 0] = (44, 10, 10)   # wiggle inside the red cluster
    px[3, 7] = (10, 10, 204)  # and the blue one
    df = _img_df(spark, [("a", encode_ppm(px), "ppm")])
    rows = sorted((r["color_idx"], r["r"], r["g"], r["b"], r["n_px"])
                  for r in palette_quantize(df, 2).collect())
    red = (40 * 15 + 44) // 16
    blue = (200 * 15 + 204) // 16
    assert rows == [(0, 10, 10, blue, 16), (1, red, 10, 10, 16)]


def test_constant_image_unsplittable(spark):
    px = np.full((4, 4, 3), 77, dtype=np.uint8)
    df = _img_df(spark, [("c", encode_ppm(px), "ppm")])
    rows = palette_quantize(df, 8).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["r"], r["g"], r["b"], r["n_px"]) == (77, 77, 77, 16)


def test_matches_pyref_twin(spark):
    from osm2geojson_spark import pyref
    from osm2geojson_spark.synth.images import FMTS_TIFF, images_table

    imgs = images_table(spark, n=24, seed=9, fmts=FMTS_TIFF)
    got = sorted(
        (r["image_id"], r["fmt"], r["color_idx"], r["r"], r["g"],
         r["b"], r["n_px"])
        for r in palette_quantize(imgs, 8).collect())
    assert got == sorted(pyref.ref_palette(n=24, seed=9, k=8))


def test_quarantine_and_guard(spark):
    df = _img_df(spark, [("bad", b"\x00\x01garbage", "png")])
    rows = palette_quantize(df, 4).collect()
    assert len(rows) == 1 and rows[0]["color_idx"] == -1
    assert rows[0]["error"]
    with pytest.raises(ValueError):
        palette_quantize(df, 1)
