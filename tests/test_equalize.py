from __future__ import annotations

import numpy as np

from osm2geojson_spark.operators.images import _equalize_px, equalize_images
from osm2geojson_spark.synth.images import decode_ppm


def test_lut_matches_textbook_formula():
    rng_free = np.arange(64, dtype=np.uint8).reshape(8, 8)
    px = np.stack([rng_free] * 3, axis=-1)
    eq = _equalize_px(px)
    # uniform histogram of 64 distinct values: cdf(v) = v+1, cdf_min=1
    want = ((np.arange(64) + 1 - 1) * 255) // 63
    assert (eq[:, :, 0].ravel() == want.astype(np.uint8)).all()


def test_constant_channel_maps_to_zero():
    px = np.full((4, 4, 3), 77, np.uint8)
    assert (_equalize_px(px) == 0).all()


def test_full_range_after_equalization():
    g = (np.arange(256, dtype=np.uint8).reshape(16, 16) // 4) + 100
    px = np.stack([g] * 3, axis=-1)
    eq = _equalize_px(px)
    assert eq.min() == 0 and eq.max() == 255


def test_spark_op_roundtrips_and_quarantines(spark):
    import pandas as pd

    g = np.arange(64, dtype=np.uint8).reshape(8, 8)
    px = np.stack([g, g[::-1], g.T], axis=-1)
    from osm2geojson_spark.synth.images import encode_ppm

    df = spark.createDataFrame(pd.DataFrame({
        "image_id": ["a", "bad"],
        "bytes": [encode_ppm(px), b"nope"],
        "fmt": ["ppm", "ppm"]}))
    rows = {r["image_id"]: r for r in equalize_images(df).collect()}
    assert rows["bad"]["error"] is not None
    out = decode_ppm(bytes(rows["a"]["bytes"]))
    assert (out == _equalize_px(px)).all()
