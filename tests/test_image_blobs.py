"""Blob labeling and border detection on hand-built images."""

import numpy as np

from osm2geojson_spark.operators.images import (
    _label_blobs,
    blob_stats,
    border_margins,
)
from osm2geojson_spark.synth.images import ENCODERS, make_letterboxed_row


def _img_df(spark, rows):
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string")


def _ppm(px):
    return bytearray(ENCODERS["ppm"](np.asarray(px, dtype=np.uint8)))


def test_label_blobs_diagonal_not_connected():
    fg = np.array([[1, 0, 0],
                   [0, 1, 0],
                   [0, 0, 1]], dtype=bool)
    lab = _label_blobs(fg)
    assert len(set(lab[fg])) == 3  # 4-connectivity: diagonals separate


def test_label_blobs_snake_single_component():
    fg = np.array([[1, 1, 1],
                   [0, 0, 1],
                   [1, 1, 1]], dtype=bool)
    lab = _label_blobs(fg)
    assert len(set(lab[fg])) == 1 and lab[fg].min() == 0


def test_blob_stats_counts_and_fingerprint(spark):
    # 4x4: a 2x2 bright square + one isolated bright pixel; rest dark
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    px[0:2, 0:2] = 255
    px[3, 3] = 255
    out = blob_stats(_img_df(spark, [("a", _ppm(px), "ppm")]),
                     luma_threshold=128).collect()[0]
    assert (out.n_fg, out.n_blobs, out.max_blob, out.blob_sq_sum) == \
        (5, 2, 4, 17)
    assert out.ok and out.error is None


def test_blob_stats_empty_and_full(spark):
    dark = np.zeros((3, 3, 3), dtype=np.uint8)
    bright = np.full((3, 3, 3), 255, dtype=np.uint8)
    rows = [("d", _ppm(dark), "ppm"), ("b", _ppm(bright), "ppm")]
    got = {r.image_id: r for r in blob_stats(_img_df(spark, rows)).collect()}
    assert (got["d"].n_fg, got["d"].n_blobs) == (0, 0)
    assert (got["b"].n_fg, got["b"].n_blobs, got["b"].max_blob,
            got["b"].blob_sq_sum) == (9, 1, 9, 81)


def test_border_margins_planted_bars(spark):
    # 8x10 with top=1, bottom=2, left=3, right=0 black bars around a
    # non-uniform interior
    px = np.zeros((8, 10, 3), dtype=np.uint8)
    inner = np.arange(5 * 7 * 3, dtype=np.uint8).reshape(5, 7, 3) + 1
    px[1:6, 3:10] = inner
    r = border_margins(_img_df(spark, [("x", _ppm(px), "ppm")])).collect()[0]
    assert (r.top, r.bottom, r.left_m, r.right_m) == (1, 2, 3, 0)
    assert (r.content_w, r.content_h) == (7, 5)


def test_border_margins_no_bars(spark):
    px = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    r = border_margins(_img_df(spark, [("x", _ppm(px), "ppm")])).collect()[0]
    assert (r.top, r.bottom, r.left_m, r.right_m) == (0, 0, 0, 0)
    assert (r.content_w, r.content_h) == (4, 4)


def test_border_margins_uniform_image(spark):
    px = np.full((5, 6, 3), 9, dtype=np.uint8)
    r = border_margins(_img_df(spark, [("x", _ppm(px), "ppm")])).collect()[0]
    # fully-bar image: top run consumes everything, opposite sides 0
    assert (r.top, r.bottom, r.left_m, r.right_m) == (5, 0, 6, 0)
    assert (r.content_w, r.content_h) == (0, 0)


def test_letterboxed_rows_recover_planted_margins(spark):
    # the synth corpus plants (s%4, (s//4)%4, (s//16)%4, (s//64)%4)
    rows = []
    for i in range(24):
        seed = i * 2 + 42
        image_id, buf, w, h, fmt, _c, _p, _lo, _la = \
            make_letterboxed_row(seed)
        rows.append((image_id, bytearray(buf), fmt, seed))
    df = _img_df(spark, [(a, b, c) for a, b, c, _ in rows])
    got = {r.image_id: r for r in border_margins(df).collect()}
    for image_id, _buf, _fmt, seed in rows:
        s = seed >> 1
        want = (s % 4, (s // 4) % 4, (s // 16) % 4, (s // 64) % 4)
        r = got[image_id]
        assert (r.top, r.bottom, r.left_m, r.right_m) == want, image_id
