"""HEIF container (ISO-BMFF item machinery): JPEG-item roundtrip,
decoder paths the encoder never emits (hand-assembled iloc v1 with base
offsets, 32-bit infe v3 ids, multi-item pitm selection), honest
hvc1/av01 codec gates, bounds/ispe validation, and the 7-format
validate_images pipeline."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from osm2geojson_spark.synth.heif import (
    decode_heif,
    encode_avif_gated,
    encode_heif,
    heif_items,
)
from osm2geojson_spark.synth.images import gen_pixels
from osm2geojson_spark.synth.jpeg import decode_jpeg, encode_jpeg
from osm2geojson_spark.synth.mp4 import _box, _full


def test_jpeg_item_roundtrip():
    for seed, w, h in ((42, 32, 24), (7, 16, 16), (99, 64, 40)):
        px = gen_pixels(seed, w, h)
        out = decode_heif(encode_heif(px))
        ref = decode_jpeg(encode_jpeg(px, quality=95, subsampling="444"))
        assert np.array_equal(out, ref)


def test_codec_gates():
    px = gen_pixels(1, 16, 16)
    with pytest.raises(NotImplementedError, match="av1"):
        decode_heif(encode_avif_gated(px))
    with pytest.raises(NotImplementedError, match="hevc"):
        decode_heif(encode_heif(px, item_type=b"hvc1", payload=b"\x00" * 20))


def test_iloc_bounds_and_ispe_checked():
    px = gen_pixels(3, 16, 16)
    buf = bytearray(encode_heif(px))
    items = heif_items(bytes(buf))
    # find the 4-byte big-endian extent length in iloc and inflate it
    ln = items[1]["length"]
    pos = bytes(buf).rfind(struct.pack(">I", ln))
    buf[pos:pos + 4] = struct.pack(">I", ln + 10_000)
    with pytest.raises(ValueError, match="out of bounds"):
        decode_heif(bytes(buf))
    # declared ispe that contradicts the decoded payload is an error
    buf2 = bytearray(encode_heif(px))
    p = bytes(buf2).find(b"ispe") + 8            # 4cc + verflags
    buf2[p:p + 8] = struct.pack(">II", 999, 999)
    with pytest.raises(ValueError, match="ispe"):
        decode_heif(bytes(buf2))


def _handmade_v1_heif(payload: bytes, w: int, h: int) -> bytes:
    """iloc version 1 + base_offset_size 4 + index_size 4, infe version 3
    (32-bit ids), TWO items with pitm choosing the second — none of
    which the encoder emits."""
    ftyp = _box(b"ftyp", b"mif1" + struct.pack(">I", 0) + b"mif1")
    hdlr = _full(b"hdlr", 0, 0,
                 struct.pack(">I", 0) + b"pict" + b"\x00" * 12 + b"x\x00")
    pitm = _full(b"pitm", 1, 0, struct.pack(">I", 7))
    infe_a = _full(b"infe", 3, 0,
                   struct.pack(">IH", 5, 0) + b"hvc1" + b"a\x00")
    infe_b = _full(b"infe", 3, 0,
                   struct.pack(">IH", 7, 0) + b"jpeg" + b"b\x00")
    iinf = _full(b"iinf", 1, 0, struct.pack(">I", 2) + infe_a + infe_b)
    ispe = _full(b"ispe", 0, 0, struct.pack(">II", w, h))
    iprp = _box(b"iprp", _box(b"ipco", ispe))
    body = bytearray()
    body += bytes([0x44, 0x44])                  # off=4, len=4, base=4, idx=4
    body += struct.pack(">H", 2)
    for iid, off in ((5, 0), (7, 0)):            # offsets patched below
        body += struct.pack(">H", iid)
        body += struct.pack(">H", 0)             # construction_method 0
        body += struct.pack(">H", 0)             # data ref
        body += struct.pack(">I", 100)           # base_offset (split!)
        body += struct.pack(">H", 1)             # one extent
        body += struct.pack(">I", 0)             # extent_index (skipped)
        body += struct.pack(">I", off)
        body += struct.pack(">I", len(payload))
    iloc = _full(b"iloc", 1, 0, bytes(body))
    meta = bytearray(_full(b"meta", 0, 0, hdlr + pitm + iinf + iprp + iloc))
    mdat_off = len(ftyp) + len(meta) + 8
    # patch both extent_offsets to mdat_off - base(100).  iloc body
    # layout: sizes(2) + count(2), then 24-byte items of
    # iid(2) method(2) dataref(2) base(4) n_ext(2) idx(4) off(4) len(4)
    iloc_start = len(meta) - len(iloc)
    for k in (0, 1):
        ext_off = iloc_start + 12 + 4 + k * 24 + 16
        meta[ext_off:ext_off + 4] = struct.pack(">I", mdat_off - 100)
    return bytes(ftyp) + bytes(meta) + _box(b"mdat", payload)


def test_handmade_v1_multi_item():
    px = gen_pixels(11, 24, 16)
    payload = encode_jpeg(px, quality=95, subsampling="444")
    buf = _handmade_v1_heif(payload, 24, 16)
    items = heif_items(buf)
    assert items["_primary"] == 7
    assert items[5]["type"] == b"hvc1"
    assert items[7]["type"] == b"jpeg"
    out = decode_heif(buf)
    assert np.array_equal(out, decode_jpeg(payload))


def test_validate_pipeline_seven_formats(spark):
    from pyspark.sql import functions as F

    from osm2geojson_spark.operators.images import validate_images
    from osm2geojson_spark.synth.images import FMTS_HEIF, images_table

    imgs = images_table(spark, n=42, seed=42, fmts=FMTS_HEIF)
    v = validate_images(imgs).cache()
    rows = v.collect()
    assert {r["fmt"] for r in rows} == set(FMTS_HEIF)
    assert all(r["ok"] for r in rows), [r for r in rows if not r["ok"]][:3]
    heif_psnr = [r["psnr_db"] for r in rows if r["fmt"] == "heif"]
    assert all(p >= 40.0 for p in heif_psnr)
    v.unpersist()


def test_avif_rows_quarantine(spark):
    from osm2geojson_spark.operators.images import quarantine_split, validate_images

    px = gen_pixels(5, 16, 16)
    buf = encode_avif_gated(px)
    df = spark.createDataFrame(
        [("i-1", bytearray(buf), 16, 16, "avif", "cap", 0)],
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long")
    ok, bad = quarantine_split(validate_images(df))
    assert ok.count() == 0 and bad.count() == 1
    assert "av1" in bad.first()["error"]
