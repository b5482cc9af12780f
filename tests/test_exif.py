"""Exif APP1 builder/parser (synth/exif.py) + the extract_exif /
normalize_orientation operators. Hand-assembled TIFF vectors pin parser
paths the builder never emits (deg/min/sec rationals, unknown tags and
types, malformed blobs)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from osm2geojson_spark.operators.images import apply_orientation
from osm2geojson_spark.synth.exif import (
    EXIF_MAGIC,
    attach_exif_app1,
    build_exif,
    exif_fields_for,
    find_exif_in_jpeg,
    parse_exif,
)
from osm2geojson_spark.synth.images import gen_pixels, phash64


class TestRoundtrip:
    @pytest.mark.parametrize("seed", [42, 44, 46, 48, 900, 1336])
    def test_fields_exact(self, seed):
        f = exif_fields_for(seed, 24, 40)
        assert parse_exif(build_exif(**f)) == f

    def test_both_byte_orders_differ_in_bytes(self):
        f = exif_fields_for(42, 16, 16)
        ii = build_exif(**{**f, "byte_order": "II"})
        mm = build_exif(**{**f, "byte_order": "MM"})
        assert ii != mm
        assert parse_exif(ii) == {**f, "byte_order": "II"}
        assert parse_exif(mm) == {**f, "byte_order": "MM"}

    def test_negative_coords_use_s_w_refs(self):
        f = {**exif_fields_for(42, 8, 8),
             "lat_udeg": -12_345_678, "lon_udeg": -170_000_001}
        blob = build_exif(**f)
        assert b"S" in blob and b"W" in blob
        got = parse_exif(blob)
        assert got["lat_udeg"] == -12_345_678
        assert got["lon_udeg"] == -170_000_001


def _mm_ifd_vector() -> bytes:
    """Hand-built big-endian TIFF the builder never produces:
    deg/min/sec GPS rationals, an unknown tag, an unknown TYPE, and an
    out-of-line ASCII value placed AFTER the GPS IFD."""
    e = ">"
    # layout plan: IFD0 @ 8 with 3 entries; GPS IFD follows; data last
    ifd0_off = 8
    ifd0_size = 2 + 12 * 3 + 4
    gps_off = ifd0_off + ifd0_size
    gps_size = 2 + 12 * 3 + 4
    data_off = gps_off + gps_size

    make = b"HandCam\x00"          # 8 bytes, out-of-line
    lat = [(40, 1), (26, 1), (46, 2)]   # 40° 26' 23" -> 40.439722..
    lat_bytes = b"".join(struct.pack(e + "II", n, d) for n, d in lat)

    ifd0 = struct.pack(e + "H", 3)
    ifd0 += struct.pack(e + "HHI", 0x010F, 2, len(make)) \
        + struct.pack(e + "I", data_off)                    # Make
    ifd0 += struct.pack(e + "HHI", 0x0112, 3, 1) + struct.pack(e + "H", 6) + b"\x00\x00"
    ifd0 += struct.pack(e + "HHI", 0x8825, 4, 1) + struct.pack(e + "I", gps_off)
    ifd0 += struct.pack(e + "I", 0)

    gps = struct.pack(e + "H", 3)
    gps += struct.pack(e + "HHI", 0x0001, 2, 2) + b"N\x00\x00\x00"
    gps += struct.pack(e + "HHI", 0x0002, 5, 3) \
        + struct.pack(e + "I", data_off + len(make))        # rationals
    gps += struct.pack(e + "HHI", 0x9999, 99, 1) + b"\x00" * 4  # unknown type
    gps += struct.pack(e + "I", 0)

    tiff = b"MM" + struct.pack(e + "H", 42) + struct.pack(e + "I", 8)
    tiff += ifd0 + gps + make + lat_bytes
    return EXIF_MAGIC + tiff


class TestHandVectors:
    def test_mm_dms_rationals_and_unknowns(self):
        got = parse_exif(_mm_ifd_vector())
        assert got["byte_order"] == "MM"
        assert got["make"] == "HandCam"
        assert got["orientation"] == 6
        # 40 + 26/60 + 23/3600 degrees, correctly rounded to microdeg
        assert got["lat_udeg"] == round((40 + 26 / 60 + 23 / 3600) * 1e6)
        assert "lon_udeg" not in got      # absent tag stays absent

    def test_bad_magic(self):
        with pytest.raises(ValueError, match="byte order"):
            parse_exif(b"Exif\x00\x00XX" + b"\x00" * 16)
        with pytest.raises(ValueError):
            parse_exif(b"NotExif" + b"\x00" * 16)

    def test_truncated_ifd(self):
        blob = build_exif(**exif_fields_for(42, 8, 8))
        with pytest.raises(ValueError):
            parse_exif(blob[:20])

    def test_out_of_bounds_value_offset(self):
        e = "<"
        ifd = struct.pack(e + "H", 1)
        ifd += struct.pack(e + "HHI", 0x010F, 2, 64) \
            + struct.pack(e + "I", 10_000)    # points past the blob
        ifd += struct.pack(e + "I", 0)
        tiff = b"II" + struct.pack(e + "H", 42) + struct.pack(e + "I", 8) + ifd
        with pytest.raises(ValueError, match="out of bounds"):
            parse_exif(EXIF_MAGIC + tiff)


class TestOrientation:
    def test_group_properties(self):
        px = gen_pixels(5, 24, 16)
        for o in (2, 3, 4, 5, 7):     # self-inverse transforms
            assert (apply_orientation(apply_orientation(px, o), o) == px).all()
        assert (apply_orientation(apply_orientation(px, 6), 8) == px).all()
        assert (apply_orientation(apply_orientation(px, 8), 6) == px).all()
        for o in (5, 6, 7, 8):        # transposing orientations swap dims
            assert apply_orientation(px, o).shape == (24, 16, 3)
        with pytest.raises(ValueError):
            apply_orientation(px, 9)


class TestSparkOperators:
    def test_extract_matches_seed_formula(self, spark):
        from osm2geojson_spark.operators.images import extract_exif
        from osm2geojson_spark.synth.images import images_table

        imgs = images_table(spark, n=60, seed=42, fmts=("jpg", "png"),
                            exif=True)
        rows = {r["image_id"]: r for r in extract_exif(imgs).collect()}
        assert len(rows) == 60
        n_exif = 0
        for i in range(60):
            seed = i * 2 + 42
            r = rows[f"img-{seed:012d}"]
            fmt = ("jpg", "png")[(seed >> 1) % 2]
            assert r["error"] is None
            if fmt != "jpg" or seed % 5 == 2:
                assert not r["has_exif"] and r["orientation"] is None
                continue
            n_exif += 1
            f = exif_fields_for(seed, 16 + 8 * (seed % 7),
                                16 + 8 * ((seed // 7) % 7))
            assert (r["orientation"], r["make"], r["model"], r["dt"],
                    r["byte_order"], r["lat_udeg"], r["lon_udeg"],
                    r["px_w"], r["px_h"]) == (
                f["orientation"], f["make"], f["model"], f["datetime"],
                f["byte_order"], f["lat_udeg"], f["lon_udeg"],
                f["px_w"], f["px_h"])
        assert n_exif > 10

    def test_normalize_orientation_upright_phash(self, spark):
        from osm2geojson_spark.operators.images import normalize_orientation
        from osm2geojson_spark.synth.jpeg import decode_jpeg, encode_jpeg

        inverse = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 8, 7: 7, 8: 6}
        base = gen_pixels(11, 32, 24)
        rows, want = [], {}
        for o in range(1, 9):
            stored = apply_orientation(base, inverse[o])  # as-captured
            buf = encode_jpeg(stored, quality=95, subsampling="444")
            f = {**exif_fields_for(100 + o, stored.shape[1], stored.shape[0]),
                 "orientation": o}
            buf = attach_exif_app1(buf, build_exif(**f))
            rows.append((f"o{o}", bytearray(buf), "jpg"))
            # independent expectation: decode what was stored, then
            # apply o — phash on the uprighted lossy pixels
            want[f"o{o}"] = phash64(
                apply_orientation(decode_jpeg(bytes(buf)), o))
        df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
        got = {r["image_id"]: r for r in normalize_orientation(df).collect()}
        for o in range(1, 9):
            r = got[f"o{o}"]
            assert r["error"] is None
            assert (r["w"], r["h"]) == (32, 24), o      # always upright dims
            assert r["rotated"] == (o != 1)
            assert r["upright_phash"] == want[f"o{o}"], o


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
