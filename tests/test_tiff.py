"""Baseline TIFF codec (synth/tiff): strips, PackBits, TIFF-flavor LZW
(MSB-first + early change), predictor 2, II/MM — decoder paths pinned
with hand-assembled files the encoder never emits."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from osm2geojson_spark.synth import tiff as T
from osm2geojson_spark.synth.images import gen_pixels


def test_roundtrip_all_modes():
    px = gen_pixels(77, 40, 24)
    for comp in (1, 32773, 5):
        for order in ("II", "MM"):
            buf = T.encode_tiff(px, compression=comp, byte_order=order)
            assert np.array_equal(T.decode_tiff(buf), px), (comp, order)


def test_content_keyed_rotation_covers_all_modes():
    seen = set()
    for seed in range(24):
        buf = T.encode_tiff(gen_pixels(seed, 16, 16))
        comp = {b"II": "<", b"MM": ">"}[buf[:2]]
        seen.add((buf[:2], T.decode_tiff(buf) is not None))
        assert np.array_equal(T.decode_tiff(buf), gen_pixels(seed, 16, 16))
    assert {b for b, _ in seen} == {b"II", b"MM"}


def test_multi_strip_and_non_multiple_height():
    px = gen_pixels(5, 24, 19)  # 19 rows / rps 8 -> strips of 8,8,3
    for comp in (1, 32773, 5):
        buf = T.encode_tiff(px, compression=comp, rows_per_strip=8)
        assert np.array_equal(T.decode_tiff(buf), px)


def test_lzw_early_change_vs_gif():
    # same data, both LZW flavors: streams must differ (bit order +
    # early change) yet each self-roundtrips
    data = bytes(range(256)) * 12  # forces width growth past 9 bits
    t = T._lzw_compress(data)
    assert T._lzw_decompress(t, len(data)) == data
    from osm2geojson_spark.synth import gif as G

    g = G._lzw_compress(data, 8)
    assert g != t
    assert G._lzw_decompress(g, 8) == data


def test_lzw_dictionary_reset():
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, size=40_000, dtype=np.uint8).tobytes()
    assert T._lzw_decompress(T._lzw_compress(data), len(data)) == data


def test_packbits_vectors():
    # spec semantics: literal, run, and the 0x80 noop (decoder-only)
    assert T._packbits_decompress(bytes([0x02, 1, 2, 3]), 3) == b"\x01\x02\x03"
    assert T._packbits_decompress(bytes([0xFE, 7]), 3) == b"\x07\x07\x07"
    assert T._packbits_decompress(bytes([0x80, 0x00, 9]), 1) == b"\x09"
    with pytest.raises(ValueError):
        T._packbits_decompress(bytes([0x02, 1]), 3)
    # compressor roundtrip incl. >128-long runs and literals
    for row in [b"", b"A", b"A" * 300, bytes(range(200)),
                b"AAAABBBZZXYZ" * 40]:
        assert T._packbits_decompress(
            T._packbits_compress(row), len(row)) == row


def test_predictor_differencing_exact():
    px = gen_pixels(11, 32, 8)
    rows = px.reshape(8, 96)
    assert np.array_equal(T._unpredict(T._predict(rows, 3), 3), rows)


def _hand_gray_tiff(gray: np.ndarray, order: str = "MM") -> bytes:
    """Grayscale (photometric 1, spp 1), single uncompressed strip —
    a layout the encoder never writes."""
    e = "<" if order == "II" else ">"
    h, w = gray.shape
    data = gray.tobytes()
    ifd_off = 8 + len(data)
    out = bytearray(struct.pack(e + "2sHI", order.encode(), 42, ifd_off))
    out += data

    def entry(tag, ttype, count, value):
        if ttype == 3 and count == 1:
            packed = struct.pack(e + "H", value) + b"\x00\x00"
        else:
            packed = struct.pack(e + "I", value)
        return struct.pack(e + "HHI", tag, ttype, count) + packed

    entries = [
        entry(256, 4, 1, w), entry(257, 4, 1, h),
        entry(258, 3, 1, 8), entry(259, 3, 1, 1),
        entry(262, 3, 1, 1), entry(273, 4, 1, 8),
        entry(277, 3, 1, 1), entry(278, 4, 1, h),
        entry(279, 4, 1, len(data)),
    ]
    out += struct.pack(e + "H", len(entries))
    out += b"".join(entries)
    out += struct.pack(e + "I", 0)
    return bytes(out)


def test_hand_grayscale_both_orders():
    gray = (np.arange(24, dtype=np.uint8) * 10).reshape(4, 6)
    for order in ("II", "MM"):
        px = T.decode_tiff(_hand_gray_tiff(gray, order))
        assert px.shape == (4, 6, 3)
        assert np.array_equal(px[:, :, 0], gray)
        assert np.array_equal(px[:, :, 1], px[:, :, 2])


def test_decode_errors():
    px = gen_pixels(2, 16, 16)
    buf = bytearray(T.encode_tiff(px, compression=1, byte_order="II"))
    with pytest.raises(ValueError, match="byte-order"):
        T.decode_tiff(b"XX" + bytes(buf[2:]))
    bad_magic = bytearray(buf)
    bad_magic[2] = 43
    with pytest.raises(ValueError, match="magic"):
        T.decode_tiff(bytes(bad_magic))
    with pytest.raises(ValueError):
        T.decode_tiff(bytes(buf[:40]))
    # unsupported photometric (e.g. palette=3) must gate, not garble
    gray = np.zeros((2, 2), dtype=np.uint8)
    hand = bytearray(_hand_gray_tiff(gray, "II"))
    # photometric entry is the 5th: find tag 262 and set value to 3
    n_off = 8 + 4
    (n_entries,) = struct.unpack("<H", hand[n_off:n_off + 2])
    for i in range(n_entries):
        p = n_off + 2 + 12 * i
        tag = struct.unpack("<H", hand[p:p + 2])[0]
        if tag == 262:
            hand[p + 8:p + 10] = struct.pack("<H", 3)
    with pytest.raises(ValueError, match="photometric"):
        T.decode_tiff(bytes(hand))


def test_images_table_tiff_rotation_validates(spark):
    from osm2geojson_spark.operators.images import validate_images
    from osm2geojson_spark.synth.images import FMTS_TIFF, images_table

    imgs = images_table(spark, n=72, seed=42, fmts=FMTS_TIFF)
    v = validate_images(imgs).collect()
    fmts = {r.fmt for r in v}
    assert "tiff" in fmts and len(fmts) == 9
    assert [r for r in v if not r.ok] == []
    assert all(r.psnr_db == float("inf") for r in v if r.fmt == "tiff")
