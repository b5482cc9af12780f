"""Baseline JPEG codec (synth/jpeg.py): T.81 structural conformance,
analytic DC-only pins, fidelity floors, restart markers, and the
validate_images integration (PSNR≥40dB on REAL lossy data per
BASELINE.json input_hint; quarantine only for undecodable rows,
mirroring OsmJoin.java:176-179)."""

from __future__ import annotations

import numpy as np
import pytest

from osm2geojson_spark.operators.images import psnr
from osm2geojson_spark.synth.images import gen_pixels
from osm2geojson_spark.synth.jpeg import (
    _BitWriter,
    _canonical_codes,
    _AC_L,
    _DC_L,
    _dht_segment,
    _dqt_segment,
    _QL,
    decode_jpeg,
    encode_jpeg,
)


def _markers(buf: bytes) -> list[int]:
    out, pos = [], 0
    while pos + 2 <= len(buf):
        if buf[pos] != 0xFF:
            break
        m = buf[pos + 1]
        out.append(m)
        if m in (0xD8, 0xD9):
            pos += 2
        else:
            pos += 2 + int.from_bytes(buf[pos + 2:pos + 4], "big")
        if m == 0xDA:
            break
    return out


def test_jfif_structure():
    buf = encode_jpeg(gen_pixels(1, 16, 16))
    ms = _markers(buf)
    assert ms[0] == 0xD8 and ms[1] == 0xE0        # SOI, APP0/JFIF
    assert ms.count(0xDB) == 2 and ms.count(0xC4) == 4
    assert 0xC0 in ms and ms[-1] == 0xDA
    assert buf[-2:] == b"\xff\xd9"
    assert buf[6:11] == b"JFIF\x00"


def test_sof_dimensions_parsed():
    px = gen_pixels(3, 40, 24)
    assert decode_jpeg(encode_jpeg(px, 90, "444")).shape == (24, 40, 3)
    assert decode_jpeg(encode_jpeg(px, 90, "420")).shape == (24, 40, 3)
    # odd (non-multiple-of-8/16) sizes exercise padding + crop
    odd = gen_pixels(9, 17, 23)
    assert decode_jpeg(encode_jpeg(odd, 90, "444")).shape == (23, 17, 3)
    assert decode_jpeg(encode_jpeg(odd, 90, "420")).shape == (23, 17, 3)


def test_solid_color_exact():
    """Flat blocks are DC-only: quantization of a pure-DC block at any
    quality reproduces the level exactly for grays (chroma 128 → zero
    chroma DCT)."""
    for level in (0, 63, 128, 200, 255):
        px = np.full((16, 16, 3), level, np.uint8)
        out = decode_jpeg(encode_jpeg(px, 90, "444"))
        assert np.array_equal(out, px), level
        out = decode_jpeg(encode_jpeg(px, 90, "420"))
        assert np.array_equal(out, px), level


def test_psnr_floors_smooth_content():
    for seed in (42, 100, 321):
        px = gen_pixels(seed, 64, 48)
        assert psnr(px, decode_jpeg(encode_jpeg(px, 90, "444"))) >= 40.0
        assert psnr(px, decode_jpeg(encode_jpeg(px, 95, "444"))) >= 44.0
        # 4:2:0 halves chroma; the synth pattern is deliberately
        # chroma-rich (three independent sinusoids), so the one-pass
        # floor is low — the validate-path invariant (decode → 4:4:4
        # re-encode → ≥40dB) is what ships, asserted in
        # test_synth_rotation_includes_jpg_and_validates
        assert psnr(px, decode_jpeg(encode_jpeg(px, 90, "420"))) >= 26.0


def test_quality_monotone():
    px = gen_pixels(5, 32, 32)
    p = [psnr(px, decode_jpeg(encode_jpeg(px, q, "444")))
         for q in (50, 75, 90, 95)]
    assert p == sorted(p)


def test_restart_markers_roundtrip():
    px = gen_pixels(77, 64, 48)
    for ss in ("444", "420"):
        base = decode_jpeg(encode_jpeg(px, 90, ss))
        for ri in (1, 2, 5):
            rst_buf = encode_jpeg(px, 90, ss, restart_interval=ri)
            assert b"\xff\xdd" in rst_buf          # DRI present
            assert np.array_equal(decode_jpeg(rst_buf), base), (ss, ri)


def test_byte_stuffing_roundtrip():
    """High-frequency content forces 0xFF bytes into the entropy stream
    with near-certainty across seeds; the stuffed stream must decode."""
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    buf = encode_jpeg(px, 90, "444")
    out = decode_jpeg(buf)
    assert out.shape == px.shape
    assert psnr(px, out) >= 25.0


def test_dc_only_grayscale_single_component():
    """Hand-assembled 1-component baseline JPEG (the decoder promotes
    grayscale to 3 channels): one DC-only 8x8 block at level 128+16q."""
    ql = np.maximum((_QL * 20 + 50) // 100, 1)  # quality scale for Q=90
    dc_codes = _canonical_codes(*_DC_L)
    ac_codes = _canonical_codes(*_AC_L)
    qdc = int(ql[0, 0])
    diff = 4  # DC coefficient in quantized units
    bw = _BitWriter()
    s = diff.bit_length()
    code, ln = dc_codes[s]
    bw.write(code, ln)
    bw.write(diff, s)
    code, ln = ac_codes[0x00]  # EOB
    bw.write(code, ln)
    entropy = bw.flush().replace(b"\xff", b"\xff\x00")

    sof = bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big") \
        + bytes([1, 1, 0x11, 0])
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    buf = (b"\xff\xd8"
           + _dqt_segment(0, ql)
           + b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof
           + _dht_segment(0, 0, _DC_L) + _dht_segment(1, 0, _AC_L)
           + b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos
           + entropy + b"\xff\xd9")
    out = decode_jpeg(buf)
    # analytic: pixel = clip(round(diff * q00 * (1/8 DC basis)^2 * 64 / 8 ... ))
    # orthonormal DCT: flat block value = DC_coef / 8; level = 128 + that
    want = int(np.clip(round(128 + diff * qdc / 8.0), 0, 255))
    assert out.shape == (8, 8, 3)
    assert np.array_equal(out, np.full((8, 8, 3), want, np.uint8))


def test_progressive_and_garbage_rejected():
    px = gen_pixels(2, 16, 16)
    buf = bytearray(encode_jpeg(px))
    i = buf.index(b"\xff\xc0")
    buf[i + 1] = 0xC2  # pretend progressive SOF
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(bytes(buf))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8truncated")


def test_synth_rotation_includes_jpg_and_validates(spark):
    """images_table(fmts=FMTS_JPEG) → validate_images: every jpg row
    (both 4:2:0 and 4:4:4 originals present) decodes, matches its stored
    phash, and clears the 40dB re-encode floor — zero quarantined."""
    from osm2geojson_spark.operators.images import validate_images
    from osm2geojson_spark.synth.images import FMTS_JPEG, images_table
    from osm2geojson_spark.synth.jpeg import decode_jpeg as dj

    imgs = images_table(spark, n=100, seed=42, fmts=FMTS_JPEG)
    jrows = imgs.filter("fmt = 'jpg'").collect()
    assert len(jrows) == 20
    # both subsampling variants present among originals
    subs = set()
    for r in jrows:
        buf = bytes(r["bytes"])
        i = buf.index(b"\xff\xc0")
        hv = buf[i + 11]  # first component sampling byte in SOF0
        subs.add({0x11: "444", 0x22: "420"}[hv])
        assert dj(buf).shape == (r["h"], r["w"], 3)
    assert subs == {"444", "420"}

    v = validate_images(imgs)
    bad = v.filter("NOT ok").collect()
    assert bad == [], bad
    jp = v.filter("fmt = 'jpg'").collect()
    assert len(jp) == 20
    assert all(r["phash_match"] and r["psnr_db"] >= 40.0 for r in jp)
