"""VP8L lossless WebP codec (synth/webp.py): RIFF structure, lossless
round trips over the encoder option matrix, and hand-assembled
bitstreams covering the decoder paths our encoder never emits
(PREDICTOR and cross-COLOR transforms, COLOR-INDEXING with packed
indices, the 2D LZ77 distance map, two-symbol simple codes)."""

from __future__ import annotations

import numpy as np
import pytest

from osm2geojson_spark.synth.images import gen_pixels
from osm2geojson_spark.synth.webp import (
    _BitWriter,
    _write_image_stream,
    _write_prefix_code,
    canonical_codes,
    decode_webp,
    encode_webp,
)


def _wrap_vp8l(bw: _BitWriter) -> bytes:
    payload = b"\x2f" + bw.bytes()
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) % 2:
        chunk += b"\x00"
    body = b"WEBP" + chunk
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _header(bw: _BitWriter, w: int, h: int):
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)


def _argb(px: np.ndarray) -> np.ndarray:
    p = px.astype(np.uint32)
    return ((np.uint32(0xFF) << np.uint32(24)) | (p[..., 0] << np.uint32(16))
            | (p[..., 1] << np.uint32(8)) | p[..., 2]).reshape(-1)


def test_riff_structure():
    buf = encode_webp(gen_pixels(1, 16, 16))
    assert buf[:4] == b"RIFF" and buf[8:12] == b"WEBP"
    assert buf[12:16] == b"VP8L" and buf[20] == 0x2F
    assert int.from_bytes(buf[4:8], "little") == len(buf) - 8


def test_roundtrip_option_matrix():
    for (w, h) in [(8, 8), (16, 24), (33, 17)]:
        for cb in (0, 6):
            for sg in (False, True):
                for rle in (False, True):
                    px = gen_pixels(11, w, h)
                    buf = encode_webp(px, cache_bits=cb, rle=rle,
                                      subtract_green=sg)
                    assert np.array_equal(decode_webp(buf), px), \
                        (w, h, cb, sg, rle)


def test_roundtrip_solid_noise_stripes():
    solid = np.full((32, 32, 3), 77, np.uint8)
    assert np.array_equal(decode_webp(encode_webp(solid)), solid)
    rng = np.random.default_rng(0)
    noise = rng.integers(0, 256, (31, 29, 3), np.uint8)
    assert np.array_equal(decode_webp(encode_webp(noise)), noise)
    stripes = np.repeat(np.arange(16, dtype=np.uint8) * 16, 64) \
        .reshape(16, 64)[:, :, None].repeat(3, 2)
    assert np.array_equal(decode_webp(encode_webp(stripes)), stripes)


def test_garbage_rejected():
    with pytest.raises(ValueError):
        decode_webp(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError):
        decode_webp(b"\x00" * 40)
    buf = bytearray(encode_webp(gen_pixels(2, 8, 8)))
    buf[20] = 0x30  # bad VP8L signature
    with pytest.raises(ValueError, match="signature"):
        decode_webp(bytes(buf))


def test_lossy_vp8_rejected():
    fake = (b"RIFF" + (20).to_bytes(4, "little") + b"WEBP"
            + b"VP8 " + (8).to_bytes(4, "little") + b"\x00" * 8)
    with pytest.raises(ValueError, match="lossy"):
        decode_webp(fake)


def test_predictor_transform_decodes():
    """PREDICTOR with mode 2 (=T) over one 4x4 block. Residuals computed
    INDEPENDENTLY here from the spec's edge rules (first px: +0xFF000000;
    first row: L; first col: T; else mode)."""
    w = h = 4
    px = gen_pixels(21, w, h)
    argb = _argb(px).reshape(h, w)

    res = np.zeros((h, w), dtype=np.uint32)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(argb[0, x - 1])
            elif x == 0:
                pred = int(argb[y - 1, 0])
            else:
                pred = int(argb[y - 1, x])  # mode 2 = T
            v = 0
            for s in (24, 16, 8, 0):
                v |= (((int(argb[y, x]) >> s) - (pred >> s)) & 0xFF) << s
            res[y, x] = v

    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)            # transform present
    bw.write(0, 2)            # PREDICTOR
    bw.write(0, 3)            # size_bits = 2 → 4x4 blocks → 1x1 subimage
    sub = np.array([0xFF000200], dtype=np.uint32)  # green channel = mode 2
    _write_image_stream(bw, sub, 1, 1, is_level0=False)
    bw.write(0, 1)            # no more transforms
    _write_image_stream(bw, res.reshape(-1), w, h, is_level0=True,
                        subtract_green=False, rle=False,
                        transform_terminator=False)
    out = decode_webp(_wrap_vp8l(bw))
    assert np.array_equal(out, px)


def test_cross_color_transform_decodes():
    """Cross-color with green_to_red=16, green_to_blue=8, red_to_blue=4
    over one block; forward transform computed independently from the
    spec's ColorTransformDelta (signed-int8 multiply, >>5)."""
    w = h = 4
    px = gen_pixels(33, w, h)
    argb = _argb(px)

    def ctd(t, c):
        t8 = t - 256 if t >= 128 else t
        c8 = c - 256 if c >= 128 else c
        return (t8 * c8) >> 5

    g2r, g2b, r2b = 16, 8, 4
    fwd = np.zeros_like(argb)
    for i, v in enumerate(argb.tolist()):
        a = (v >> 24) & 0xFF
        r = (v >> 16) & 0xFF
        g = (v >> 8) & 0xFF
        b = v & 0xFF
        # decoder restores r += ctd(g2r,g) FIRST, then
        # b += ctd(g2b,g) + ctd(r2b, restored_r) — so the forward pass
        # subtracts ctd(r2b, ORIGINAL r)
        new_r = (r - ctd(g2r, g)) & 0xFF
        new_b = (b - ctd(g2b, g) - ctd(r2b, r)) & 0xFF
        fwd[i] = (a << 24) | (new_r << 16) | (g << 8) | new_b

    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(1, 2)            # COLOR transform
    bw.write(0, 3)            # size_bits = 2 → 1x1 subimage
    elem = np.array([(r2b << 16) | (g2b << 8) | g2r], dtype=np.uint32)
    _write_image_stream(bw, elem, 1, 1, is_level0=False)
    bw.write(0, 1)
    _write_image_stream(bw, fwd, w, h, is_level0=True,
                        subtract_green=False, rle=False,
                        transform_terminator=False)
    out = decode_webp(_wrap_vp8l(bw))
    assert np.array_equal(out, px)


def test_color_indexing_packed_decodes():
    """4-color palette → width_bits=2 → four 2-bit indices per green
    byte; palette entries delta-coded."""
    w, h = 8, 3
    palette = [0xFF102030, 0xFF405060, 0xFF708090, 0xFFA0B0C0]
    idx = np.array([[0, 1, 2, 3, 3, 2, 1, 0],
                    [1, 1, 1, 1, 2, 2, 2, 2],
                    [3, 0, 3, 0, 3, 0, 3, 0]], dtype=np.int64)

    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(3, 2)            # COLOR_INDEXING
    bw.write(3, 8)            # n_colors - 1
    deltas = []
    prev = 0
    for c in palette:
        d = 0
        for s in (24, 16, 8, 0):
            d |= (((c >> s) - (prev >> s)) & 0xFF) << s
        deltas.append(d)
        prev = c
    _write_image_stream(bw, np.array(deltas, dtype=np.uint32), 4, 1,
                        is_level0=False)
    bw.write(0, 1)
    packed_w = 2              # ceil(8 / 4) indices per byte
    packed = np.zeros(packed_w * h, dtype=np.uint32)
    for y in range(h):
        for xp in range(packed_w):
            g = 0
            for k in range(4):
                g |= int(idx[y, xp * 4 + k]) << (2 * k)
            packed[y * packed_w + xp] = 0xFF000000 | (g << 8)
    _write_image_stream(bw, packed, packed_w, h, is_level0=True,
                        subtract_green=False, rle=False,
                        transform_terminator=False)
    out = decode_webp(_wrap_vp8l(bw))
    want = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            c = palette[idx[y, x]]
            want[y, x] = [(c >> 16) & 0xFF, (c >> 8) & 0xFF, c & 0xFF]
    assert np.array_equal(out, want)


def test_lz77_2d_distance_map():
    """Copy with distance CODE 1 = (dx=0, dy=1) → dist = row width:
    second row duplicates the first."""
    w, h = 4, 2
    row = [0xFF010203, 0xFF040506, 0xFF070809, 0xFF0A0B0C]

    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)            # no transforms
    bw.write(0, 1)            # no color cache
    bw.write(0, 1)            # no entropy image
    # green code: 4 literal greens + length-symbol 256+2 (value 4 needs
    # sym 3: _lz77 sym for 4 is 3 → alphabet symbol 259)
    gl = [0] * 280
    for v in row:
        gl[(v >> 8) & 0xFF] = 3
    gl[259] = 3
    # pad to completeness with dummy literals
    free = [s for s in range(256) if gl[s] == 0]
    k = 5
    for s in free:
        if k >= 8:
            break
        gl[s] = 3
        k += 1
    # now 8 symbols at length 3 → kraft 8/8 = 1
    assert sum(2.0 ** -l for l in gl if l) == 1.0
    _write_prefix_code(bw, gl)
    ch_lengths = []
    for chan_shift in (16, 0, 24):
        cl = [0] * 256
        used = sorted({(v >> chan_shift) & 0xFF for v in row})
        bits = max(1, (len(used) - 1).bit_length())
        long_cnt = 2 * len(used) - (1 << bits)
        for i, s in enumerate(used):
            cl[s] = bits if i < long_cnt or long_cnt == 0 else bits - 1
        if len(used) == 1:
            cl[used[0]] = 1
        _write_prefix_code(bw, cl)
        ch_lengths.append(cl)
    dl = [0] * 40
    dl[0] = 1                 # single sym 0 → value 1 → map (0,1) → dist=w
    _write_prefix_code(bw, dl)

    gc = canonical_codes(gl)
    chans = [canonical_codes(c) for c in ch_lengths]
    for v in row:
        code, ln = gc[(v >> 8) & 0xFF]
        bw.write_code(code, ln)
        for codes, shift in zip(chans, (16, 0, 24)):
            if len(codes) == 1:
                continue
            c2, l2 = codes[(v >> shift) & 0xFF]
            bw.write_code(c2, l2)
    code, ln = gc[259]
    bw.write_code(code, ln)    # length sym 3 → value 4, no extra bits
    # distance: single-symbol code reads 0 bits → value 1 → (0,1) → w
    out = decode_webp(_wrap_vp8l(bw))
    want = np.zeros((h, w, 3), dtype=np.uint8)
    for x, v in enumerate(row):
        want[0, x] = [(v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF]
    want[1] = want[0]
    assert np.array_equal(out, want)


def test_two_symbol_simple_code():
    """A 2-color image round-trips through 2-symbol simple codes (the
    encoder picks them automatically for tiny alphabets)."""
    px = np.zeros((6, 6, 3), dtype=np.uint8)
    px[::2] = [10, 20, 30]
    px[1::2] = [200, 210, 220]
    assert np.array_equal(decode_webp(encode_webp(px, rle=False,
                                                  subtract_green=False)), px)


def test_max_dimension_guard():
    with pytest.raises(ValueError, match="16384"):
        encode_webp(np.zeros((1, 1 << 15, 3), dtype=np.uint8))
