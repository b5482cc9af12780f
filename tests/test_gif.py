"""GIF codec (synth/gif): LZW both directions incl. width growth and
dictionary reset, interlace, local palettes, transparency/animation
compositing — decoder paths pinned with hand-assembled bitstreams the
encoder never emits."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from osm2geojson_spark.synth import gif as G
from osm2geojson_spark.synth.images import gen_pixels


def _pack_codes(codes_widths) -> bytes:
    acc = nbits = 0
    out = bytearray()
    for code, width in codes_widths:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _hand_gif(w, h, palette, image_blocks, gct=True):
    """Minimal GIF89a from raw parts: palette = list[(r,g,b)] padded to
    a power of two, image_blocks = list of raw byte blocks (descriptors
    + data) appended verbatim."""
    size = max(2, len(palette))
    bits = (size - 1).bit_length()
    size = 1 << bits
    out = bytearray(b"GIF89a")
    flags = (0x80 | (bits - 1)) if gct else 0x00
    out += struct.pack("<HHBBB", w, h, flags, 0, 0)
    if gct:
        pal = list(palette) + [(0, 0, 0)] * (size - len(palette))
        out += bytes(c for rgb in pal for c in rgb)
    for blk in image_blocks:
        out += blk
    out.append(0x3B)
    return bytes(out)


def _image_block(fx, fy, fw, fh, mcs, lzw_data, iflags=0, lct=None):
    out = bytearray(struct.pack("<BHHHHB", 0x2C, fx, fy, fw, fh, iflags))
    if lct:
        size = 1 << ((iflags & 0x7) + 1)
        pal = list(lct) + [(0, 0, 0)] * (size - len(lct))
        out += bytes(c for rgb in pal for c in rgb)
    out.append(mcs)
    for i in range(0, len(lzw_data), 255):
        chunk = lzw_data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


# ------------------------------------------------------------------ LZW

def test_lzw_roundtrip_small():
    for data in [b"", b"\x00", b"abcabcabcabc" * 3, bytes(range(256)) * 2]:
        assert G._lzw_decompress(G._lzw_compress(data, 8), 8) == data


def test_lzw_roundtrip_forces_width_growth_and_reset():
    # >4096 dictionary entries forces 9->12 bit growth AND a mid-stream
    # CLEAR reset in the encoder; decoder must follow both
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, size=60_000, dtype=np.uint8).tobytes()
    assert G._lzw_decompress(G._lzw_compress(data, 8), 8) == data


def test_lzw_kwkwk_hand_stream():
    # 'aaa' with mcs=2: CLEAR(4), 0, then code 6 == next_code (KwKwK)
    stream = _pack_codes([(4, 3), (0, 3), (6, 3), (5, 3)])
    assert G._lzw_decompress(stream, 2) == b"\x00\x00\x00"


def test_lzw_mid_stream_clear_hand():
    # CLEAR, 0, 1, CLEAR, 1, 0, EOI (mcs=2): dictionary must reset
    stream = _pack_codes([(4, 3), (0, 3), (1, 3), (4, 3), (1, 3), (0, 3),
                          (5, 3)])
    assert G._lzw_decompress(stream, 2) == b"\x00\x01\x01\x00"


def test_lzw_bad_code_raises():
    with pytest.raises(ValueError, match="beyond table"):
        G._lzw_decompress(_pack_codes([(4, 3), (0, 3), (7, 3)]), 2)
    with pytest.raises(ValueError, match="truncated"):
        G._lzw_decompress(_pack_codes([(4, 3), (0, 3)])[:1], 2)


# ------------------------------------------------------------------ encoder

def test_encode_decode_quantized_exact():
    px = gen_pixels(123, 32, 24)
    dec = G.decode_gif(G.encode_gif(px))
    # decode == palette expansion of the 3-3-2 quantization, and
    # re-encoding the decoded pixels is byte-identical (idempotent)
    exp = G._palette332()[G._quantize332(px)]
    assert np.array_equal(dec, exp)
    assert G.encode_gif(dec) == G.encode_gif(exp)
    assert np.array_equal(G.decode_gif(G.encode_gif(dec)), dec)


def test_interlaced_roundtrip():
    px = gen_pixels(9, 16, 13)  # odd height exercises pass boundaries
    dec = G.decode_gif(G.encode_gif(px, interlace=True))
    assert np.array_equal(dec, G.decode_gif(G.encode_gif(px)))


def test_signature_and_truncation_errors():
    px = gen_pixels(5, 16, 16)
    buf = G.encode_gif(px)
    with pytest.raises(ValueError, match="signature"):
        G.decode_gif(b"NOTAGIF" + buf)
    with pytest.raises(ValueError):
        G.decode_gif(buf[:20])


# ------------------------------------------------------------- hand decode

def test_local_palette_overrides_global():
    # 2x1: global palette red/blue, local palette green/white; indices 0,1
    lzw = G._lzw_compress(b"\x00\x01", 2)
    blk = _image_block(0, 0, 2, 1, 2, lzw, iflags=0x80 | 0x00,
                       lct=[(0, 255, 0), (255, 255, 255)])
    buf = _hand_gif(2, 1, [(255, 0, 0), (0, 0, 255)], [blk])
    assert G.decode_gif(buf).tolist() == [[[0, 255, 0], [255, 255, 255]]]


def test_gif87a_accepted():
    lzw = G._lzw_compress(b"\x00\x01", 2)
    blk = _image_block(0, 0, 2, 1, 2, lzw)
    buf = bytearray(_hand_gif(2, 1, [(10, 20, 30), (40, 50, 60)], [blk]))
    buf[0:6] = b"GIF87a"
    assert G.decode_gif(bytes(buf)).tolist() == [
        [[10, 20, 30], [40, 50, 60]]]


def test_transparency_composites_over_background():
    # frame 1 paints solid color 1; frame 2 paints color 0 with index 1
    # transparent -> frame 2 shows color 0 only where opaque
    gce = bytes([0x21, 0xF9, 0x04, 0x01, 0x00, 0x00, 0x01, 0x00])
    f1 = _image_block(0, 0, 2, 2, 2, G._lzw_compress(b"\x01" * 4, 2))
    f2 = _image_block(0, 0, 2, 2, 2, G._lzw_compress(b"\x00\x01\x01\x00", 2))
    buf = _hand_gif(2, 2, [(9, 9, 9), (200, 100, 50)], [f1, gce + f2])
    frames = G.decode_gif_frames(buf)
    assert len(frames) == 2
    assert frames[0].tolist() == [[[200, 100, 50]] * 2] * 2
    assert frames[1].tolist() == [
        [[9, 9, 9], [200, 100, 50]],
        [[200, 100, 50], [9, 9, 9]],
    ]


def test_frame_offset_and_disposal_background():
    # 3x3 canvas, bg color 0; frame 1 full white; GCE disposal=2 then a
    # 1x1 frame at (1,1) color 1: frame 2 shows the dot, and a THIRD
    # frame (full transparent) must see the dot region restored to bg
    gce_disp2 = bytes([0x21, 0xF9, 0x04, 0x08, 0x00, 0x00, 0x00, 0x00])
    gce_trans = bytes([0x21, 0xF9, 0x04, 0x01, 0x00, 0x00, 0x00, 0x00])
    f1 = _image_block(0, 0, 3, 3, 2, G._lzw_compress(b"\x02" * 9, 2))
    f2 = _image_block(1, 1, 1, 1, 2, G._lzw_compress(b"\x01", 2))
    f3 = _image_block(0, 0, 3, 3, 2, G._lzw_compress(b"\x00" * 9, 2))
    buf = _hand_gif(3, 3, [(5, 5, 5), (250, 0, 0), (255, 255, 255)],
                    [f1, gce_disp2 + f2, gce_trans + f3])
    frames = G.decode_gif_frames(buf)
    assert frames[1][1, 1].tolist() == [250, 0, 0]
    assert frames[1][0, 0].tolist() == [255, 255, 255]
    # after disposal=2 the dot cell went back to bg color 0
    assert frames[2][1, 1].tolist() == [5, 5, 5]
    assert frames[2][0, 0].tolist() == [255, 255, 255]


def test_frame_exceeds_screen_raises():
    blk = _image_block(2, 0, 2, 1, 2, G._lzw_compress(b"\x00\x01", 2))
    buf = _hand_gif(2, 1, [(1, 1, 1), (2, 2, 2)], [blk])
    with pytest.raises(ValueError, match="exceeds"):
        G.decode_gif(buf)


def test_palette_index_out_of_range_raises():
    blk = _image_block(0, 0, 2, 1, 2, G._lzw_compress(b"\x00\x03", 2))
    buf = _hand_gif(2, 1, [(1, 1, 1), (2, 2, 2)], [blk])
    with pytest.raises(ValueError, match="palette index"):
        G.decode_gif(buf)


# ------------------------------------------------------------------ Spark

def test_images_table_gif_rotation_validates(spark):
    from osm2geojson_spark.operators.images import validate_images
    from osm2geojson_spark.synth.images import FMTS_GIF, images_table

    imgs = images_table(spark, n=64, seed=42, fmts=FMTS_GIF)
    v = validate_images(imgs).collect()
    fmts = {r.fmt for r in v}
    assert "gif" in fmts and len(fmts) == 8
    bad = [r for r in v if not r.ok]
    assert bad == []
    # gif is lossy-by-format but idempotent: PSNR must be inf
    assert all(r.psnr_db == float("inf") for r in v if r.fmt == "gif")
