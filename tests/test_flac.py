"""FLAC codec (synth/flac.py): lossless round trips over every encoder
path, CRC enforcement, and hand-assembled frames covering the decoder
paths our encoder never emits (LPC, 5-bit Rice, raw-bits escape,
stereo left/side + mid/side decorrelation)."""

from __future__ import annotations

import numpy as np
import pytest

from osm2geojson_spark.synth.audio import gen_samples
from osm2geojson_spark.synth.flac import (
    _BLOCK,
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_coded,
    decode_flac,
    encode_flac,
)


def _roundtrip(x, rate=16000):
    y, r = decode_flac(encode_flac(np.asarray(x, dtype=np.int16), rate))
    assert r == rate
    assert np.array_equal(y, np.asarray(x, dtype=np.int16))


def test_roundtrip_tones_multiblock():
    for n in (1, 100, _BLOCK, _BLOCK + 1, 3 * _BLOCK + 77):
        _roundtrip(gen_samples(7, n))


def test_roundtrip_constant_and_silence():
    x = np.zeros(6000, dtype=np.int16)
    x[5000:] = 1234
    _roundtrip(x)
    _roundtrip(np.full(100, -32768, dtype=np.int16))


def test_roundtrip_noise_verbatim_path():
    rng = np.random.default_rng(3)
    _roundtrip(rng.integers(-32768, 32768, 9000).astype(np.int16))


def test_roundtrip_extreme_ramps():
    x = np.arange(-32768, 32767, 7, dtype=np.int32).astype(np.int16)
    _roundtrip(x)


def test_sample_rates():
    for rate in (8000, 16000, 44100, 48000):
        y, r = decode_flac(encode_flac(gen_samples(1, 500), rate))
        assert r == rate


def test_crc_enforced():
    buf = bytearray(encode_flac(gen_samples(2, 1000)))
    buf[-3] ^= 0xFF  # corrupt inside the last frame
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(buf))
    with pytest.raises(ValueError):
        decode_flac(b"fLaX" + bytes(10))


def _frame(channels_desc: int, bs: int, body_writer) -> bytes:
    """Hand-assemble one FLAC stream: STREAMINFO + a single frame whose
    subframes come from ``body_writer(bw)``."""
    n_ch = 2 if channels_desc >= 1 else 1
    ch_code = {0: 0x0, 1: 0x1, 8: 0x8, 9: 0x9, 10: 0xA}[channels_desc] \
        if channels_desc in (0, 1, 8, 9, 10) else channels_desc
    out = bytearray(b"fLaC")
    si = bytearray()
    si += bs.to_bytes(2, "big") * 2 + (0).to_bytes(3, "big") * 2
    si += ((16000 << 44) | ((n_ch - 1) << 41) | (15 << 36) | bs).to_bytes(8, "big")
    si += b"\x00" * 16
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + si

    hdr = bytearray(b"\xff\xf8")
    hdr += bytes([(0x07 << 4) | 0x00, (ch_code << 4) | (0x04 << 1)])
    hdr += _utf8_coded(0)
    hdr += (bs - 1).to_bytes(2, "big")
    hdr.append(_crc8(bytes(hdr)))
    bw = _BitWriter()
    body_writer(bw)
    bw.align()
    frame = bytes(hdr) + bw.bytes()
    out += frame + _crc16(frame).to_bytes(2, "big")
    return bytes(out)


def test_lpc_subframe_decodes():
    """LPC order 2, coefs [2,-1] with shift 0 over a linear ramp →
    residuals all zero; decoder must reproduce the ramp."""
    bs = 16
    want = np.arange(100, 100 + bs, dtype=np.int64)

    def body(bw):
        bw.write(0, 1)
        bw.write(32 + 1, 6)        # LPC, order = 2 → type 32 + (order-1)
        bw.write(0, 1)             # no wasted bits
        bw.write(int(want[0]) & 0xFFFF, 16)
        bw.write(int(want[1]) & 0xFFFF, 16)
        bw.write(3, 4)             # precision-1 = 3 → 4-bit coefs
        bw.write(0, 5)             # shift 0
        bw.write(2, 4)             # coef a1 = 2
        bw.write(-1 & 0xF, 4)      # coef a2 = -1
        bw.write(0, 2)             # rice method 0
        bw.write(0, 4)             # partition order 0
        bw.write(0, 4)             # rice param 0
        for _ in range(bs - 2):
            bw.unary(0)            # residual 0

    y, rate = decode_flac(_frame(0, bs, body))
    assert rate == 16000
    assert np.array_equal(y, want.astype(np.int16))


def test_rice5_and_escape_partitions():
    """Method-1 (5-bit params) and the raw-bits escape must decode."""
    bs = 8
    vals = np.array([5, -3, 2, 0, -1, 7, -8, 3], dtype=np.int64)

    def body(bw):
        bw.write(0, 1)
        bw.write(8, 6)             # FIXED order 0 (pure residuals)
        bw.write(0, 1)
        bw.write(1, 2)             # method 1: 5-bit rice params
        bw.write(1, 4)             # partition order 1 → 2 partitions
        # partition 1: rice param 2
        bw.write(2, 5)
        for v in vals[:4]:
            z = int(v * 2 if v >= 0 else -v * 2 - 1)
            bw.unary(z >> 2)
            bw.write(z & 3, 2)
        # partition 2: escape (11111) + 6 raw bits per residual
        bw.write(31, 5)
        bw.write(6, 5)
        for v in vals[4:]:
            bw.write(int(v) & 0x3F, 6)

    y, _ = decode_flac(_frame(0, bs, body))
    assert np.array_equal(y, vals.astype(np.int16))


def _write_verbatim(bw, vals, bits=16):
    bw.write(0, 1)
    bw.write(1, 6)
    bw.write(0, 1)
    for v in vals:
        bw.write(int(v) & ((1 << bits) - 1), bits)


def test_stereo_left_side_and_mid_side():
    bs = 4
    left = np.array([100, -200, 300, -400], dtype=np.int64)
    right = np.array([90, -210, 310, -390], dtype=np.int64)
    side = left - right

    def body_ls(bw):
        _write_verbatim(bw, left, 16)
        _write_verbatim(bw, side, 17)   # side channel carries +1 bit

    y, _ = decode_flac(_frame(8, bs, body_ls))
    assert np.array_equal(y[0::2], left.astype(np.int16))
    assert np.array_equal(y[1::2], right.astype(np.int16))

    mid = (left + right) >> 1

    def body_ms(bw):
        _write_verbatim(bw, mid, 16)
        _write_verbatim(bw, side, 17)

    y, _ = decode_flac(_frame(10, bs, body_ms))
    assert np.array_equal(y[0::2], left.astype(np.int16))
    assert np.array_equal(y[1::2], right.astype(np.int16))


def test_wasted_bits_decode():
    """Samples all divisible by 4 stored with 2 wasted bits."""
    bs = 4
    vals = np.array([4, -8, 12, -16], dtype=np.int64)

    def body(bw):
        bw.write(0, 1)
        bw.write(1, 6)             # VERBATIM
        bw.write(1, 1)             # wasted-bits flag
        bw.unary(1)                # unary(k-1): 2 wasted bits
        for v in (vals >> 2):
            bw.write(int(v) & 0x3FFF, 14)

    y, _ = decode_flac(_frame(0, bs, body))
    assert np.array_equal(y, vals.astype(np.int16))


def test_mixed_rotation_validates(spark):
    from osm2geojson_spark.operators.audio import validate_audio
    from osm2geojson_spark.synth.audio import AFMTS_REAL, audio_table

    aud = audio_table(spark, n=60, seed=24, fmts=AFMTS_REAL).cache()
    fmts = {r["fmt"] for r in aud.select("fmt").distinct().collect()}
    assert fmts == {"wav", "aiff", "flac"}
    v = validate_audio(aud).collect()
    assert all(r["ok"] for r in v), [r["error"] for r in v if not r["ok"]]
