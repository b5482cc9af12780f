"""AIFF codec (synth/audio.py) + mixed wav/aiff rotation through the
audio operators: IFF structure, 80-bit extended-float sample rate,
lossless int16 round trip, quarantine discipline."""

from __future__ import annotations

import numpy as np
import pytest

from osm2geojson_spark.synth.audio import (
    _f80_decode,
    _f80_encode,
    decode_aiff,
    encode_aiff,
    gen_samples,
)


def test_f80_sample_rates_roundtrip():
    for rate in (8000, 11025, 16000, 22050, 44100, 48000, 96000, 192000, 1):
        assert _f80_decode(_f80_encode(rate)) == rate, rate
    # the canonical literature value: 44100 Hz = 0x400E AC44 0000...
    assert _f80_encode(44100).hex() == "400eac44000000000000"


def test_aiff_roundtrip_lossless():
    samples = gen_samples(9, 4321)
    buf = encode_aiff(samples, 16000)
    assert buf[:4] == b"FORM" and buf[8:12] == b"AIFF"
    out, rate = decode_aiff(buf)
    assert rate == 16000
    assert np.array_equal(out, samples)
    # odd-length payloads are pad-aligned per IFF
    odd = gen_samples(3, 33)
    out2, _ = decode_aiff(encode_aiff(odd, 8000))
    assert np.array_equal(out2, odd)


def test_aiff_unknown_chunks_skipped():
    samples = gen_samples(4, 100)
    buf = bytearray(encode_aiff(samples, 16000))
    # splice a NAME chunk between AIFF id and COMM
    extra = b"NAME" + (4).to_bytes(4, "big") + b"test"
    buf2 = buf[:12] + extra + buf[12:]
    buf2[4:8] = (int.from_bytes(buf[4:8], "big") + len(extra)).to_bytes(4, "big")
    out, rate = decode_aiff(bytes(buf2))
    assert rate == 16000 and np.array_equal(out, samples)


def test_aiff_garbage_rejected():
    with pytest.raises(ValueError):
        decode_aiff(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError):
        decode_aiff(b"FORM\x00\x00\x00\x04AIFF")  # no COMM/SSND


def test_mixed_rotation_validates(spark):
    from osm2geojson_spark.operators.audio import validate_audio
    from osm2geojson_spark.synth.audio import AFMTS_AIFF, audio_table

    aud = audio_table(spark, n=60, seed=24, fmts=AFMTS_AIFF).cache()
    fmts = {r["fmt"] for r in aud.select("fmt").distinct().collect()}
    assert fmts == {"wav", "aiff"}
    v = validate_audio(aud).collect()
    assert all(r["ok"] for r in v), [r["error"] for r in v if not r["ok"]]
    for r in v:
        assert r["duration_sec"] == r["n_samples"] / 16000.0


def test_stub_fmts_still_quarantine(spark):
    from pyspark.sql import functions as F

    from osm2geojson_spark.operators.audio import validate_audio
    from osm2geojson_spark.synth.audio import audio_table

    aud = audio_table(spark, n=3, seed=24).withColumn("fmt", F.lit("mp3"))
    v = validate_audio(aud).collect()
    assert all("NotImplementedError" in r["error"] for r in v)
