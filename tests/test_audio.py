"""Audio payload invariants (multimodal expansion): real stdlib WAV
codec round-trip, validate/quarantine discipline, feature extraction,
resample plumbing, determinism — mirrors test_images.py."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm2geojson_spark.operators.audio import (
    audio_stats,
    resample_audio,
    validate_audio,
)
from osm2geojson_spark.operators.images import quarantine_split
from osm2geojson_spark.synth.audio import (
    audio_table,
    decode_wav,
    encode_wav,
    gen_samples,
)


def test_wav_roundtrip_exact():
    s = gen_samples(3, 4000)
    buf = encode_wav(s, 16_000)
    assert buf[:4] == b"RIFF" and buf[8:12] == b"WAVE"
    out, rate = decode_wav(buf)
    assert rate == 16_000
    assert np.array_equal(out, s)


def test_wav_rejects_wrong_format():
    with pytest.raises(Exception):
        decode_wav(b"RIFFxxxxWAVE" + b"\x00" * 20)


@pytest.fixture(scope="module")
def audio(spark):
    df = audio_table(spark, n=80, seed=24).cache()
    df.count()
    return df


def test_audio_table_deterministic(spark, audio):
    a = {r["audio_id"]: (bytes(r["bytes"]), r["transcript"])
         for r in audio.collect()}
    b = {r["audio_id"]: (bytes(r["bytes"]), r["transcript"])
         for r in audio_table(spark, n=80, seed=24).collect()}
    assert a == b


def test_validate_audio_all_ok(audio):
    v = validate_audio(audio).cache()
    good, bad = quarantine_split(v)
    assert bad.count() == 0
    rows = good.collect()
    assert len(rows) == 80
    assert all(r["transcript_ok"] for r in rows)
    assert all(0.05 < r["duration_sec"] <= 0.6 for r in rows)


def test_validate_audio_quarantines_corrupt_and_stub(spark, audio):
    corrupt = audio.limit(3).withColumn(
        "bytes", F.substring("bytes", 1, 16).cast("binary"))
    mp3ish = audio.limit(2).withColumn("fmt", F.lit("mp3"))
    good, bad = quarantine_split(validate_audio(corrupt.unionByName(mp3ish)))
    assert good.count() == 0 and bad.count() == 5
    errs = [r["error"] for r in bad.collect()]
    assert all(e is not None for e in errs)
    assert any("NotImplementedError" in e for e in errs)


def test_audio_stats_match_numpy(spark, audio):
    rows = {r["audio_id"]: r for r in audio_stats(audio.limit(10)).collect()}
    src = {r["audio_id"]: r for r in audio.limit(10).collect()}
    for aid, r in rows.items():
        s, rate = decode_wav(bytes(src[aid]["bytes"]))
        x = s.astype(np.float64)
        assert r["rms"] == pytest.approx(float(np.sqrt(np.mean(x * x))))
        assert r["peak"] == int(np.abs(s).max())
        assert r["duration_sec"] == pytest.approx(len(s) / rate)


def test_resample_halves_rate(spark, audio):
    out = {r["audio_id"]: r for r in resample_audio(audio.limit(5), 8000).collect()}
    src = {r["audio_id"]: r for r in audio.limit(5).collect()}
    for aid, r in out.items():
        s, rate = decode_wav(bytes(r["resampled"]))
        assert rate == 8000
        n_in = src[aid]["n_samples"]
        assert abs(len(s) - n_in / 2) <= 1
