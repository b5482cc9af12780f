"""MPEG audio framing layer: header arithmetic against hand-computed
vectors, full-stream walk, ID3v2/Xing handling, strictness, the honest
DSP gate, and probe_audio over the 8-format rotation."""

from __future__ import annotations

import struct

import pytest

from osm2geojson_spark.synth.mpeg_audio import (
    decode_mpeg_audio,
    encode_mp3_gated,
    mpeg_frames,
    parse_frame_header,
)


def test_header_vectors():
    # 0xFFFB9000: MPEG-1 Layer III, 128 kbps, 44100 Hz, no padding
    # frame = 144 * 128000 / 44100 = 417 bytes (the canonical mp3 number)
    h = parse_frame_header(0xFFFB9000)
    assert (h["version"], h["layer"], h["bitrate"], h["rate"]) == (1, 3, 128000, 44100)
    assert h["frame_bytes"] == 417 and h["samples"] == 1152
    # padding bit adds one byte
    assert parse_frame_header(0xFFFB9200)["frame_bytes"] == 418
    # MPEG-1 Layer I, 448 kbps, 32 kHz: (12*448000/32000)*4 = 672
    h1 = parse_frame_header(0xFFFFE800)
    assert h1["layer"] == 1 and h1["frame_bytes"] == 672 and h1["samples"] == 384
    # MPEG-2 Layer III: 576 samples/frame
    h2 = parse_frame_header(0xFFF32000)
    assert h2["version"] == 2 and h2["samples"] == 576
    for bad in (0x00000000,          # no sync
                0xFFFB0000,          # free format
                0xFFFBF000,          # forbidden bitrate
                0xFFFBCC00,          # reserved rate index (0b11)
                0xFFE99000):         # reserved layer (00)
        with pytest.raises(ValueError):
            parse_frame_header(bad)


def test_stream_walk_and_id3():
    buf = encode_mp3_gated(7, 5000, rate=32000, bitrate_kbps=64)
    info = mpeg_frames(buf)
    assert info["n_frames"] == 5 and info["n_samples"] == 5 * 1152
    assert info["rate"] == 32000 and info["mean_bitrate"] == 64000
    assert info["duration_sec"] == 5 * 1152 / 32000
    # ID3v2 tag (syncsafe size) is skipped
    tag = b"ID3\x04\x00\x00" + bytes([0, 0, 1, 4]) + b"x" * 132
    assert mpeg_frames(tag + buf)["n_frames"] == 5
    # truncation and trailing garbage are rejected, not ignored
    with pytest.raises(ValueError, match="truncated"):
        mpeg_frames(buf[:-10])
    with pytest.raises(ValueError, match="trailing|no frame sync"):
        mpeg_frames(buf + b"\x00\x00\x00\x00\x00")


def test_xing_vbr_header():
    buf = bytearray(encode_mp3_gated(1, 1152, rate=32000, bitrate_kbps=64))
    # MPEG-1 mono side info = 17 bytes → Xing at 4 + 17
    p = 4 + 17
    buf[p:p + 12] = b"Xing" + struct.pack(">II", 1, 999)
    assert mpeg_frames(bytes(buf))["vbr_frames"] == 999


def test_dsp_gate():
    buf = encode_mp3_gated(3, 3000)
    with pytest.raises(NotImplementedError, match="synthesis window"):
        decode_mpeg_audio(buf)
    with pytest.raises(ValueError):     # malformed fails as malformed,
        decode_mpeg_audio(b"garbage!")  # not as not-implemented


def test_probe_rotation_and_quarantine(spark):
    from pyspark.sql import functions as F

    from osm2geojson_spark.operators.audio import probe_audio
    from osm2geojson_spark.synth.audio import AFMTS_MP3, audio_table

    aud = audio_table(spark, n=48, seed=24, fmts=AFMTS_MP3)
    p = probe_audio(aud).cache()
    rows = p.collect()
    assert {r["fmt"] for r in rows} == set(AFMTS_MP3)
    assert all(r["error"] is None for r in rows)
    assert all(r["matches_declared"] for r in rows)
    by = {r["fmt"]: r for r in rows}
    assert by["mp3"]["decodable"] is False
    assert by["wav"]["decodable"] is True
    # mislabeled bytes quarantine with the parse error
    bad = aud.limit(3).withColumn("fmt", F.lit("mp3"))
    q = probe_audio(bad).filter(F.col("error").isNotNull())
    assert q.count() > 0
    p.unpersist()


def test_ogg_granule_probe(spark):
    """Ogg probe reads duration from STREAMINFO/granules, no decode."""
    from osm2geojson_spark.operators.audio import _probe_ogg
    from osm2geojson_spark.synth.audio import gen_samples
    from osm2geojson_spark.synth.ogg import encode_ogg_flac

    s = gen_samples(9, 9999)
    rate, n, dec = _probe_ogg(encode_ogg_flac(s))
    assert (rate, n, dec) == (16000, 9999, True)
