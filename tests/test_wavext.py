"""Compressed-WAV codecs (synth/wavext.py): G.711 μ-law/A-law table
idempotence + canonical anchors, IMA ADPCM fidelity + block
independence, RIFF fact-chunk length honoring, and the full 6-format
audio rotation through the validate/stats operators."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from osm2geojson_spark.synth.audio import encode_wav, gen_samples
from osm2geojson_spark.synth.wavext import (
    BLOCK_ALIGN,
    SAMPLES_PER_BLOCK,
    _ima_step,
    alaw_decode,
    alaw_encode,
    decode_wav_ext,
    encode_wav_ext,
    ima_decode_block,
    ima_encode_block,
    mulaw_decode,
    mulaw_encode,
)


def test_g711_idempotent_over_all_bytes():
    # decode: byte → level; encode(level) must return the same byte for
    # every one of the 256 code points (companding is a bijection on its
    # own reconstruction levels)
    b = np.arange(256, dtype=np.uint8)
    got = mulaw_encode(mulaw_decode(b))
    # μ-law's one non-bijective point: 0x7F is "negative zero", decodes
    # to 0 and canonically re-encodes as positive zero 0xFF (G.711
    # behavior — both bytes carry the same level)
    assert (got[b != 0x7F] == b[b != 0x7F]).all()
    assert got[0x7F] == 0xFF
    assert (alaw_encode(alaw_decode(b)) == b).all()


def test_g711_anchors():
    # canonical silence bytes and signs
    assert mulaw_encode(np.array([0]))[0] == 0xFF
    assert mulaw_decode(np.array([0xFF]))[0] == 0
    assert alaw_encode(np.array([0]))[0] == 0xD5
    assert alaw_decode(np.array([0xD5]))[0] == 8   # A-law zero level
    # extremes decode near full scale with correct signs
    assert mulaw_decode(np.array([0x00]))[0] < -30000
    assert mulaw_decode(np.array([0x80]))[0] > 30000
    assert abs(int(alaw_decode(np.array([0x55 ^ 0x7F]))[0])) > 30000


def test_g711_monotone_quantization():
    # reconstruction levels are monotone in the linear input
    x = np.arange(-32768, 32768, 7, dtype=np.int16)
    for enc, dec in ((mulaw_encode, mulaw_decode),
                     (alaw_encode, alaw_decode)):
        y = dec(enc(x)).astype(np.int32)
        assert (np.diff(y) >= 0).all()


@pytest.mark.parametrize("fmt,min_snr", [("ulaw", 30.0), ("alaw", 30.0),
                                         ("adpcm", 20.0)])
def test_roundtrip_snr(fmt, min_snr):
    x = gen_samples(24, 5000)
    y, rate = decode_wav_ext(encode_wav_ext(x, 16_000, fmt))
    assert rate == 16_000 and len(y) == len(x)
    err = y.astype(np.float64) - x.astype(np.float64)
    snr = 10 * np.log10(np.mean(x.astype(np.float64) ** 2)
                        / max(np.mean(err ** 2), 1e-12))
    assert snr >= min_snr, (fmt, snr)


def test_adpcm_fact_chunk_lengths():
    # every length decodes to exactly n samples despite block padding
    for n in (1, 2, SAMPLES_PER_BLOCK - 1, SAMPLES_PER_BLOCK,
              SAMPLES_PER_BLOCK + 1, 3 * SAMPLES_PER_BLOCK + 17):
        x = gen_samples(7, n)
        y, _ = decode_wav_ext(encode_wav_ext(x, 16_000, "adpcm"))
        assert len(y) == n, (n, len(y))


def test_adpcm_block_independence():
    # blocks are self-contained: decoding block k alone equals the k-th
    # slice of the full decode (headers carry predictor + index)
    x = gen_samples(5, 3 * SAMPLES_PER_BLOCK)
    buf = encode_wav_ext(x, 16_000, "adpcm")
    full, _ = decode_wav_ext(buf)
    data_pos = buf.index(b"data") + 8
    for k in range(3):
        blk = buf[data_pos + k * BLOCK_ALIGN:data_pos + (k + 1) * BLOCK_ALIGN]
        alone = ima_decode_block(blk)
        assert np.array_equal(
            alone, full[k * SAMPLES_PER_BLOCK:(k + 1) * SAMPLES_PER_BLOCK])


def test_adpcm_encoder_mirrors_decoder():
    # the encoder's running reconstruction equals the decoder's output
    # (no drift), checked via the scalar reference step
    x = gen_samples(9, SAMPLES_PER_BLOCK)
    blk, pred_out, idx_out = ima_encode_block(x, 0, 0)
    dec = ima_decode_block(blk)
    assert int(dec[-1]) == pred_out
    # replay the scalar reference over the packed codes
    pred, index, _ = struct.unpack_from("<hBB", blk, 0)
    p, idx = int(pred), int(index)
    for byte in blk[4:]:
        for c in (byte & 0x0F, byte >> 4):
            p, idx = _ima_step(c, p, idx)
    assert p == pred_out and idx == idx_out


def test_generic_reader_handles_pcm_and_rejects_garbage():
    x = gen_samples(3, 777)
    y, rate = decode_wav_ext(encode_wav(x, 16_000))
    assert rate == 16_000 and np.array_equal(y, x)
    with pytest.raises(ValueError):
        decode_wav_ext(b"\x00" * 64)
    # unknown format tag → NotImplementedError (honest quarantine)
    buf = bytearray(encode_wav_ext(x, 16_000, "ulaw"))
    tag_pos = buf.index(b"fmt ") + 8
    struct.pack_into("<H", buf, tag_pos, 0x55)  # GSM 6.10
    with pytest.raises(NotImplementedError):
        decode_wav_ext(bytes(buf))


def test_full_rotation_operators(spark):
    from osm2geojson_spark.operators.audio import audio_stats, validate_audio
    from osm2geojson_spark.synth.audio import AFMTS_FULL, audio_table

    aud = audio_table(spark, n=36, seed=24, fmts=AFMTS_FULL).cache()
    src = {r["audio_id"]: r for r in aud.collect()}
    assert {r["fmt"] for r in src.values()} == set(AFMTS_FULL)

    v = validate_audio(aud).collect()
    assert all(r["ok"] for r in v), [(r["fmt"], r["error"])
                                     for r in v if not r["ok"]]
    st = {r["audio_id"]: r for r in audio_stats(aud).collect()}
    for aid, r in src.items():
        s = st[aid]
        assert s["duration_sec"] == r["n_samples"] / 16_000.0
        assert s["rms"] is not None and s["rms"] > 0
