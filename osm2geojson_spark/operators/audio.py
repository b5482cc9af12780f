"""Audio payload operators — the audio twin of operators/images.py:
Arrow-batched kernels over (audio_id, bytes, sample_rate, n_samples,
fmt, transcript) with the same quarantine discipline (problem* sinks,
OsmJoin.java:111-113,176-179: undecodable rows split out, never dropped).

Real decoders: ``wav`` (stdlib PCM16), ``aiff`` (IFF chunk grammar,
80-bit extended-float rate), ``flac`` (synth/flac.py — FIXED/LPC+Rice),
the compressed-WAV family ``ulaw``/``alaw`` (ITU-T G.711) and ``adpcm``
(IMA/DVI WAVE tag 0x11) via synth/wavext.py, and ``ogg`` (RFC 3533
pages + the Xiph FLAC-in-Ogg mapping, synth/ogg.py — CRC-verified,
continuation-aware packet reassembly; Vorbis/Opus payloads codec-gate
to NotImplementedError like webm/VP9). mp3/opus raise
NotImplementedError behind the fmt dispatch — patent-era DSP codecs
whose decoders are out of scope; the Spark plumbing (schema, batching,
quarantine) is fully exercised either way — swap in ffmpeg/soundfile on
a cluster that has them.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm2geojson_spark.synth.audio import decode_aiff, decode_wav


def _decode_flac(buf: bytes):
    from osm2geojson_spark.synth.flac import decode_flac

    return decode_flac(buf)


def _decode_wav_ext(buf: bytes):
    from osm2geojson_spark.synth.wavext import decode_wav_ext

    return decode_wav_ext(buf)


def _decode_ogg(buf: bytes):
    from osm2geojson_spark.synth.ogg import decode_ogg_flac

    return decode_ogg_flac(buf)


_STUB_FMTS = {"mp3", "opus"}
_DECODERS = {"wav": decode_wav, "aiff": decode_aiff, "flac": _decode_flac,
             "ulaw": _decode_wav_ext, "alaw": _decode_wav_ext,
             "adpcm": _decode_wav_ext, "ogg": _decode_ogg}


def _decode(buf: bytes, fmt: str) -> tuple[np.ndarray, int]:
    if fmt in _STUB_FMTS:
        raise NotImplementedError(
            f"codec '{fmt}' requires an audio library not present in this "
            "container; plug ffmpeg/soundfile into the dispatch to enable")
    dec = _DECODERS.get(fmt)
    if dec is None:
        raise ValueError(f"unknown fmt '{fmt}'")
    return dec(buf)


def validate_audio(df: DataFrame) -> DataFrame:
    """Per-row invariants: decodability, declared (sample_rate, n_samples)
    match the container header, transcript non-empty. Adds (ok, error,
    duration_sec); split with images.quarantine_split (same contract)."""
    out_schema = ("audio_id string, fmt string, sample_rate int, "
                  "n_samples int, ok boolean, error string, "
                  "duration_sec double, transcript_ok boolean")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                err, dur, ok = None, None, False
                tr_ok = t.transcript is not None and len(t.transcript) > 0
                try:
                    samples, rate = _decode(bytes(t.bytes), t.fmt)
                    if rate != t.sample_rate or len(samples) != t.n_samples:
                        raise ValueError(
                            f"header ({rate},{len(samples)}) != declared "
                            f"({t.sample_rate},{t.n_samples})")
                    dur = len(samples) / float(rate)
                    ok = tr_ok
                except Exception as ex:  # noqa: BLE001 — quarantine on any decode failure
                    err = f"{type(ex).__name__}: {ex}"
                rows.append((t.audio_id, t.fmt, t.sample_rate, t.n_samples,
                             ok, err, dur, tr_ok))
            yield pd.DataFrame(
                rows, columns=["audio_id", "fmt", "sample_rate", "n_samples",
                               "ok", "error", "duration_sec", "transcript_ok"])

    cols = ["audio_id", "bytes", "sample_rate", "n_samples", "fmt", "transcript"]
    return df.select(*cols).mapInPandas(run, out_schema)


def audio_stats(df: DataFrame) -> DataFrame:
    """Decode + per-clip features (rms, peak, zero-crossing rate) — the
    feature-extraction shape for audio payloads."""
    out_schema = ("audio_id string, rms double, peak int, zcr double, "
                  "duration_sec double")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                try:
                    s, rate = _decode(bytes(t.bytes), t.fmt)
                    x = s.astype(np.float64)
                    zc = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) \
                        if len(x) > 1 else 0.0
                    rows.append((t.audio_id, float(np.sqrt(np.mean(x * x))),
                                 int(np.abs(s).max()) if len(s) else 0,
                                 zc, len(s) / float(rate)))
                except (NotImplementedError, ValueError):
                    rows.append((t.audio_id, None, None, None, None))
            yield pd.DataFrame(rows, columns=["audio_id", "rms", "peak",
                                              "zcr", "duration_sec"])

    return df.select("audio_id", "bytes", "fmt").mapInPandas(run, out_schema)


def resample_audio(df: DataFrame, out_rate: int = 8_000) -> DataFrame:
    """Linear-interpolation resample to a fixed rate, re-encoded wav —
    the normalize-before-training shape (numpy interp, no audio lib)."""
    from osm2geojson_spark.synth.audio import encode_wav

    out_schema = "audio_id string, resampled binary, sample_rate int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                try:
                    s, rate = _decode(bytes(t.bytes), t.fmt)
                    n_out = max(1, int(round(len(s) * out_rate / rate)))
                    xi = np.linspace(0, len(s) - 1, n_out)
                    y = np.interp(xi, np.arange(len(s)), s.astype(np.float64))
                    rows.append((t.audio_id,
                                 encode_wav(np.round(y).astype(np.int16), out_rate),
                                 out_rate))
                except (NotImplementedError, ValueError):
                    rows.append((t.audio_id, None, out_rate))
            yield pd.DataFrame(rows, columns=["audio_id", "resampled",
                                              "sample_rate"])

    return df.select("audio_id", "bytes", "fmt").mapInPandas(run, out_schema)
