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


# --------------------------------------------------------------- probing
# Header-only metadata extraction (the ffprobe shape): no sample decode,
# so it also works on formats whose DSP layer is gated (mp3, Ogg-Vorbis/
# Opus) — real container grammar for every branch.

def _probe_riff(buf: bytes) -> tuple[int, int, bool]:
    import struct

    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE")
    pos, tag, rate, n_fact, data_sz = 12, None, None, None, None
    while pos + 8 <= len(buf):
        cid, sz = buf[pos:pos + 4], struct.unpack_from("<I", buf, pos + 4)[0]
        body = pos + 8
        if cid == b"fmt ":
            tag, _ch, rate = struct.unpack_from("<HHI", buf, body)
        elif cid == b"fact":
            n_fact = struct.unpack_from("<I", buf, body)[0]
        elif cid == b"data":
            data_sz = sz
        pos = body + sz + (sz & 1)
    if tag is None or data_sz is None:
        raise ValueError("missing fmt/data chunk")
    if tag == 1:
        n = data_sz // 2
    elif tag in (6, 7):
        n = data_sz
    elif tag == 0x11:
        if n_fact is None:
            raise ValueError("ADPCM without fact chunk")
        n = n_fact
    else:
        raise ValueError(f"WAVE tag {tag:#x} unsupported")
    return rate, n, True


def _probe_aiff(buf: bytes) -> tuple[int, int, bool]:
    import struct

    from osm2geojson_spark.synth.audio import _f80_decode

    if buf[:4] != b"FORM" or buf[8:12] != b"AIFF":
        raise ValueError("not an AIFF")
    pos = 12
    while pos + 8 <= len(buf):
        cid, sz = buf[pos:pos + 4], struct.unpack_from(">I", buf, pos + 4)[0]
        if cid == b"COMM":
            _ch, n = struct.unpack_from(">hI", buf, pos + 8)
            rate = _f80_decode(buf[pos + 16:pos + 26])
            return rate, n, True
        pos += 8 + sz + (sz & 1)
    raise ValueError("no COMM chunk")


def _parse_streaminfo(body: bytes) -> tuple[int, int]:
    packed = int.from_bytes(body[10:18], "big")
    return (packed >> 44) & 0xFFFFF, packed & ((1 << 36) - 1)


def _probe_flac(buf: bytes) -> tuple[int, int, bool]:
    if buf[:4] != b"fLaC":
        raise ValueError("not a FLAC")
    rate, n = _parse_streaminfo(buf[8:])
    return rate, n, True


def _probe_ogg(buf: bytes) -> tuple[int, int, bool]:
    import struct

    from osm2geojson_spark.synth.ogg import _walk_pages, ogg_packets

    granule = 0
    for _flags, g, _serial, _seq, _frags in _walk_pages(buf):
        if g >= 0:
            granule = g
    p0 = ogg_packets(buf)[0]
    if p0[:5] == b"\x7fFLAC":
        rate, n = _parse_streaminfo(p0[13 + 4:])
        return rate, n if n else granule, True
    if p0[1:7] == b"vorbis":                    # ID header: rate at 12 (LE)
        return struct.unpack_from("<I", p0, 12)[0], granule, False
    if p0.startswith(b"OpusHead"):              # input rate at 12 (LE)
        return struct.unpack_from("<I", p0, 12)[0], granule, False
    raise ValueError("unrecognized Ogg mapping")


def _probe_mpeg(buf: bytes) -> tuple[int, int, bool]:
    from osm2geojson_spark.synth.mpeg_audio import mpeg_frames

    info = mpeg_frames(buf)
    return info["rate"], info["n_samples"], False


_PROBES = {"wav": _probe_riff, "ulaw": _probe_riff, "alaw": _probe_riff,
           "adpcm": _probe_riff, "aiff": _probe_aiff, "flac": _probe_flac,
           "ogg": _probe_ogg, "mp3": _probe_mpeg}


def probe_audio(df: DataFrame) -> DataFrame:
    """Header-only stream metadata for EVERY format incl. DSP-gated ones
    (mp3 frame walk, Ogg granule positions): (rate, n_samples,
    duration_sec, decodable, matches_declared).  Unparseable bytes
    quarantine with error set — same discipline as validate."""
    out_schema = ("audio_id string, fmt string, rate int, n_samples long, "
                  "duration_sec double, decodable boolean, "
                  "matches_declared boolean, error string")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                try:
                    probe = _PROBES.get(t.fmt)
                    if probe is None:
                        raise ValueError(f"unknown fmt '{t.fmt}'")
                    rate, n, dec = probe(bytes(t.bytes))
                    rows.append((t.audio_id, t.fmt, rate, n,
                                 n / float(rate), dec,
                                 rate == t.sample_rate and n == t.n_samples,
                                 None))
                except Exception as ex:  # noqa: BLE001 — quarantine
                    rows.append((t.audio_id, t.fmt, None, None, None, None,
                                 None, f"{type(ex).__name__}: {ex}"))
            yield pd.DataFrame(rows, columns=[
                "audio_id", "fmt", "rate", "n_samples", "duration_sec",
                "decodable", "matches_declared", "error"])

    cols = ["audio_id", "bytes", "sample_rate", "n_samples", "fmt"]
    return df.select(*cols).mapInPandas(run, out_schema)


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


def activity_segments(df: DataFrame, frame: int = 160,
                      thr_per_sample: int = 10_000) -> DataFrame:
    """Voice-activity-style segmentation: exact int64 frame energies
    (Σx² over ``frame``-sample windows; the trailing partial frame is
    dropped), a frame is ACTIVE iff ``energy > thr_per_sample·frame``
    (integer compare, no division), and maximal runs of active frames
    become segments. ONE sequential decode pass per clip in the Arrow
    kernel — zero shuffle; undecodable clips quarantine as
    ``seg_idx = -1``. The audio twin of video scene_cuts: segments,
    not raw sample ranges, are the transcription/dedup unit at 100 TB.
    Output: (audio_id, seg_idx, start_frame, n_frames, energy)."""
    out_schema = ("audio_id string, seg_idx int, start_frame int, "
                  "n_frames int, energy long, error string")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                try:
                    pcm, _rate = _decode(bytes(t.bytes), t.fmt)
                    x = pcm.astype(np.int64)
                    nf = len(x) // frame
                    e = (x[:nf * frame].reshape(nf, frame) ** 2).sum(axis=1)
                    act = e > thr_per_sample * frame
                    seg = -1
                    for k in range(nf):
                        if act[k] and (k == 0 or not act[k - 1]):
                            seg += 1
                            rows.append([t.audio_id, seg, k, 1,
                                         int(e[k]), None])
                        elif act[k]:
                            rows[-1][3] += 1
                            rows[-1][4] += int(e[k])
                except Exception as ex:  # noqa: BLE001 — quarantine row
                    rows.append([t.audio_id, -1, None, None, None,
                                 f"{type(ex).__name__}: {ex}"])
            yield pd.DataFrame(rows, columns=["audio_id", "seg_idx",
                                              "start_frame", "n_frames",
                                              "energy", "error"])

    return df.select("audio_id", "bytes", "fmt").mapInPandas(
        run, out_schema)


def fingerprint_samples(samples, frame: int = 256, fan_out: int = 3):
    """Deterministic landmark fingerprint of one PCM clip — the
    shared kernel (engine and pyref both call THIS; what differs is
    the machinery around it). Envelope = per-``frame`` max |sample|;
    peaks = interior frames with env > left and env ≥ right and
    env ≥ 256 (silence floor); each peak pairs with its next
    ``fan_out`` peaks at Δt ≤ 63 frames into the packed 20-bit hash
    ``(env_i >> 8)·2¹³ + (env_j >> 8)·2⁶ + Δt`` — the Shazam
    constellation shape on the time-domain envelope (our corpus is
    lossless PCM; no spectral robustness needed, exactness is the
    contract). Returns [(peak_frame, hash)]."""
    s = np.abs(np.asarray(samples, np.int64))
    nf = len(s) // frame
    if nf < 3:
        return []
    env = s[:nf * frame].reshape(nf, frame).max(axis=1)
    peaks = [i for i in range(1, nf - 1)
             if env[i] > env[i - 1] and env[i] >= env[i + 1]
             and env[i] >= 256]
    out = []
    for a in range(len(peaks)):
        for b in range(a + 1, min(a + 1 + fan_out, len(peaks))):
            i, j = peaks[a], peaks[b]
            dt = j - i
            if dt > 63:
                continue
            out.append((i, (int(env[i]) >> 8) * 8192
                        + (int(env[j]) >> 8) * 64 + dt))
    return out


def audio_fingerprints(df: DataFrame, frame: int = 256,
                       fan_out: int = 3) -> DataFrame:
    """Per-clip landmark hashes ``(audio_id, t, fp, error)`` — one
    Arrow decode pass through the real codec dispatch, no shuffle;
    undecodable clips quarantine (t −1 + error)."""
    out_schema = "audio_id string, t int, fp long, error string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    samples, _rate = _decode(bytes(r.bytes), r.fmt)
                    for t, h in fingerprint_samples(
                            samples, frame, fan_out):
                        rows.append((r.audio_id, t, h, None))
                except Exception as ex:  # noqa: BLE001 — wave.Error etc.
                    rows.append((r.audio_id, -1, None,
                                 f"{type(ex).__name__}: {ex}"))
            yield pd.DataFrame(rows, columns=[
                "audio_id", "t", "fp", "error"])

    return df.select("audio_id", "bytes", "fmt").mapInPandas(
        run, out_schema)


def audio_dup_pairs(fps: DataFrame, min_shared: int = 5,
                    max_bucket_size: int | None = None) -> DataFrame:
    """Audio near-dup pairs sharing ≥ ``min_shared`` DISTINCT
    fingerprint hashes — the audio analog of the shot-phash video
    dedup: one equi-join on the hash (no cartesian), pair-count
    shuffle, ``max_bucket_size`` caps degenerate hashes (constant
    tones) via the shared cap_bucket_size guard."""
    from osm2geojson_spark.operators.dedup import cap_bucket_size

    toks = (fps.where(F.col("error").isNull())
            .select(F.col("audio_id").alias("id"), "fp").distinct())
    toks = cap_bucket_size(toks, ["fp"], max_bucket_size)
    return (toks.alias("a")
            .join(toks.alias("b"),
                  (F.col("a.fp") == F.col("b.fp"))
                  & (F.col("a.id") < F.col("b.id")))
            .groupBy(F.col("a.id").alias("id_a"),
                     F.col("b.id").alias("id_b"))
            .agg(F.count("*").alias("n_shared"))
            .where(F.col("n_shared") >= int(min_shared)))
