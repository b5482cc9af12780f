"""Deterministic audio+transcript table synthesizer + pure-stdlib WAV
codec (multimodal expansion beyond the image input_hint — audio is the
other opaque-binary payload a training-data pipeline carries).

Schema mirrors the image table's shape: (audio_id string, bytes binary,
sample_rate int, n_samples int, fmt string, transcript string) — binary
payload + typed metadata, decode behind Arrow-batched kernels.

The ``wav`` codec is REAL (stdlib ``wave`` + numpy, PCM16 mono) — unlike
mp3/flac/ogg, which stay behind NotImplementedError stubs in
operators/audio.py exactly like jpeg/webp do for images.
"""

from __future__ import annotations

import io
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

AUDIO_SCHEMA = ("audio_id string, bytes binary, sample_rate int, "
                "n_samples int, fmt string, transcript string")

_WORDS = ["play", "stop", "next", "previous", "volume", "up", "down",
          "call", "home", "work", "timer", "set", "cancel", "repeat"]


def encode_wav(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """PCM16 mono WAV via the stdlib wave writer (lossless for int16)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """→ (int16 samples, sample_rate). Raises on non-PCM16-mono."""
    with wave.open(io.BytesIO(buf), "rb") as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise ValueError(
                f"need PCM16 mono, got {w.getnchannels()}ch "
                f"{8 * w.getsampwidth()}-bit")
        rate = w.getframerate()
        samples = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    return samples, rate


def _f80_encode(rate: int) -> bytes:
    """80-bit IEEE 754 extended float (AIFF COMM sampleRate field).
    Layout: 1 sign + 15 exponent (bias 16383) + 64-bit mantissa with an
    EXPLICIT integer bit. Exact for any positive integer rate."""
    if rate <= 0:
        raise ValueError("rate must be positive")
    e = rate.bit_length() - 1          # floor(log2(rate))
    mant = rate << (63 - e)            # normalize: top bit = integer bit
    return (16383 + e).to_bytes(2, "big") + mant.to_bytes(8, "big")


def _f80_decode(b: bytes) -> int:
    se = int.from_bytes(b[0:2], "big")
    mant = int.from_bytes(b[2:10], "big")
    if se & 0x8000:
        raise ValueError("negative AIFF sample rate")
    e = (se & 0x7FFF) - 16383
    if e < 0 or e > 62:
        raise ValueError(f"unsupported AIFF sample rate exponent {e}")
    # round the fractional part (integral for every real-world rate)
    shift = 63 - e
    return (mant + (1 << (shift - 1))) >> shift


def encode_aiff(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """PCM16 mono AIFF (IFF FORM/COMM/SSND, big-endian samples) — the
    classic real-world sibling of WAV; round-3 parity move mirroring
    MJPEG-in-AVI for video."""
    data = samples.astype(">i2").tobytes()
    comm = (1).to_bytes(2, "big") + len(samples).to_bytes(4, "big") \
        + (16).to_bytes(2, "big") + _f80_encode(rate)
    ssnd = (0).to_bytes(4, "big") + (0).to_bytes(4, "big") + data
    body = (b"AIFF"
            + b"COMM" + len(comm).to_bytes(4, "big") + comm
            + b"SSND" + len(ssnd).to_bytes(4, "big") + ssnd
            + (b"\x00" if len(ssnd) % 2 else b""))
    return b"FORM" + len(body).to_bytes(4, "big") + body


def decode_aiff(buf: bytes) -> tuple[np.ndarray, int]:
    """→ (int16 samples, sample_rate); walks the public IFF chunk
    grammar (any chunk order, unknown chunks skipped)."""
    if buf[:4] != b"FORM" or buf[8:12] != b"AIFF":
        raise ValueError("not a FORM/AIFF file")
    pos, end = 12, 8 + int.from_bytes(buf[4:8], "big")
    n_frames = rate = None
    data = None
    while pos + 8 <= min(end, len(buf)):
        cid = buf[pos:pos + 4]
        sz = int.from_bytes(buf[pos + 4:pos + 8], "big")
        body = buf[pos + 8:pos + 8 + sz]
        if cid == b"COMM":
            if int.from_bytes(body[0:2], "big") != 1:
                raise ValueError("need mono AIFF")
            if int.from_bytes(body[6:8], "big") != 16:
                raise ValueError("need 16-bit AIFF")
            n_frames = int.from_bytes(body[2:6], "big")
            rate = _f80_decode(body[8:18])
        elif cid == b"SSND":
            off = int.from_bytes(body[0:4], "big")
            data = body[8 + off:]
        pos += 8 + sz + (sz % 2)
    if n_frames is None or data is None:
        raise ValueError("AIFF missing COMM/SSND")
    samples = np.frombuffer(data[:2 * n_frames], dtype=">i2").astype("<i2")
    if len(samples) != n_frames:
        raise ValueError("truncated AIFF sample data")
    return samples, rate


def gen_samples(seed: int, n: int, rate: int = 16_000) -> np.ndarray:
    """Deterministic tone mix keyed on seed (sine + harmonic + fade)."""
    t = np.arange(n, dtype=np.float64) / rate
    f0 = 110.0 * (1 + seed % 17)
    x = (0.6 * np.sin(2 * np.pi * f0 * t)
         + 0.3 * np.sin(2 * np.pi * 2.5 * f0 * t + seed % 7))
    env = np.minimum(1.0, np.minimum(t, t[::-1] if n else t) * 20)
    return np.round(x * env * 20_000).clip(-32768, 32767).astype(np.int16)


def transcript_for(seed: int) -> str:
    n = 2 + seed % 4
    return " ".join(_WORDS[(seed * (i + 5) * 2654435761 >> 9) % len(_WORDS)]
                    for i in range(n))


AFMTS = ("wav",)
# rotation including real AIFF (big-endian PCM16 IFF container)
AFMTS_AIFF = ("wav", "aiff")
# full real-codec rotation: + FLAC (synth/flac.py, CONSTANT/FIXED+Rice)
AFMTS_REAL = ("wav", "aiff", "flac")
# + the compressed-WAV family (G.711 ulaw/alaw, IMA ADPCM — wavext.py)
AFMTS_FULL = ("wav", "aiff", "flac", "ulaw", "alaw", "adpcm")
# + Ogg (RFC 3533 pages + FLAC-in-Ogg mapping — synth/ogg.py)
AFMTS_OGG = AFMTS_FULL + ("ogg",)
# + mp3: REAL MPEG-1 framing (synth/mpeg_audio.py walks every header;
# probe_audio reads rate/samples/duration), DSP reconstruction gated
AFMTS_MP3 = AFMTS_OGG + ("mp3",)


def make_audio_row(seed: int, fmts: tuple = AFMTS) -> tuple:
    rate = 16_000
    n = 1600 + 160 * (seed % 50)          # 0.1 .. 0.6 s
    fmt = fmts[(seed >> 1) % len(fmts)]
    if fmt == "mp3":
        # MPEG-1 allows 32/44.1/48 kHz only; frames are 1152 samples, so
        # the declared count is the frame-padded total (probe-exact)
        from .mpeg_audio import encode_mp3_gated

        rate = 32_000
        n = -(-n // 1152) * 1152
        buf = encode_mp3_gated(seed, n, rate=rate)
        return (f"aud-{seed:012d}", buf, rate, n, fmt, transcript_for(seed))
    samples = gen_samples(seed, n, rate)
    if fmt == "flac":
        from .flac import encode_flac

        buf = encode_flac(samples, rate)
    elif fmt == "ogg":
        from .ogg import encode_ogg_flac

        buf = encode_ogg_flac(samples, rate)
    elif fmt in ("ulaw", "alaw", "adpcm"):
        from .wavext import encode_wav_ext

        buf = encode_wav_ext(samples, rate, fmt)
    else:
        enc = encode_aiff if fmt == "aiff" else encode_wav
        buf = enc(samples, rate)
    return (f"aud-{seed:012d}", buf, rate, n, fmt,
            transcript_for(seed))


def audio_table(spark: SparkSession, n: int = 500, seed: int = 24,
                partitions: int | None = None,
                fmts: tuple = AFMTS) -> DataFrame:
    """Distributed deterministic generation (same pattern as images_table:
    spark.range → mapInPandas, rows keyed purely on the 64-bit id)."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["audio_id", "bytes", "sample_rate", "n_samples", "fmt",
                "transcript"]
        for pdf in batches:
            rows = [make_audio_row(int(i) * 2 + seed, fmts) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=cols)

    return spark.range(n).repartition(parts).mapInPandas(gen, AUDIO_SCHEMA)


def make_segmented_audio_row(seed: int) -> tuple:
    """Speech-shaped clip for activity segmentation: alternating
    silence (peak 50 — energy/sample ≤ 2,500) and tone bursts
    (peak ~12,000 — energy/sample ≫ the 10,000/sample threshold),
    with every boundary on a 160-sample frame edge so the planted
    layout is closed-form: ``n_bursts = 2 + seed % 3`` bursts of
    ``2 + (seed // 3) % 3`` frames separated by 2-frame silences,
    leading + trailing silence included. Lossless-codec rotation
    (wav/aiff/flac) so the PCM survives byte-exactly."""
    rate, frame = 16_000, 160
    n_bursts = 2 + seed % 3
    burst_f = 2 + (seed // 3) % 3
    parts = []
    rng_phase = (seed * 2654435761) % 628
    t0 = 0
    for j in range(n_bursts + 1):
        sil = np.arange(2 * frame, dtype=np.float64)
        parts.append(np.round(
            50.0 * np.sin(sil * 0.05 + seed + j)).astype(np.int16))
        t0 += 2 * frame
        if j < n_bursts:
            k = np.arange(burst_f * frame, dtype=np.float64)
            f0 = 2 * np.pi * (200.0 + 40.0 * ((seed + j) % 5)) / rate
            parts.append(np.round(
                12_000.0 * np.sin(k * f0 + rng_phase / 100.0)
            ).astype(np.int16))
            t0 += burst_f * frame
    samples = np.concatenate(parts)
    fmt = ("wav", "aiff", "flac")[seed % 3]
    if fmt == "flac":
        from .flac import encode_flac

        buf = encode_flac(samples, rate)
    elif fmt == "aiff":
        buf = encode_aiff(samples, rate)
    else:
        buf = encode_wav(samples, rate)
    return (f"seg-{seed:012d}", buf, rate, len(samples), fmt,
            transcript_for(seed))


def segmented_audio_table(spark: SparkSession, n: int = 300, seed: int = 0,
                          partitions: int | None = None) -> DataFrame:
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["audio_id", "bytes", "sample_rate", "n_samples", "fmt",
                "transcript"]
        for pdf in batches:
            rows = [make_segmented_audio_row(int(i) + seed)
                    for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=cols)

    return spark.range(n).repartition(parts).mapInPandas(gen, AUDIO_SCHEMA)


_SNIPPET_FRAMES = 12       # 12 x 256 = 3072 samples per snippet
_SNIPPET_POOL = 60


def snippet_waveform(pool_idx: int) -> np.ndarray:
    """One shared-pool snippet (3072 samples, int16) — length is a
    multiple of the fingerprint frame (256), so a snippet reused in
    two clips lands frame-ALIGNED and reproduces identical envelope
    hashes (the property audio-dedup fingerprinting needs). The
    amplitude is a per-frame hash-noise AM pattern (12 levels in
    [2,000, 30,000]) — each snippet's envelope sequence is
    effectively unique, so fingerprints discriminate snippets (a
    plain tone mix's smooth fade envelope collides across the whole
    pool — measured: 81% of all clip pairs matched)."""
    n = _SNIPPET_FRAMES * 256
    k = np.arange(n, dtype=np.float64)
    f0 = 500.0 + 37.0 * (pool_idx % 29)
    tone = np.sin(2 * np.pi * f0 * k / 16_000.0 + pool_idx)
    fi = (np.arange(_SNIPPET_FRAMES, dtype=np.int64)
          + pool_idx * 131) * 2654435761 & 0xFFFFFFFF
    lv = 2_000 + ((fi >> 9) ^ fi) % 28_001
    amp = np.repeat(lv, 256).astype(np.float64)
    return np.round(tone * amp).clip(-32768, 32767).astype(np.int16)


def make_snippet_audio_row(seed: int) -> tuple:
    """Clip assembled from the shared 60-snippet pool — the planted
    near-duplicate structure for AUDIO dedup (the audio analog of the
    shotpool video corpus, same arithmetic: group g = seed div 3 has
    three variants v = seed mod 3 with 3 + v snippets drawn as
    (17g + 5j) mod 60, so variants of one group share their first 3
    snippets). Lossless wav so the PCM survives byte-exactly."""
    rate = 16_000
    g, v = seed // 3, seed % 3
    idxs = [(17 * g + 5 * j) % _SNIPPET_POOL for j in range(3 + v)]
    samples = np.concatenate([snippet_waveform(i) for i in idxs])
    buf = encode_wav(samples, rate)
    return (f"snp-{seed:012d}", buf, rate, len(samples), "wav",
            transcript_for(seed))


def snippet_audio_table(spark: SparkSession, n: int = 120,
                        seed: int = 42,
                        partitions: int | None = None) -> DataFrame:
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["audio_id", "bytes", "sample_rate", "n_samples", "fmt",
                "transcript"]
        for pdf in batches:
            rows = [make_snippet_audio_row(int(i) + seed)
                    for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=cols)

    return spark.range(n).repartition(parts).mapInPandas(
        gen, AUDIO_SCHEMA)
