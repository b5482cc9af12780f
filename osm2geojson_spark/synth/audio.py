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


def make_audio_row(seed: int) -> tuple:
    rate = 16_000
    n = 1600 + 160 * (seed % 50)          # 0.1 .. 0.6 s
    samples = gen_samples(seed, n, rate)
    return (f"aud-{seed:012d}", encode_wav(samples, rate), rate, n, "wav",
            transcript_for(seed))


def audio_table(spark: SparkSession, n: int = 500, seed: int = 24,
                partitions: int | None = None) -> DataFrame:
    """Distributed deterministic generation (same pattern as images_table:
    spark.range → mapInPandas, rows keyed purely on the 64-bit id)."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["audio_id", "bytes", "sample_rate", "n_samples", "fmt",
                "transcript"]
        for pdf in batches:
            rows = [make_audio_row(int(i) * 2 + seed) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=cols)

    return spark.range(n).repartition(parts).mapInPandas(gen, AUDIO_SCHEMA)
