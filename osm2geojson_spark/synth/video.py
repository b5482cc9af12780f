"""Deterministic video table synthesizer + 'fpack' frame container.

fpack is the video analogue of the qz6 image codec: a real, seekable,
pure-stdlib container so the frame-sampling OPERATOR logic (header
parse, O(1) frame seek, every-n selection, per-frame feature extraction)
is genuinely exercised. The real-world containers live next door —
MJPEG in AVI (synth/avi.py), MP4 (synth/mp4.py) and MKV (synth/mkv.py)
all decode for real; webm rows are structurally-valid EBML whose
VP8/VP9/AV1 codecs we honestly refuse (quarantine), since a DSP video
decoder is out of scope.

Layout: ``FPK1\\n<n_frames> <w> <h> <fps>\\n`` + n_frames raw RGB24
frames (fixed size ⇒ random access by index without decoding the rest).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from osm2geojson_spark.synth.images import gen_pixels

VIDEO_SCHEMA = ("media_id string, bytes binary, w int, h int, "
                "n_frames int, fps int, fmt string")

_MAGIC = b"FPK1\n"


def encode_fpack(frames: list[np.ndarray], fps: int = 10) -> bytes:
    if not frames:
        raise ValueError("fpack needs >= 1 frame")
    h, w, _ = frames[0].shape
    for f in frames:
        if f.shape != (h, w, 3):
            raise ValueError("all frames must share one shape")
    head = _MAGIC + b"%d %d %d %d\n" % (len(frames), w, h, fps)
    return head + b"".join(f.astype(np.uint8).tobytes() for f in frames)


def fpack_header(buf: bytes) -> tuple[int, int, int, int, int]:
    """→ (n_frames, w, h, fps, data_offset)."""
    if not buf.startswith(_MAGIC):
        raise ValueError("not an fpack container")
    end = buf.index(b"\n", len(_MAGIC))
    n, w, h, fps = (int(x) for x in buf[len(_MAGIC):end].split())
    return n, w, h, fps, end + 1

def fpack_frame(buf: bytes, idx: int) -> np.ndarray:
    """O(1) seek: fixed frame size ⇒ slice without touching other frames."""
    n, w, h, fps, off = fpack_header(buf)
    if not 0 <= idx < n:
        raise IndexError(f"frame {idx} out of range 0..{n - 1}")
    sz = w * h * 3
    start = off + idx * sz
    frame = buf[start:start + sz]
    if len(frame) != sz:
        raise ValueError("truncated fpack frame data")
    return np.frombuffer(frame, dtype=np.uint8).reshape(h, w, 3)


VFMTS = ("fpack",)
# rotation including the real-world MJPEG-in-AVI container (synth/avi.py)
VFMTS_AVI = ("fpack", "avi")
# full rotation: every real container + a structurally-valid webm whose
# codec id (V_VP9) the reader honestly refuses — the quarantine row
VFMTS_ALL = ("fpack", "avi", "mp4", "mkv", "webm")


def make_video_row(seed: int, fmts: tuple = VFMTS) -> tuple:
    w = 16 + 8 * (seed % 3)
    h = 16 + 8 * ((seed // 3) % 3)
    n_frames = 4 + seed % 9
    fmt = fmts[(seed >> 1) % len(fmts)]
    frames = [gen_pixels(seed + 31 * k, w, h) for k in range(n_frames)]
    if fmt == "avi":
        from .avi import encode_avi_mjpeg

        buf = encode_avi_mjpeg(frames, fps=10, quality=95)
    elif fmt == "mp4":
        from .mp4 import encode_mp4_mjpeg

        buf = encode_mp4_mjpeg(frames, fps=10, quality=95)
    elif fmt == "mkv":
        from .mkv import encode_mkv_mjpeg

        buf = encode_mkv_mjpeg(frames, fps=10, quality=95)
    elif fmt == "webm":
        # real EBML/webm container; V_VP9 payload bytes are never decoded
        # (the reader gates on the codec id before touching payloads)
        from .mkv import encode_mkv_mjpeg

        buf = encode_mkv_mjpeg(frames, fps=10, doctype="webm",
                               codec_id="V_VP9")
    else:
        buf = encode_fpack(frames, fps=10)
    return (f"vid-{seed:012d}", buf, w, h, n_frames, 10, fmt)


def make_scene_video_row(seed: int) -> tuple:
    """Scene-structured clip for cut detection: within a scene,
    consecutive frames differ by EXACTLY +3 per channel (bases rescaled
    into [0,200) so +3·k never wraps — in-scene d2 is 9·npix on the
    nose), while scene boundaries switch to an independent base pattern
    (d2 ≈ 6,600·npix). Scene layout is closed-form: ``n_scenes`` scenes
    of ``per_scene`` frames ⇒ true cuts at multiples of per_scene."""
    w = 16 + 8 * (seed % 2)
    h = 16
    n_scenes = 2 + seed % 3
    per_scene = 3 + (seed // 3) % 3
    frames = []
    for j in range(n_scenes):
        base = gen_pixels(seed * 131 + j * 977 + 7, w, h).astype(np.int64)
        base = base * 200 // 256
        for k in range(per_scene):
            frames.append((base + 3 * k).astype(np.uint8))
    buf = encode_fpack(frames, fps=10)
    return (f"scn-{seed:012d}", buf, w, h, len(frames), 10, "fpack")


def make_shotpool_video_row(seed: int) -> tuple:
    """Clip assembled from a SHARED pool of 60 shot base patterns —
    the planted near-duplicate structure for video dedup. Group
    ``g = seed // 3`` has three variants ``v = seed % 3`` with
    ``3 + v`` shots drawn as the arithmetic progression
    ``(17g + 5j) mod 60``: variants of one group share their first 3
    shots, and groups congruent mod 5 overlap in a structured way
    (17·(g−g') lands back on the step-5 progression iff g ≡ g' mod 5).
    Within a shot, frames drift by exactly +3/channel (the scene-cut
    corpus rule), so shot boundaries are detectable by the same
    integer threshold."""
    w = h = 16
    g, v = divmod(seed, 3)
    pool_ids = [(17 * g + 5 * j) % 60 for j in range(3 + v)]
    frames = []
    for pid in pool_ids:
        base = gen_pixels(1000 + pid * 977, w, h).astype(np.int64)
        base = base * 200 // 256
        for k in range(3):
            frames.append((base + 3 * k).astype(np.uint8))
    buf = encode_fpack(frames, fps=10)
    return (f"dup-{seed:012d}", buf, w, h, len(frames), 10, "fpack")


def shotpool_video_table(spark: SparkSession, n: int = 240, seed: int = 0,
                         partitions: int | None = None) -> DataFrame:
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "bytes", "w", "h", "n_frames", "fps", "fmt"]
        for pdf in batches:
            rows = [make_shotpool_video_row(int(i) + seed)
                    for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=cols)

    return spark.range(n).repartition(parts).mapInPandas(gen, VIDEO_SCHEMA)


def scene_video_table(spark: SparkSession, n: int = 300, seed: int = 42,
                      partitions: int | None = None) -> DataFrame:
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "bytes", "w", "h", "n_frames", "fps", "fmt"]
        for pdf in batches:
            rows = [make_scene_video_row(int(i) * 2 + seed)
                    for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=cols)

    return spark.range(n).repartition(parts).mapInPandas(gen, VIDEO_SCHEMA)


def video_table(spark: SparkSession, n: int = 200, seed: int = 66,
                partitions: int | None = None,
                fmts: tuple = VFMTS) -> DataFrame:
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "bytes", "w", "h", "n_frames", "fps", "fmt"]
        for pdf in batches:
            rows = [make_video_row(int(i) * 2 + seed, fmts) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=cols)

    return spark.range(n).repartition(parts).mapInPandas(gen, VIDEO_SCHEMA)


def _noise_rgb(seed: int, w: int, h: int) -> np.ndarray:
    """Hash-noise texture (NOT the smooth sinusoids): every 8×8 block
    is effectively unique, so a cyclic shift has exactly one zero-SAD
    match — what block-matching ground truth needs."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.int64)
    out = []
    for c in range(3):
        v = (xx * 2654435761 + yy * 40503 + seed * 97 + c * 131) \
            & 0xFFFFFFFF
        out.append(((v >> 7) ^ v) % 256)
    return np.stack(out, axis=-1).astype(np.uint8)


def make_motion_video_row(seed: int) -> tuple:
    """Pure-translation clip for motion estimation: frame k is the
    base noise texture CYCLICALLY rolled by (k·vy, k·vx), with the
    per-clip velocity (vx, vy) ∈ [−2, 2]² keyed by seed — so the
    inter-frame motion field is exactly (vx, vy) for every block
    whose source region does not cross the wrap seam."""
    w = 32 + 8 * (seed % 2)
    h = 24
    n_frames = 6
    vx = (seed // 2) % 5 - 2
    vy = (seed // 10) % 5 - 2
    base = _noise_rgb(seed * 101 + 13, w, h)
    frames = [np.roll(base, (k * vy, k * vx), axis=(0, 1))
              for k in range(n_frames)]
    buf = encode_fpack(frames, fps=10)
    return (f"mot-{seed:012d}", buf, w, h, n_frames, 10, "fpack")


def motion_video_table(spark: SparkSession, n: int = 200, seed: int = 42,
                       partitions: int | None = None) -> DataFrame:
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "bytes", "w", "h", "n_frames", "fps", "fmt"]
        for pdf in batches:
            rows = [make_motion_video_row(int(i) * 2 + seed)
                    for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=cols)

    return spark.range(n).repartition(parts).mapInPandas(gen, VIDEO_SCHEMA)
