"""Video payload operators — frame sampling + per-frame features over
the (media_id, bytes, …, fmt) video table, with the same quarantine
discipline as images/audio (problem* sinks, OsmJoin.java:111-113).

ALL four containers decode for real: ``fpack`` (seekable synth
container, synth/video.py), ``avi`` (MJPEG-in-AVI, RIFF chunk walk +
idx1 O(1) seek, synth/avi.py), ``mp4`` (ISO-BMFF 'jpeg' Photo-JPEG
track, sample tables stsd/stts/stsc/stsz/stco, synth/mp4.py) and
``mkv`` (Matroska V_MJPEG, EBML structural walk + Cues, synth/mkv.py).
``webm`` is the SAME EBML grammar parsed by the mkv reader, but its
codec set (VP8/VP9/AV1) needs a DSP decoder we don't carry — the
parser raises NotImplementedError on the codec id, so webm rows
quarantine with the container fully validated (honest partial support,
same policy as avc1-in-mp4). Replaces round-1's pure
``sample_video_frames`` stub (operators/images.py), which survives only
as a thin deprecated wrapper.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm2geojson_spark.synth.avi import avi_frame, avi_frame_index, avi_header
from osm2geojson_spark.synth.images import encode_ppm
from osm2geojson_spark.synth.mkv import mkv_frame, mkv_frame_index, mkv_header
from osm2geojson_spark.synth.mp4 import mp4_frame, mp4_frame_index, mp4_header
from osm2geojson_spark.synth.video import fpack_frame, fpack_header


def _open_clip(buf: bytes, fmt: str):
    """(n_frames, fps, get_frame); NotImplementedError/ValueError →
    quarantine row upstream. Every container gives O(1) per-frame access
    after one header/index parse, so every-n sampling touches ONLY
    sampled frames — the property that matters when a clip is thousands
    of frames and you sample a handful."""
    if fmt == "fpack":
        n, _, _, fps, _ = fpack_header(buf)
        return n, fps, lambda k: fpack_frame(buf, k)
    if fmt == "avi":
        n, _, _, fps = avi_header(buf)
        idx = avi_frame_index(buf)
        if len(idx) != n:
            raise ValueError(f"AVI header says {n} frames, index has {len(idx)}")
        return n, fps, lambda k: avi_frame(buf, k, idx)
    if fmt == "mp4":
        n, _, _, fps = mp4_header(buf)
        idx = mp4_frame_index(buf)
        if len(idx) != n:
            raise ValueError(f"mp4 stts says {n} samples, index has {len(idx)}")
        return n, fps, lambda k: mp4_frame(buf, k, idx)
    if fmt in ("mkv", "webm"):
        # one parser for both doctypes; real webm codecs raise here
        n, _, _, fps, _codec = mkv_header(buf)
        idx = mkv_frame_index(buf)
        if len(idx) != n:
            raise ValueError(f"mkv Duration says {n} frames, index has {len(idx)}")
        return n, fps, lambda k: mkv_frame(buf, k, idx)
    raise ValueError(f"unknown fmt '{fmt}'")


def sample_frames(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Every n-th frame (always including frame 0) re-encoded as lossless
    ppm — the frame-sampling shape for vision-training pipelines. One
    output row per sampled frame; undecodable rows yield a single
    quarantine row (frame_idx -1, error set)."""
    out_schema = "media_id string, frame_idx int, frame binary, error string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                try:
                    n, _, get_frame = _open_clip(bytes(t.bytes), t.fmt)
                    for k in range(0, n, every_n):
                        rows.append((t.media_id, k,
                                     encode_ppm(get_frame(k)), None))
                except Exception as ex:  # noqa: BLE001 — quarantine row
                    rows.append((t.media_id, -1, None,
                                 f"{type(ex).__name__}: {ex}"))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx",
                                              "frame", "error"])

    return df.select("media_id", "bytes", "fmt").mapInPandas(run, out_schema)


def video_stats(df: DataFrame) -> DataFrame:
    """Per-clip features from sampled frames: frame count, duration, mean
    luminance, and inter-frame luminance delta (scene-change proxy)."""
    out_schema = ("media_id string, fmt string, n_frames int, "
                  "duration_sec double, mean_lum double, "
                  "mean_frame_delta double, error string")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                try:
                    n, fps, get_frame = _open_clip(bytes(t.bytes), t.fmt)
                    lums = [float(get_frame(k).astype(np.float64).mean())
                            for k in range(n)]
                    deltas = [abs(b - a) for a, b in zip(lums, lums[1:])]
                    rows.append((t.media_id, t.fmt, n, n / float(fps),
                                 float(np.mean(lums)),
                                 float(np.mean(deltas)) if deltas else 0.0,
                                 None))
                except Exception as ex:  # noqa: BLE001
                    rows.append((t.media_id, t.fmt, None, None, None, None,
                                 f"{type(ex).__name__}: {ex}"))
            yield pd.DataFrame(rows, columns=["media_id", "fmt", "n_frames",
                                              "duration_sec", "mean_lum",
                                              "mean_frame_delta", "error"])

    return df.select("media_id", "bytes", "fmt").mapInPandas(run, out_schema)


def scene_cuts(df: DataFrame, thr_per_px: int = 100) -> DataFrame:
    """Scene-change (shot-boundary) detection: exact int64 sum of
    squared RGB deltas between consecutive frames; frame ``k`` starts a
    new scene iff ``d2 > thr_per_px * w*h*3`` (integer compare, no
    division). ONE sequential decode pass per clip inside the Arrow
    kernel — zero shuffle, the per-clip cost is the honest decode;
    undecodable clips quarantine as ``cut_at = -1`` with the error.

    The per-frame sampling shape a video-training pipeline needs before
    keyframe extraction: cuts partition a clip into shots, and shots —
    not raw frame indices — are the dedup/caption unit at 100 TB."""
    out_schema = "media_id string, cut_at int, d2 long, error string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                try:
                    n, _, get_frame = _open_clip(bytes(t.bytes), t.fmt)
                    prev = get_frame(0).astype(np.int64)
                    npix = prev.size
                    for k in range(1, n):
                        cur = get_frame(k).astype(np.int64)
                        d2 = int(((cur - prev) ** 2).sum())
                        if d2 > thr_per_px * npix:
                            rows.append((t.media_id, k, d2, None))
                        prev = cur
                except Exception as ex:  # noqa: BLE001 — quarantine row
                    rows.append((t.media_id, -1, None,
                                 f"{type(ex).__name__}: {ex}"))
            yield pd.DataFrame(rows, columns=["media_id", "cut_at",
                                              "d2", "error"])

    return df.select("media_id", "bytes", "fmt").mapInPandas(run, out_schema)


def shot_signatures(df: DataFrame, thr_per_px: int = 100) -> DataFrame:
    """Shot-level video signatures: detect cuts with the scene_cuts
    integer threshold, then emit ONE row per shot with the 64-bit
    perceptual hash (synth.images.phash64) of the shot's FIRST frame —
    all in the same single sequential decode pass, zero shuffle. The
    shot, not the clip or the raw frame, is the dedup unit at 100 TB:
    re-cut/extended/trimmed uploads share shots even when no two clips
    are byte- or even frame-count-equal. Undecodable clips quarantine
    as ``shot_idx = -1`` with the error."""
    from osm2geojson_spark.synth.images import phash64

    out_schema = ("media_id string, shot_idx int, start_frame int, "
                  "n_frames int, phash long, error string")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                try:
                    n, _, get_frame = _open_clip(bytes(t.bytes), t.fmt)
                    first = get_frame(0)
                    prev = first.astype(np.int64)
                    npix = prev.size
                    starts = [0]
                    hashes = [phash64(first)]
                    for k in range(1, n):
                        cur_u8 = get_frame(k)
                        cur = cur_u8.astype(np.int64)
                        if int(((cur - prev) ** 2).sum()) > thr_per_px * npix:
                            starts.append(k)
                            hashes.append(phash64(cur_u8))
                        prev = cur
                    bounds = starts + [n]
                    for s, (st, hv) in enumerate(zip(starts, hashes)):
                        rows.append((t.media_id, s, st, bounds[s + 1] - st,
                                     hv, None))
                except Exception as ex:  # noqa: BLE001 — quarantine row
                    rows.append((t.media_id, -1, None, None, None,
                                 f"{type(ex).__name__}: {ex}"))
            yield pd.DataFrame(rows, columns=["media_id", "shot_idx",
                                              "start_frame", "n_frames",
                                              "phash", "error"])

    return df.select("media_id", "bytes", "fmt").mapInPandas(run, out_schema)


def video_dup_pairs(shots: DataFrame, min_shared: int = 2,
                    max_bucket_size: int | None = None) -> DataFrame:
    """Near-duplicate video pairs from shot signatures: collapse each
    clip to its DISTINCT shot-phash set, equi-join the set with itself
    on phash (the only data-sized shuffle — the LSH-bucket discipline;
    ``max_bucket_size`` caps near-universal shots like black frames or
    channel idents), count shared phashes per ordered pair, and keep
    pairs sharing ≥ ``min_shared``. Jaccard is exact integer ppm:
    ``shared·10⁶ div (|A| + |B| − shared)`` — all values positive, so
    Spark ``div`` == DuckDB ``//``. Per-clip set sizes are a tiny
    aggregate, broadcast to both join sides."""
    from .dedup import cap_bucket_size

    sigs = (shots.where(F.col("error").isNull())
            .select("media_id", "phash").distinct())
    sigs = cap_bucket_size(sigs, ["phash"], max_bucket_size)
    counts = sigs.groupBy("media_id").agg(F.count("*").alias("n_shots"))
    pairs = (
        sigs.alias("a")
        .join(sigs.alias("b"),
              (F.col("a.phash") == F.col("b.phash"))
              & (F.col("a.media_id") < F.col("b.media_id")))
        .groupBy(F.col("a.media_id").alias("id_a"),
                 F.col("b.media_id").alias("id_b"))
        .agg(F.count("*").alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
    ca = F.broadcast(counts).alias("ca")
    cb = F.broadcast(counts).alias("cb")
    return (
        pairs
        .join(ca, F.col("id_a") == F.col("ca.media_id"))
        .join(cb, F.col("id_b") == F.col("cb.media_id"))
        .select(
            "id_a", "id_b", "shared",
            F.expr("shared * 1000000 div "
                   "(ca.n_shots + cb.n_shots - shared)").alias("jaccard_ppm"),
        )
    )


def block_match_py(prev: "np.ndarray", cur: "np.ndarray",
                   block: int, search: int):
    """Full-search SAD block matching between two RGB frames — the
    shared deterministic kernel (engine AND pyref call THIS, the
    different machinery is everything around it). For each
    non-overlapping ``block``² tile of ``cur``, the displacement
    (dy, dx) in the ±``search`` window minimizing the int64 RGB SAD
    against ``prev``, candidates scanned dy-then-dx ascending with
    strict-less updates — the (sad, dy, dx) lexicographic tie ladder.
    Candidates whose source region leaves the frame are skipped.
    Returns [(by, bx, dy, dx, sad)] in block raster order."""
    import numpy as np

    h, w = cur.shape[0], cur.shape[1]
    p = prev.astype(np.int64)
    c = cur.astype(np.int64)
    out = []
    for by in range(0, h - block + 1, block):
        for bx in range(0, w - block + 1, block):
            blk = c[by:by + block, bx:bx + block]
            best = None
            for dy in range(-search, search + 1):
                sy = by - dy
                if sy < 0 or sy + block > h:
                    continue
                for dx in range(-search, search + 1):
                    sx = bx - dx
                    if sx < 0 or sx + block > w:
                        continue
                    sad = int(np.abs(
                        blk - p[sy:sy + block, sx:sx + block]).sum())
                    if best is None or sad < best[0]:
                        best = (sad, dy, dx)
            out.append((by, bx, best[1], best[2], best[0]))
    return out


def motion_vectors(df: DataFrame, block: int = 8,
                   search: int = 3) -> DataFrame:
    """Per-frame dominant motion vector via full-search block
    matching (the MPEG motion-estimation primitive, exact int64):
    for every consecutive frame pair, match all blocks
    (:func:`block_match_py`), then the frame's vector is the MODE
    over block vectors (ties → lexicographic smallest (dy, dx)).
    Rows: (media_id, frame_idx, vx, vy, n_blocks, agree, sad_sum) —
    frame_idx is the LATER frame; agree = blocks voting for the
    winner; sad_sum = Σ best SADs (0 for pure translation).
    Undecodable clips quarantine as frame_idx −1 + error."""
    out_schema = ("media_id string, frame_idx int, vx int, vy int, "
                  "n_blocks int, agree int, sad_sum long, error string")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                try:
                    n, _, get_frame = _open_clip(bytes(t.bytes), t.fmt)
                    prev = get_frame(0)
                    for k in range(1, n):
                        cur = get_frame(k)
                        bm = block_match_py(prev, cur, block, search)
                        votes = Counter((dy, dx)
                                        for _, _, dy, dx, _ in bm)
                        (dy, dx), agree = min(
                            votes.items(),
                            key=lambda it: (-it[1], it[0]))
                        rows.append((t.media_id, k, int(dx), int(dy),
                                     len(bm), int(agree),
                                     sum(b[4] for b in bm), None))
                        prev = cur
                except Exception as ex:  # noqa: BLE001 — quarantine
                    rows.append((t.media_id, -1, None, None, None,
                                 None, None, f"{type(ex).__name__}: {ex}"))
            yield pd.DataFrame(rows, columns=[
                "media_id", "frame_idx", "vx", "vy", "n_blocks",
                "agree", "sad_sum", "error"])

    return df.select("media_id", "bytes", "fmt").mapInPandas(
        run, out_schema)
