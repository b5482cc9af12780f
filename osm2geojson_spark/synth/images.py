"""Deterministic image+caption table synthesizer (BASELINE.json input_hint).

Schema: (image_id string, bytes binary, w int, h int, fmt string,
caption string, phash long) — plus derived lon/lat so spatial joins are
well-defined (clustered hot cells for skew, like the reference planet's
dense urban extracts).

Codecs are self-contained numpy (no Pillow in this container — SURVEY.md
§7 env facts): ``ppm`` (P6 binary, lossless), ``bmp`` (24-bit bottom-up,
lossless), ``qz6`` (our deterministic lossy stand-in: 6-bit uniform
quantization + zlib — reconstruction error ≤ 2/channel, PSNR ≈ 47 dB, so
the ≥40 dB invariant is meaningful without a jpeg library). Real
JPEG/WebP decode is stubbed behind NotImplementedError in
operators/images.py with the Spark plumbing fully real.

Everything is keyed on the 64-bit row id: same rows at any parallelism.
Generation runs distributed via mapInPandas over spark.range (numpy per
Arrow batch; the per-image encode loop is numpy-per-image, standard for
variable-size binary payloads).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

IMG_SCHEMA = ("image_id string, bytes binary, w int, h int, fmt string, "
              "caption string, phash long, lon double, lat double")

FMTS = ("ppm", "bmp", "qz6", "png")
# 5-format rotation incl. real baseline JPEG (synth/jpeg.py). Kept out of
# the default FMTS so the round-1/2 bench tables and the phash literal
# oracle stay byte-stable; the catalog's image_validate runs on FMTS_ALL.
FMTS_JPEG = FMTS + ("jpg",)
# 6-format rotation: + real lossless WebP/VP8L (synth/webp.py) — every
# image format the engine knows is now a real codec, zero stubs.
FMTS_ALL = FMTS_JPEG + ("webp",)
# 7-format rotation: + HEIF with the standard JPEG coding item
# (synth/heif.py — real ISO-BMFF meta/iinf/iloc walk; hvc1/av01 gate).
FMTS_HEIF = FMTS_ALL + ("heif",)
# 8-format rotation: + GIF (synth/gif.py — real variable-width LZW both
# directions, interlace, local palettes, GCE transparency, animation
# compositing; encoder quantizes to the deterministic 3-3-2 palette so
# like jpg it is lossy-by-format and idempotent on re-encode).
FMTS_GIF = FMTS_HEIF + ("gif",)
# 9-format rotation: + baseline TIFF (synth/tiff.py — II/MM IFD walk,
# strips, PackBits + TIFF-flavor LZW w/ predictor 2; lossless, encoder
# round-robins compression/byte-order from pixel content).
FMTS_TIFF = FMTS_GIF + ("tiff",)
# the byte-exact round-trip subset — letterbox bars must survive the
# codec EXACTLY for border detection (qz6/jpg/gif/heif quantize)
FMTS_LOSSLESS = ("ppm", "bmp", "png", "webp", "tiff")

_CAPTION_WORDS = [
    "aerial", "view", "of", "the", "old", "harbor", "market", "square",
    "bridge", "river", "park", "station", "cathedral", "at", "sunset",
    "dawn", "night", "winter", "crowded", "empty",
]


# ------------------------------------------------------------------ codecs
def encode_ppm(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    return b"P6\n%d %d\n255\n" % (w, h) + px.astype(np.uint8).tobytes()


def decode_ppm(buf: bytes) -> np.ndarray:
    if not buf.startswith(b"P6"):
        raise ValueError("not a P6 ppm")
    parts = buf.split(b"\n", 3)
    w, h = (int(x) for x in parts[1].split())
    px = np.frombuffer(parts[3], dtype=np.uint8, count=w * h * 3)
    return px.reshape(h, w, 3)


def encode_bmp(px: np.ndarray) -> bytes:
    """Minimal 24-bit BMP: BGR, rows bottom-up, 4-byte padded."""
    h, w, _ = px.shape
    row = w * 3
    pad = (4 - row % 4) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):
        body += px[y, :, ::-1].astype(np.uint8).tobytes() + b"\x00" * pad
    size = 54 + len(body)
    header = (b"BM" + size.to_bytes(4, "little") + b"\x00" * 4
              + (54).to_bytes(4, "little")
              + (40).to_bytes(4, "little")
              + w.to_bytes(4, "little") + h.to_bytes(4, "little")
              + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
              + b"\x00" * 24)
    return bytes(header) + bytes(body)


def decode_bmp(buf: bytes) -> np.ndarray:
    if not buf.startswith(b"BM"):
        raise ValueError("not a BMP")
    off = int.from_bytes(buf[10:14], "little")
    w = int.from_bytes(buf[18:22], "little")
    h = int.from_bytes(buf[22:26], "little")
    row = w * 3
    pad = (4 - row % 4) % 4
    px = np.empty((h, w, 3), dtype=np.uint8)
    p = off
    for y in range(h - 1, -1, -1):
        px[y] = np.frombuffer(buf[p:p + row], dtype=np.uint8).reshape(w, 3)[:, ::-1]
        p += row + pad
    return px


def encode_qz6(px: np.ndarray) -> bytes:
    """Deterministic lossy: 6-bit quantization + zlib (level fixed)."""
    h, w, _ = px.shape
    q = ((px.astype(np.uint32) * 63 + 127) // 255).astype(np.uint8)  # round-to-nearest
    return b"QZ6\n%d %d\n" % (w, h) + zlib.compress(q.tobytes(), 6)


def decode_qz6(buf: bytes) -> np.ndarray:
    if not buf.startswith(b"QZ6"):
        raise ValueError("not a QZ6")
    parts = buf.split(b"\n", 2)
    w, h = (int(x) for x in parts[1].split())
    q = np.frombuffer(zlib.decompress(parts[2]), dtype=np.uint8, count=w * h * 3)
    # dequant to bin centers: round(q * 255 / 63)
    px = ((q.astype(np.uint16) * 255 + 31) // 63).clip(0, 255).astype(np.uint8)
    return px.reshape(h, w, 3)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (len(data).to_bytes(4, "big") + typ + data
            + zlib.crc32(typ + data).to_bytes(4, "big"))


def encode_png(px: np.ndarray) -> bytes:
    """Pure-stdlib PNG (8-bit RGB, color type 2, no interlace): zlib IDAT
    of filter-0 scanlines + per-chunk CRC32. Lossless — replaces the
    round-1 NotImplementedError stub for fmt=png."""
    h, w, _ = px.shape
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    lines = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    lines[:, 1:] = px.astype(np.uint8).reshape(h, w * 3)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(lines.tobytes(), 6))
            + _png_chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(buf: bytes) -> np.ndarray:
    """Pure-stdlib PNG decoder for 8-bit RGB non-interlaced images.
    Validates chunk CRCs; undoes ALL five scanline filters (0 None,
    1 Sub via per-channel cumsum, 2 Up vectorized, 3 Average / 4 Paeth
    sequential) so externally-produced baseline PNGs decode too."""
    if not buf.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos, w, h, idat = 8, None, None, b""
    while pos + 12 <= len(buf):
        ln = int.from_bytes(buf[pos:pos + 4], "big")
        typ = buf[pos + 4:pos + 8]
        data = buf[pos + 8:pos + 8 + ln]
        crc = int.from_bytes(buf[pos + 8 + ln:pos + 12 + ln], "big")
        if zlib.crc32(typ + data) != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            if tuple(data[8:13]) != (8, 2, 0, 0, 0):
                raise ValueError(
                    "unsupported PNG (need 8-bit RGB, deflate, no interlace)")
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("PNG without IHDR")
    raw = zlib.decompress(idat)
    stride = w * 3
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data size mismatch")
    arr = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    filters = arr[:, 0]
    # fast path — the overwhelmingly common encoders (incl. ours) emit
    # filter 0 (or 0/2) only; both undo as pure numpy (no per-row loop)
    if (filters == 0).all():
        return arr[:, 1:].copy().reshape(h, w, 3)
    if np.isin(filters, (0, 2)).all():
        # Up-filter runs add the prior reconstructed row: within a run of
        # 2s this is a vertical cumsum; filter-0 rows reset the base
        data = arr[:, 1:].astype(np.int64)
        grp = np.cumsum(filters == 0)  # row-group id per filter-0 reset
        out2 = np.zeros_like(data)
        for g in np.unique(grp):
            m = grp == g
            out2[m] = np.cumsum(data[m], axis=0) % 256
        return out2.astype(np.uint8).reshape(h, w, 3)
    out = np.zeros((h, stride), dtype=np.int64)
    for y in range(h):
        f = int(arr[y, 0])
        line = arr[y, 1:].astype(np.int64)
        prior = out[y - 1] if y else np.zeros(stride, dtype=np.int64)
        if f == 0:
            rec = line
        elif f == 1:  # Sub: recon = per-channel cumsum mod 256
            rec = (line.reshape(w, 3).cumsum(axis=0) % 256).reshape(stride)
        elif f == 2:  # Up
            rec = (line + prior) % 256
        elif f in (3, 4):  # Average / Paeth: inherently sequential in x
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                left = rec[x - 3] if x >= 3 else 0
                ul = prior[x - 3] if x >= 3 else 0
                pred = ((left + prior[x]) >> 1) if f == 3 else \
                    _paeth(int(left), int(prior[x]), int(ul))
                rec[x] = (line[x] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = rec
    return out.astype(np.uint8).reshape(h, w, 3)


def _encode_webp(px: np.ndarray) -> bytes:
    from .webp import encode_webp

    return encode_webp(px)


def _decode_webp(buf: bytes) -> np.ndarray:
    from .webp import decode_webp

    return decode_webp(buf)


def _encode_jpg(px: np.ndarray) -> bytes:
    """Canonical jpg re-encode (4:4:4, q95): deterministic from pixels
    alone, so validate_images' decode→re-encode→decode PSNR check stays a
    pure function of the bytes. 4:2:0 originals are produced by
    make_image_row with a seed-dependent subsampling choice."""
    from .jpeg import encode_jpeg

    return encode_jpeg(px, quality=95, subsampling="444")


def _decode_jpg(buf: bytes) -> np.ndarray:
    from .jpeg import decode_jpeg

    return decode_jpeg(buf)


def _encode_heif(px: np.ndarray) -> bytes:
    from .heif import encode_heif

    return encode_heif(px)


def _decode_heif(buf: bytes) -> np.ndarray:
    from .heif import decode_heif

    return decode_heif(buf)


def _encode_gif(px: np.ndarray) -> bytes:
    from .gif import encode_gif

    return encode_gif(px)


def _decode_gif(buf: bytes) -> np.ndarray:
    from .gif import decode_gif

    return decode_gif(buf)


def _encode_tiff(px: np.ndarray) -> bytes:
    from .tiff import encode_tiff

    return encode_tiff(px)


def _decode_tiff(buf: bytes) -> np.ndarray:
    from .tiff import decode_tiff

    return decode_tiff(buf)


ENCODERS = {"ppm": encode_ppm, "bmp": encode_bmp, "qz6": encode_qz6,
            "png": encode_png, "jpg": _encode_jpg, "webp": _encode_webp,
            "heif": _encode_heif, "gif": _encode_gif,
            "tiff": _encode_tiff}
DECODERS = {"ppm": decode_ppm, "bmp": decode_bmp, "qz6": decode_qz6,
            "png": decode_png, "jpg": _decode_jpg, "webp": _decode_webp,
            "heif": _decode_heif, "gif": _decode_gif,
            "tiff": _decode_tiff}


# ------------------------------------------------------------------ pixels
def gen_pixels(seed: int, w: int, h: int) -> np.ndarray:
    """Smooth deterministic test pattern (sinusoid mix keyed on seed) —
    smooth content keeps quantization-noise PSNR meaningful."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    s = np.float64(seed % 997 + 1)
    r = 127.5 + 127.5 * np.sin(xx / (3 + s % 7) + s)
    g = 127.5 + 127.5 * np.sin(yy / (2 + s % 5) + 2 * s)
    b = 127.5 + 127.5 * np.sin((xx + yy) / (4 + s % 11) + 3 * s)
    return np.stack([r, g, b], axis=-1).round().clip(0, 255).astype(np.uint8)


def phash64(px: np.ndarray) -> int:
    """64-bit perceptual hash: grayscale → 8x8 mean-pool → above-median
    bits. Same public construction as average-hash (aHash)."""
    g = px.astype(np.float64).mean(axis=2)
    h, w = g.shape
    # crop to multiples of 8 then mean-pool
    g = g[: h - h % 8 or h, : w - w % 8 or w]
    bh, bw = g.shape[0] // 8, g.shape[1] // 8
    pooled = g[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    med = np.median(pooled)
    bits = (pooled > med).ravel()
    v = 0
    for i, b in enumerate(bits):
        if b:
            v |= 1 << i
    return v - (1 << 64) if v >= (1 << 63) else v


def caption_for(seed: int) -> str:
    n = 4 + seed % 5
    idx = [(seed * (i + 3) * 2654435761 >> 7) % len(_CAPTION_WORDS) for i in range(n)]
    return " ".join(_CAPTION_WORDS[i] for i in idx)


def _coords_for(seed: int) -> tuple[float, float]:
    """Hot-cell skew: 30% of images cluster into 3 'cities'."""
    h1 = (seed * 2654435761) % 1_000_000
    if h1 % 10 < 3:
        city = h1 % 3
        lon = city * 40.0 - 60.0 + (h1 % 10_000) / 10_000.0
        lat = city * 20.0 - 10.0 + ((seed * 40503) % 10_000) / 10_000.0
    else:
        lon = (seed * 2654435761 % 360_000_000) / 1_000_000.0 - 180.0
        lat = (seed * 2246822519 % 170_000_000) / 1_000_000.0 - 85.0
    return lon, lat


def make_image_row(seed: int, fmts: tuple = FMTS, exif: bool = False) -> tuple:
    w = 16 + 8 * (seed % 7)          # 16..64, multiple of 8
    h = 16 + 8 * ((seed // 7) % 7)
    # seeds from images_table are always even (i*2 + even base): a plain
    # seed % 4 over even seeds would only ever hit 2 of the 4 fmts
    fmt = fmts[(seed >> 1) % len(fmts)]
    px = gen_pixels(seed, w, h)
    if fmt == "jpg":
        # originals alternate 4:2:0 / 4:4:4 by seed so BOTH decode paths
        # run in every driver-visible catalog query and bench
        from .jpeg import encode_jpeg

        buf = encode_jpeg(px, quality=90,
                          subsampling="420" if (seed >> 2) & 1 else "444")
        if exif and seed % 5 != 2:
            # 4 in 5 jpg rows carry a real Exif APP1 (both byte orders);
            # the rest exercise the no-metadata path — mod 5 is coprime
            # with the mod-8 orientation formula so no orientation class
            # is wiped out; the DuckDB oracle replays the same gate
            from .exif import attach_exif_app1, exif_app1_for

            buf = attach_exif_app1(buf, exif_app1_for(seed, w, h))
    else:
        buf = ENCODERS[fmt](px)
    # phash is computed on the DECODED pixels (lossy fmt → lossy phash),
    # so validate() can recompute it bit-identically from bytes alone
    ph = phash64(DECODERS[fmt](buf))
    lon, lat = _coords_for(seed)
    return (f"img-{seed:012d}", buf, w, h, fmt, caption_for(seed), ph, lon, lat)


def make_letterboxed_row(seed: int) -> tuple:
    """Deterministic letterbox/pillarbox variant: black bars of 0-3 px
    per side (derived from seed bits) around the usual sinusoid
    pattern, encoded with a LOSSLESS codec so the bar boundary is
    byte-exact. Same row shape as :func:`make_image_row`."""
    s = seed >> 1  # table seeds are always even — use the full entropy
    w = 16 + 8 * (s % 7)
    h = 16 + 8 * ((s // 7) % 7)
    top, bottom = s % 4, (s // 4) % 4
    left, right = (s // 16) % 4, (s // 64) % 4
    fmt = FMTS_LOSSLESS[s % len(FMTS_LOSSLESS)]
    inner = gen_pixels(seed, w - left - right, h - top - bottom)
    px = np.zeros((h, w, 3), dtype=np.uint8)
    px[top:h - bottom, left:w - right, :] = inner
    buf = ENCODERS[fmt](px)
    ph = phash64(DECODERS[fmt](buf))
    lon, lat = _coords_for(seed)
    return (f"lbx-{seed:012d}", buf, w, h, fmt, caption_for(seed), ph,
            lon, lat)


def letterboxed_images_table(spark: SparkSession, n: int = 300,
                             seed: int = 42,
                             partitions: int | None = None) -> DataFrame:
    """Distributed deterministic letterboxed corpus (lossless codecs)."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash",
                "lon", "lat"]
        for pdf in batches:
            rows = [make_letterboxed_row(int(i) * 2 + seed)
                    for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=cols)

    return spark.range(n).repartition(parts).mapInPandas(gen, IMG_SCHEMA)


def images_table(spark: SparkSession, n: int = 1000, seed: int = 42,
                 partitions: int | None = None,
                 fmts: tuple = FMTS, exif: bool = False) -> DataFrame:
    """Distributed deterministic generation: spark.range(n) → mapInPandas."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash", "lon", "lat"]
        for pdf in batches:
            rows = [make_image_row(int(i) * 2 + seed, fmts, exif=exif)
                    for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=cols)

    return spark.range(n).repartition(parts).mapInPandas(gen, IMG_SCHEMA)
