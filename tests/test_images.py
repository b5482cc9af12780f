"""M4 image-payload invariants (BASELINE.json input_hint):
decoded-pixel fidelity (lossless exact; lossy PSNR ≥ 40 dB), phash
stability, caption equality, quarantine on corrupt rows, determinism."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm2geojson_spark.operators.images import (
    image_stats,
    phash_near_dup_pairs,
    psnr,
    quarantine_split,
    resize_images,
    sample_video_frames,
    validate_images,
)
from osm2geojson_spark.synth.images import (
    DECODERS,
    ENCODERS,
    decode_bmp,
    decode_ppm,
    decode_qz6,
    encode_bmp,
    encode_ppm,
    encode_qz6,
    gen_pixels,
    images_table,
    phash64,
)


# ------------------------------------------------------------ codec units
def test_ppm_roundtrip_exact():
    px = gen_pixels(7, 24, 16)
    assert np.array_equal(decode_ppm(encode_ppm(px)), px)


def test_bmp_roundtrip_exact():
    px = gen_pixels(11, 20, 12)  # w*3 not divisible by 4 → padding path
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


def test_qz6_lossy_psnr():
    px = gen_pixels(13, 64, 64)
    rec = decode_qz6(encode_qz6(px))
    assert rec.shape == px.shape
    assert psnr(px, rec) >= 40.0
    assert int(np.abs(rec.astype(int) - px.astype(int)).max()) <= 3


def test_qz6_idempotent():
    """Re-encoding already-quantized pixels is lossless (stable fixpoint),
    so validate()'s decode→re-encode→decode PSNR is ∞ for qz6 rows."""
    px = decode_qz6(encode_qz6(gen_pixels(17, 32, 32)))
    assert np.array_equal(decode_qz6(encode_qz6(px)), px)


def test_png_roundtrip_exact():
    from osm2geojson_spark.synth.images import decode_png, encode_png

    px = gen_pixels(23, 20, 12)
    buf = encode_png(px)
    assert buf.startswith(b"\x89PNG\r\n\x1a\n")
    assert np.array_equal(decode_png(buf), px)


def test_png_decoder_all_filter_types():
    """The decoder must undo filters 1-4 too (external PNGs use them):
    hand-build an IDAT with one scanline per filter type and compare with
    a straight reference reconstruction."""
    import zlib

    from osm2geojson_spark.synth.images import _png_chunk, decode_png

    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    h, w = px.shape[:2]
    stride = w * 3
    flat = px.reshape(h, stride).astype(np.int64)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    raw = bytearray()
    for y, f in enumerate([0, 1, 2, 3, 4]):
        prior = flat[y - 1] if y else np.zeros(stride, dtype=np.int64)
        line = bytearray([f])
        for x in range(stride):
            left = flat[y][x - 3] if x >= 3 else 0
            ul = prior[x - 3] if x >= 3 else 0
            pred = {0: 0, 1: left, 2: prior[x],
                    3: (left + prior[x]) >> 1,
                    4: paeth(int(left), int(prior[x]), int(ul))}[f]
            line.append(int((flat[y][x] - pred) % 256))
        raw += line
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    buf = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
           + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
           + _png_chunk(b"IEND", b""))
    assert np.array_equal(decode_png(buf), px)


def test_png_crc_corruption_detected():
    from osm2geojson_spark.synth.images import decode_png, encode_png

    buf = bytearray(encode_png(gen_pixels(29, 16, 16)))
    buf[40] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises(ValueError, match="CRC|size|filter|zlib|PNG"):
        decode_png(bytes(buf))


def test_validate_covers_png(spark, images):
    """fmt=png rows exist in the synth table and pass the full validate
    invariants with REAL decode (lossless → PSNR ∞)."""
    png_rows = validate_images(images.filter(F.col("fmt") == "png")).collect()
    assert png_rows, "synth table has no png rows"
    assert all(r["ok"] and r["phash_match"] for r in png_rows)
    assert all(r["psnr_db"] == float("inf") for r in png_rows)


def test_phash_deterministic_and_payload_sensitive():
    px = gen_pixels(19, 32, 32)
    assert phash64(px) == phash64(px.copy())
    other = gen_pixels(20, 32, 32)
    assert phash64(px) != phash64(other)


# ------------------------------------------------------------ spark layer
@pytest.fixture(scope="module")
def images(spark):
    df = images_table(spark, n=120, seed=42).cache()
    df.count()
    return df


def test_images_table_deterministic(spark, images):
    a = {r["image_id"]: (bytes(r["bytes"]), r["phash"], r["caption"])
         for r in images.collect()}
    b = {r["image_id"]: (bytes(r["bytes"]), r["phash"], r["caption"])
         for r in images_table(spark, n=120, seed=42).collect()}
    assert a == b


def test_validate_all_ok(images):
    v = validate_images(images).cache()
    good, bad = quarantine_split(v)
    assert bad.count() == 0
    rows = good.collect()
    assert len(rows) == 120
    assert all(r["phash_match"] and r["caption_ok"] for r in rows)
    assert all(r["psnr_db"] >= 40.0 for r in rows)
    lossless = [r for r in rows if r["fmt"] in ("ppm", "bmp")]
    assert lossless and all(r["psnr_db"] == float("inf") for r in lossless)


def test_validate_quarantines_corrupt_and_stub(spark, images):
    corrupt = images.limit(4).withColumn(
        "bytes", F.substring("bytes", 1, 10).cast("binary"))
    # mislabeled avif (ppm bytes): the REAL ISO-BMFF walk rejects them
    # with a parse error — still quarantined, never silently dropped
    avifish = images.limit(3).withColumn("fmt", F.lit("avif"))
    v = validate_images(corrupt.unionByName(avifish))
    good, bad = quarantine_split(v)
    assert good.count() == 0 and bad.count() == 7
    errs = [r["error"] for r in bad.collect()]
    assert all(e is not None for e in errs)
    assert any("malformed box" in e or "meta box" in e for e in errs)

    # structurally-valid avif: parses, then codec-gates on av01
    from osm2geojson_spark.synth.heif import encode_avif_gated
    from osm2geojson_spark.synth.images import gen_pixels

    real = spark.createDataFrame(
        [("a-1", bytearray(encode_avif_gated(gen_pixels(5, 16, 16))),
          16, 16, "avif", "cap", 0)],
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long")
    _, badr = quarantine_split(validate_images(real))
    assert "NotImplementedError" in badr.first()["error"]


def test_image_stats_and_resize(images):
    st = image_stats(images.limit(10)).collect()
    assert all(0 < r["mean_lum"] < 255 and r["n_px"] > 0 for r in st)
    th = resize_images(images.limit(10)).collect()
    for r in th:
        px = decode_ppm(bytes(r["thumb"]))
        assert px.shape == (8, 8, 3)


def test_video_stub_plumbing(images):
    out = sample_video_frames(images.limit(5)).collect()
    assert len(out) == 5
    assert all("NotImplementedError" in r["error"] for r in out)


def test_phash_near_dup_finds_planted_dup(spark, images):
    """A re-encoded (lossy) copy of a lossless image must be within
    hamming ≤ 6 of the original phash."""
    from osm2geojson_spark.synth.images import decode_ppm as dp

    src = [r for r in images.collect() if r["fmt"] == "ppm"][0]
    px = dp(bytes(src["bytes"]))
    lossy = ENCODERS["qz6"](px)
    dup = spark.createDataFrame(
        [("dup-0", lossy, src["w"], src["h"], "qz6", src["caption"],
          phash64(DECODERS["qz6"](lossy)), 0.0, 0.0)],
        images.schema)
    pairs = phash_near_dup_pairs(images.unionByName(dup)).collect()
    found = {(p["id_a"], p["id_b"]) for p in pairs}
    assert any(src["image_id"] in pair and "dup-0" in pair for pair in found)


def test_phash_near_dup_matches_pure_python(spark, images):
    """Value-exact twin for the rows-only image_phash_dedup query: the
    banded-LSH candidate generation + hamming filter recomputed in pure
    Python over the same stored phashes must match pair-for-pair."""
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in phash_near_dup_pairs(images, max_hamming=6).collect()}

    rows = [(r["image_id"], r["phash"] & ((1 << 64) - 1))
            for r in images.collect()]
    cand = set()
    for b in range(4):
        buckets: dict[int, list[str]] = {}
        for iid, h in rows:
            buckets.setdefault((h >> (16 * b)) & 0xFFFF, []).append(iid)
        for members in buckets.values():
            ms = sorted(members)
            for i in range(len(ms)):
                for j in range(i + 1, len(ms)):
                    cand.add((ms[i], ms[j]))
    hs = dict(rows)
    want = {}
    for a, b in cand:
        ham = bin(hs[a] ^ hs[b]).count("1")
        if ham <= 6:
            want[(a, b)] = ham
    assert got == want


def test_sharpness_flat_vs_noisy(spark):
    # flat image: Laplacian identically 0; checkerboard: maximal
    import numpy as np
    from osm2geojson_spark.operators.images import sharpness_scores
    from osm2geojson_spark.synth.images import ENCODERS

    flat = np.full((8, 8, 3), 77, np.uint8)
    yy, xx = np.mgrid[0:8, 0:8]
    checker = np.where(((xx + yy) % 2)[..., None] == 0, 0, 255) \
        .astype(np.uint8).repeat(3, axis=2).reshape(8, 8, 3)
    rows = [("flat", bytearray(ENCODERS["ppm"](flat)), "ppm"),
            ("checker", bytearray(ENCODERS["ppm"](checker)), "ppm"),
            ("broken", bytearray(b"not an image"), "ppm")]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    got = {r["image_id"]: r for r in sharpness_scores(df).collect()}
    assert got["flat"]["ok"] and got["flat"]["lap_sq_sum"] == 0
    assert got["flat"]["n_interior"] == 36
    # checker luma alternates 0 / 255000 -> |lap| = 8*255000 or 4+4 mix
    assert got["checker"]["ok"] and got["checker"]["lap_sq_sum"] > 0
    assert not got["broken"]["ok"] and got["broken"]["error"]
    assert got["broken"]["n_interior"] == 0


def test_sharpness_matches_pyref(spark):
    from osm2geojson_spark import pyref
    from osm2geojson_spark.operators.images import sharpness_scores
    from osm2geojson_spark.synth.images import FMTS_TIFF, images_table

    imgs = images_table(spark, n=40, seed=42, fmts=FMTS_TIFF)
    got = sorted(
        (r["image_id"], r["fmt"], r["n_interior"], r["lap_sum"],
         r["lap_sq_sum"])
        for r in sharpness_scores(imgs).collect())
    assert got == sorted(pyref.ref_sharpness(n=40, seed=42))


def test_sharpness_tiny_image_scores_zero(spark):
    import numpy as np
    from osm2geojson_spark.operators.images import sharpness_scores
    from osm2geojson_spark.synth.images import ENCODERS

    tiny = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    df = spark.createDataFrame(
        [("tiny", bytearray(ENCODERS["ppm"](tiny)), "ppm")],
        "image_id string, bytes binary, fmt string")
    (row,) = sharpness_scores(df).collect()
    assert row["ok"] and row["n_interior"] == 0 and row["lap_sq_sum"] == 0


def test_multimodal_dedup_bridges_modalities(spark):
    # two rows with near captions, a third near the second by phash
    # only: all three must land in ONE cluster (the cross-modal bridge)
    import numpy as np
    from osm2geojson_spark.operators.images import multimodal_dup_clusters
    from osm2geojson_spark.synth.images import ENCODERS, phash64

    base = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    near = base.copy()
    near[0, 0, 0] ^= 1  # 1-bit pixel change: phash-identical or near
    far = (base[::-1, ::-1] ^ 170)
    cap_a = "red car parked on a quiet street near the old market"
    cap_b = "red car parked on a quiet street near the new market"
    cap_c = "completely different words about mountains and snow leopards"
    rows = [
        ("img-a", bytearray(ENCODERS["ppm"](base)), 16, 16, "ppm", cap_a,
         phash64(base)),
        ("img-b", bytearray(ENCODERS["ppm"](far)), 16, 16, "ppm", cap_b,
         phash64(far)),
        ("img-c", bytearray(ENCODERS["ppm"](near)), 16, 16, "ppm", cap_c,
         phash64(near)),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, "
              "caption string, phash long")
    got = {r["id"]: r["cluster_id"]
           for r in multimodal_dup_clusters(df).collect()}
    # a~b via captions, a~c via phash -> one cluster rooted at img-a
    assert got == {"img-a": "img-a", "img-b": "img-a", "img-c": "img-a"}


def test_multimodal_dedup_matches_pyref(spark):
    from osm2geojson_spark import pyref
    from osm2geojson_spark.operators.images import multimodal_dup_clusters
    from osm2geojson_spark.synth.images import images_table

    imgs = images_table(spark, n=120, seed=42)
    got = sorted((r["id"], r["cluster_id"])
                 for r in multimodal_dup_clusters(imgs).collect())
    assert got == pyref.ref_multimodal_clusters(n=120, seed=42)
