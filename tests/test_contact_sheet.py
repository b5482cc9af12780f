"""Contact-sheet pages (operators/images.contact_sheet).

Pins (1) engine == pyref twin md5s on a real-codec corpus slice
(bytes-level agreement through two different thumbnail summation
routes), (2) partition invariance of the global slot order, (3) page
arithmetic (count/tail/dims)."""

from osm2geojson_spark.operators.images import contact_sheet
from osm2geojson_spark.synth.images import FMTS_TIFF, images_table


def test_matches_pyref_and_pages(spark):
    from osm2geojson_spark import pyref

    imgs = images_table(spark, n=30, seed=9, fmts=FMTS_TIFF)
    got = sorted(
        (r["page"], r["n_images"], r["w_px"], r["h_px"], r["md5"])
        for r in contact_sheet(imgs, cols=4, rows=4, cell=8).collect())
    exp = sorted(pyref.ref_contact_sheet(n=30, seed=9, cols=4, rows=4,
                                         cell=8))
    assert got == exp
    assert [g[1] for g in got] == [16, 14]  # 30 images → full + tail
    assert all(g[2] == 32 and g[3] == 32 for g in got)


def test_partition_invariance(spark):
    imgs = images_table(spark, n=20, seed=9, fmts=FMTS_TIFF)
    a = sorted((r["page"], r["md5"]) for r in
               contact_sheet(imgs.repartition(1), 4, 4, 8).collect())
    b = sorted((r["page"], r["md5"]) for r in
               contact_sheet(imgs.repartition(13), 4, 4, 8).collect())
    assert a == b
