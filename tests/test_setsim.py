from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from osm2geojson_spark.operators.dedup import normalize_text, setsim_join
from osm2geojson_spark.pyref import ref_setsim, setsim_corpus


def docs_df(spark, docs):
    return spark.createDataFrame(
        pd.DataFrame(docs, columns=["doc_id", "text"])).repartition(4)


def test_lossless_vs_bruteforce_on_planted_corpus(spark):
    docs = setsim_corpus(120)
    got = sorted((r["id_a"], r["id_b"], r["inter"], r["jaccard_ppm"])
                 for r in setsim_join(docs_df(spark, docs),
                                      tau_ppm=700_000).collect())
    assert got == ref_setsim(docs, tau_ppm=700_000)
    assert len(got) == 30 * 6          # every within-group pair found


def test_lossless_on_adversarial_overlaps(spark):
    # crafted boundary cases around tau = 0.5: J = 1/3, 1/2, 3/5, 1
    docs = [
        (0, "a b c"), (1, "a b c"),            # J = 1
        (2, "a b x"),                          # vs 0: 2/4 = 0.5
        (3, "a y z"),                          # vs 0: 1/5 = 0.2
        (4, "a b c d e"), (5, "c d e f"),      # 3/6 = 0.5
        (6, "q"), (7, "q"),                    # singleton sets, J = 1
    ]
    got = sorted((r["id_a"], r["id_b"], r["jaccard_ppm"])
                 for r in setsim_join(docs_df(spark, docs),
                                      tau_ppm=500_000).collect())
    want = [(a, b, j) for a, b, _i, j in ref_setsim(docs,
                                                    tau_ppm=500_000)]
    assert got == want
    assert (0, 1, 1_000_000) in got and (6, 7, 1_000_000) in got
    assert (0, 2, 500_000) in got              # boundary pair kept
    assert all(p[:2] != (0, 3) for p in got)   # below threshold


def test_prefix_actually_prunes(spark):
    # the candidate join must see far fewer pairs than all-pairs: every
    # doc shares the universal token 'common', but it is the most
    # frequent token, so it never lands in any prefix at tau=0.8
    docs = [(i, f"common u{i} v{i} w{i}") for i in range(60)]
    out = setsim_join(docs_df(spark, docs), tau_ppm=800_000)
    assert out.count() == 0
    # sanity: normalization matches the operator's view
    df = docs_df(spark, docs).select(
        F.size(F.array_distinct(F.split(
            normalize_text(F.col("text")), " "))).alias("m"))
    assert df.agg(F.min("m")).collect()[0][0] == 4
