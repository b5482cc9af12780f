from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from osm2geojson_spark.operators.bloom import (
    bloom_probe_expr,
    build_bloom,
    cms_counters,
    cms_estimate_expr,
)
from osm2geojson_spark.pyref import (
    ref_bloom_prune,
    ref_cms_counters,
    spark_xxhash64_long_lit,
)


def keys_df(spark, ks):
    return spark.createDataFrame(pd.DataFrame({"k": ks})).repartition(4)


def test_bloom_no_false_negatives_and_pyref_parity(spark):
    dim = [3, 17, 255, 4096, 77777]
    words = build_bloom(keys_df(spark, dim), "k", m_bits=1024, k_hashes=4)
    probe = list(range(0, 300)) + dim
    got = {r["k"]: r["hit"] for r in keys_df(spark, probe).select(
        "k", bloom_probe_expr(F.col("k"), words,
                              k_hashes=4).alias("hit")).collect()}
    want = {row[0]: row[1] for row in ref_bloom_prune(
        dim, [(k,) for k in probe], m_bits=1024, k_hashes=4)}
    assert got == want
    assert all(got[k] == 1 for k in dim)          # zero false negatives
    fp = sum(got[k] for k in range(300) if k not in dim)
    assert fp < 30                                # sane fp rate at m/n=200


def test_cms_counters_match_pyref_and_never_undercount(spark):
    ks = [i % 37 for i in range(2000)] + [5] * 500
    got = sorted((r["j"], r["h"], r["cnt"]) for r in
                 cms_counters(keys_df(spark, ks), "k", w=64,
                              d_rows=3).collect())
    assert got == ref_cms_counters(ks, w=64, d_rows=3)
    counters = {(j, h): c for j, h, c in got}
    ests = {r["k"]: r["est"] for r in
            keys_df(spark, list(range(37))).select(
                "k", cms_estimate_expr(F.col("k"), counters, w=64,
                                       d_rows=3).alias("est")).collect()}
    from collections import Counter

    true = Counter(ks)
    assert all(ests[k] >= true[k] for k in range(37))
    assert ests[5] >= 500 + 54


def test_hash_convention_pin(spark):
    df = spark.createDataFrame(pd.DataFrame({"k": [0, -1, 2**50 + 3]}))
    rows = df.select("k", F.xxhash64("k", F.lit(13)).alias("h")).collect()
    for r in rows:
        assert r["h"] == spark_xxhash64_long_lit(r["k"], 13)
