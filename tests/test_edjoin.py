"""FastSS deletion-neighborhood edit-distance join (operators/dedup).

Pins (1) exact parity with a brute-force all-pairs Levenshtein at
d = 1 and d = 2 on an adversarial mini-corpus (transpositions — the
classic 2-distance trap —, empty strings, exact dups, repeated
chars), (2) the deletion-variant generator's closed form counts,
(3) the d = 0 degenerate case (exact-dup join), (4) the skew cap."""

import pytest
from pyspark.sql import functions as F

from osm2geojson_spark.operators.dedup import (
    deletion_variants,
    edit_distance_join,
)

WORDS = ["kitten", "sitten", "sitting", "kitte", "kitten", "mitten",
         "banana", "bananna", "xy", "yx", "", "a", "aa", "aaa",
         "abcdef", "abdcef", "fedcba"]


def _lev(a, b):
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            cur = d[j]
            d[j] = min(d[j] + 1, d[j - 1] + 1,
                       prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return d[n]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        list(enumerate(WORDS)), "doc_id long, text string").cache()


@pytest.mark.parametrize("d", [0, 1, 2])
def test_matches_bruteforce(docs, d):
    got = {(r["id_a"], r["id_b"]): r["dist"]
           for r in edit_distance_join(docs, d=d).collect()}
    exp = {(i, j): _lev(WORDS[i], WORDS[j])
           for i in range(len(WORDS)) for j in range(i + 1, len(WORDS))
           if _lev(WORDS[i], WORDS[j]) <= d}
    assert got == exp


def test_variant_counts(spark):
    # |D_1("abcd")| = 1 + 4 distinct deletions; repeated chars collapse
    row = (spark.range(1)
           .select(F.lit("abcd").alias("s"))
           .select(F.size(deletion_variants("s", 1)).alias("n1"),
                   F.size(deletion_variants("s", 2)).alias("n2"))
           .collect()[0])
    assert row["n1"] == 5
    assert row["n2"] == 5 + 6  # C(4,2) two-deletion subsequences
    rep = (spark.range(1)
           .select(F.lit("aaaa").alias("s"))
           .select(F.size(deletion_variants("s", 2)).alias("n"))
           .collect()[0]["n"])
    assert rep == 3  # aaaa, aaa, aa


def test_bucket_cap_drops_hot_variant(spark):
    # 20 identical strings → one hot variant bucket; cap kills it
    df = spark.createDataFrame(
        [(i, "same") for i in range(20)], "doc_id long, text string")
    full = edit_distance_join(df, d=1).count()
    capped = edit_distance_join(df, d=1, max_bucket_size=5).count()
    assert full == 190 and capped == 0
