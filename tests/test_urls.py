"""URL canonicalization: policy pins + idempotence + dedup grouping."""

import pytest
from pyspark.sql import functions as F

from osm2geojson_spark.functions.urls import canonicalize_url, url_dedup

CASES = [
    # (raw, canonical)
    ("HTTP://WWW.Example.COM/", "http://example.com/"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("https://example.com:80/a", "https://example.com:80/a"),   # kept
    ("http://example.com:443/a", "http://example.com:443/a"),   # kept
    ("http://example.com/a/b///", "http://example.com/a/b"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com/p?b=2&a=1", "http://example.com/p?a=1&b=2"),
    ("http://example.com/p?utm_source=x&utm_medium=y", "http://example.com/p"),
    ("http://example.com/p?utm_source=x&z=9&a=1#frag", "http://example.com/p?a=1&z=9"),
    ("http://example.com/p#only-frag", "http://example.com/p"),
    ("HTTPS://WWW.WWW-not.com/x", "https://www-not.com/x"),     # one www. label
]


def test_policy_table(spark):
    df = spark.createDataFrame([(i, r) for i, (r, _) in enumerate(CASES)],
                               "i long, url string")
    got = {r["i"]: r["c"] for r in
           df.select("i", canonicalize_url(F.col("url")).alias("c")).collect()}
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, (raw, got[i], want)


def test_idempotent(spark):
    df = spark.createDataFrame([(i, r) for i, (r, _) in enumerate(CASES)],
                               "i long, url string")
    once = df.select("i", canonicalize_url(F.col("url")).alias("url"))
    twice = once.select("i", canonicalize_url(F.col("url")).alias("c"))
    assert ({r["i"]: r["url"] for r in once.collect()}
            == {r["i"]: r["c"] for r in twice.collect()})


def test_url_dedup_groups(spark):
    rows = [(1, "HTTP://A.com/x/"), (2, "http://a.com/x"),
            (3, "http://a.com/x?utm_source=t"), (4, "http://b.com/y")]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r["canon_url"]: (r["keeper_id"], r["n_dups"])
           for r in url_dedup(df).collect()}
    assert got == {"http://a.com/x": (1, 3), "http://b.com/y": (4, 1)}


def test_idempotent_hypothesis(spark):
    # property: canonicalize(canonicalize(u)) == canonicalize(u) for
    # arbitrary path-rooted http(s) URLs assembled from hostile parts
    from hypothesis import given, settings
    from hypothesis import strategies as st

    host_label = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ09-",
        min_size=1, max_size=8)
    seg = st.text(alphabet="azAZ09._-~%", min_size=0, max_size=6)
    param = st.text(alphabet="azAZ09=_-", min_size=1, max_size=8)

    @st.composite
    def urls(draw):
        scheme = draw(st.sampled_from(["http", "HTTP", "https", "HTTPS"]))
        labels = draw(st.lists(host_label, min_size=1, max_size=3))
        host = ".".join(labels)
        if draw(st.booleans()):
            host = "WWW." + host
        port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
        path = "/" + "/".join(draw(st.lists(seg, max_size=3)))
        if draw(st.booleans()):
            path += "/"
        params = draw(st.lists(param, max_size=3))
        q = ("?" + "&".join(params)) if params else ""
        frag = draw(st.sampled_from(["", "#x", "#a b"]))
        return f"{scheme}://{host}{port}{path}{q}{frag}"

    @settings(max_examples=60, deadline=None)
    @given(st.lists(urls(), min_size=1, max_size=8, unique=True))
    def check(batch):
        df = spark.createDataFrame(
            [(i, u) for i, u in enumerate(batch)], "i long, url string")
        once = df.select(
            "i", canonicalize_url(F.col("url")).alias("url")).collect()
        twice = {
            r["i"]: r["c"]
            for r in spark.createDataFrame(once, "i long, url string")
            .select("i", canonicalize_url(F.col("url")).alias("c"))
            .collect()}
        for r in once:
            assert twice[r["i"]] == r["url"], (r["url"], twice[r["i"]])

    check()
