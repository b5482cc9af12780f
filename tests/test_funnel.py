"""Funnel stage chains: strict ordering, broken chains, out-of-order."""

import pytest

from osm2geojson_spark.operators.funnel import funnel_stages


def _run(spark, rows, stages):
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, sec long")
    return {r["user_id"]: tuple(r[f"t_{i + 1}"] for i in range(len(stages)))
            for r in funnel_stages(df, stages).collect()}


def test_monotone_chain_and_breaks(spark):
    rows = [
        # u1 completes all three in order
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        # u2: purchase BEFORE first view -> chain stops at click
        (2, "purchase", 5), (2, "view", 10), (2, "click", 20),
        # u3: click at the SAME second as view -> strict > rejects it,
        # later click advances
        (3, "view", 10), (3, "click", 10), (3, "click", 15),
        # u4 never views -> absent entirely
        (4, "click", 1), (4, "purchase", 2),
    ]
    got = _run(spark, rows, ["view", "click", "purchase"])
    assert got == {1: (10, 20, 30), 2: (10, 20, None), 3: (10, 15, None)}


def test_earliest_not_any_match(spark):
    # two full chains; times must be the EARLIEST valid ones
    rows = [(1, "view", 100), (1, "view", 5), (1, "click", 50),
            (1, "click", 7), (1, "purchase", 60), (1, "purchase", 6)]
    got = _run(spark, rows, ["view", "click", "purchase"])
    assert got == {1: (5, 7, 60)}


def test_needs_two_stages(spark):
    df = spark.createDataFrame([(1, "view", 1)],
                               "user_id long, event_type string, sec long")
    with pytest.raises(ValueError, match="at least 2"):
        funnel_stages(df, ["view"])
