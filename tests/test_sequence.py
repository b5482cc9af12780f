"""Sequential pattern census (operators/sequence.py).

Pins (1) exact parity with a brute-force python census on a planted
multi-user stream (gap boundary cases, repeated types, out-of-order
input rows), (2) gap-1 = adjacent-only semantics, (3) n_users vs
n_occ distinction, (4) the guard."""

import pytest

from osm2geojson_spark.operators.sequence import seq_patterns

STREAMS = {
    1: list("abcabc"),
    2: list("aaab"),
    3: list("ba"),
    4: list("abbbbc"),  # a→c is 5 apart: outside gap 3
}


def _ref(gap):
    occ, users = {}, {}
    for u, seq in STREAMS.items():
        for i, a in enumerate(seq):
            for b in seq[i + 1:i + 1 + gap]:
                occ[(a, b)] = occ.get((a, b), 0) + 1
                users.setdefault((a, b), set()).add(u)
    return {k: (occ[k], len(users[k])) for k in occ}


@pytest.fixture(scope="module")
def events(spark):
    rows = []
    eid = 0
    for u, seq in STREAMS.items():
        for t in seq:
            rows.append((u, eid, t))
            eid += 1
    # shuffle input row order: operator must sort by order_col itself
    rows = rows[::-1]
    return spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string").cache()


@pytest.mark.parametrize("gap", [1, 2, 3, 10])
def test_matches_bruteforce(events, gap):
    got = {(r["a"], r["b"]): (r["n_occ"], r["n_users"])
           for r in seq_patterns(events, "user_id", "event_id",
                                 "event_type", max_gap=gap).collect()}
    assert got == _ref(gap)


def test_guard(events):
    with pytest.raises(ValueError):
        seq_patterns(events, "user_id", "event_id", "event_type",
                     max_gap=0)
