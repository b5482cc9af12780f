

def test_merge_intervals_bruteforce(spark):
    import random

    from osm2geojson_spark.operators.ranges import merge_intervals

    rng = random.Random(5)
    rows = [(k, s, s + rng.randint(0, 8))
            for k in range(4)
            for s in (rng.randint(0, 60) for _ in range(25))]
    df = spark.createDataFrame(rows, "k long, s long, e long")
    got = sorted((r["k"], r["start"], r["end"], r["n_merged"])
                 for r in merge_intervals(df, "k", "s", "e").collect())

    exp = []
    bykey = {}
    for k, s, e in rows:
        bykey.setdefault(k, []).append((s, e))
    for k, ivs in bykey.items():
        ivs.sort()
        cur_s, cur_e, n = ivs[0][0], ivs[0][1], 1
        for s, e in ivs[1:]:
            if s <= cur_e:
                cur_e, n = max(cur_e, e), n + 1
            else:
                exp.append((k, cur_s, cur_e, n))
                cur_s, cur_e, n = s, e, 1
        exp.append((k, cur_s, cur_e, n))
    assert got == sorted(exp)


def test_merge_intervals_swallowed(spark):
    from osm2geojson_spark.operators.ranges import merge_intervals

    # [0,100] swallows everything incl. a touching [100,101]
    rows = [(1, 0, 100), (1, 10, 20), (1, 50, 60), (1, 100, 101),
            (1, 102, 103)]
    df = spark.createDataFrame(rows, "k long, s long, e long")
    got = sorted((r["start"], r["end"], r["n_merged"])
                 for r in merge_intervals(df, "k", "s", "e").collect())
    assert got == [(0, 101, 4), (102, 103, 1)]
