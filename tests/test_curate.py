"""One-call corpus curation pipeline (pipeline.curate_documents):
stage routing, quarantine completeness, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm2geojson_spark.pipeline import curate_documents

GOOD = ("the quick brown fox jumps over the lazy dog and then runs far "
        "away into the quiet green hills beyond the river bend today " * 2)


def _corpus(spark):
    rows = [
        (1, GOOD + "alpha"),
        (2, GOOD + "alpha"),                 # exact dup of 1
        (3, GOOD + "alpha beta gamma"),      # near dup of 1
        (4, "short junk"),                   # low quality
        (5, "please contact me at u@ex.com for more details about the "
            "annual harvest festival where local growers present heirloom "
            "tomatoes squash peppers and beans to curious visitors from "
            "nearby towns every september afternoon rain or shine"),
        (6, "the committee reviewed seventeen proposals during its spring "
            "meeting and awarded funding to projects on wetland restoration "
            "native pollinator corridors and community orchards across the "
            "northern counties pending final board approval next month"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_stage_routing_and_quarantine_completeness(spark):
    docs = _corpus(spark)
    bench = spark.createDataFrame(
        [(100, "grants for wetland restoration native pollinator corridors "
               "and community orchards were discussed")],
        "doc_id long, text string")
    out = curate_documents(spark, docs, bench=bench, min_quality=0.7,
                           near_dup_threshold=0.2)
    m = out["metrics"].first()
    assert m["n_input"] == 6
    ids = {k: {r["doc_id"] for r in out[k].collect()}
           for k in ("clean", "low_quality", "exact_dups", "near_dups",
                     "contaminated")}
    assert ids["low_quality"] == {4}
    assert ids["exact_dups"] == {2}          # min-id 1 kept
    assert ids["near_dups"] == {3}           # quality tie -> min id 1 kept
    assert ids["contaminated"] == {6}        # shares 4-grams with bench
    assert ids["clean"] == {1, 5}
    # every input doc lands in exactly one stream
    all_ids = set().union(*ids.values())
    assert all_ids == {1, 2, 3, 4, 5, 6}
    assert sum(len(v) for v in ids.values()) == 6

    # PII was scrubbed before the clean stream
    texts = {r["doc_id"]: r["text"] for r in out["clean"].collect()}
    assert "u@ex.com" not in texts[5] and "<PII>" in texts[5]


def test_no_bench_skips_decontamination(spark):
    out = curate_documents(spark, _corpus(spark), bench=None,
                           min_quality=0.7)
    assert out["contaminated"].count() == 0
    assert out["metrics"].first()["n_contaminated"] == 0


def test_deterministic(spark):
    docs = _corpus(spark)
    a = sorted(r["doc_id"] for r in
               curate_documents(spark, docs)["clean"].collect())
    b = sorted(r["doc_id"] for r in
               curate_documents(spark, docs.repartition(7))["clean"].collect())
    assert a == b


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
