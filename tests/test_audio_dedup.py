"""Audio landmark fingerprint dedup (operators/audio).

Pins (1) every planted same-group variant pair is found with ≥
min_shared hashes (frame alignment is the load-bearing property),
(2) engine == pyref twin through the real wav codec vs direct PCM,
(3) kernel basics (silence floor, short-clip empty), (4) the skew
cap and quarantine paths."""

import numpy as np

from osm2geojson_spark.operators.audio import (
    audio_dup_pairs,
    audio_fingerprints,
    fingerprint_samples,
)
from osm2geojson_spark.synth.audio import snippet_audio_table


def test_planted_groups_and_twin(spark):
    from osm2geojson_spark import pyref

    clips = snippet_audio_table(spark, n=30, seed=42)
    got = sorted((r["id_a"], r["id_b"], r["n_shared"]) for r in
                 audio_dup_pairs(audio_fingerprints(clips),
                                 min_shared=5).collect())
    assert got == sorted(pyref.ref_audio_dedup(n=30, seed=42,
                                               min_shared=5))
    # every same-group variant pair (10 groups x 3 pairs) is present
    pairs = {(a, b) for a, b, _ in got}
    for g in range(14, 24):  # seeds 42..71 → groups 14..23
        ids = sorted(f"snp-{s:012d}" for s in range(g * 3, g * 3 + 3)
                     if 42 <= s < 72)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                assert (ids[i], ids[j]) in pairs, (ids[i], ids[j])


def test_kernel_silence_and_short():
    assert fingerprint_samples(np.zeros(10_000, np.int16)) == []
    assert fingerprint_samples(np.ones(300, np.int16)) == []


def test_quarantine_and_cap(spark):
    df = spark.createDataFrame(
        [("bad", b"RIFFgarbage", "wav")],
        "audio_id string, bytes binary, fmt string")
    rows = audio_fingerprints(df).collect()
    assert len(rows) == 1 and rows[0]["t"] == -1 and rows[0]["error"]

    clips = snippet_audio_table(spark, n=12, seed=42)
    fps = audio_fingerprints(clips)
    full = audio_dup_pairs(fps, min_shared=1).count()
    capped = audio_dup_pairs(fps, min_shared=1,
                             max_bucket_size=1).count()
    assert capped < full
