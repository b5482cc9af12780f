from __future__ import annotations

import numpy as np

from osm2geojson_spark.operators.audio import activity_segments
from osm2geojson_spark.synth.audio import (
    encode_wav,
    make_segmented_audio_row,
    segmented_audio_table,
)


def planted_layout(seed: int) -> list[tuple[int, int]]:
    """(start_frame, n_frames) per burst from the closed-form synth."""
    n_bursts = 2 + seed % 3
    burst_f = 2 + (seed // 3) % 3
    out = []
    pos = 2
    for _ in range(n_bursts):
        out.append((pos, burst_f))
        pos += burst_f + 2
    return out


def test_segments_match_planted_layout(spark):
    auds = segmented_audio_table(spark, n=45, seed=0)
    got: dict[str, list] = {}
    for r in activity_segments(auds).collect():
        assert r["error"] is None
        got.setdefault(r["audio_id"], []).append(
            (r["seg_idx"], r["start_frame"], r["n_frames"]))
    for i in range(45):
        mid = f"seg-{i:012d}"
        want = [(s, st, nf) for s, (st, nf)
                in enumerate(planted_layout(i))]
        assert sorted(got[mid]) == want, mid


def test_energy_is_exact_sum_of_squares(spark):
    import pandas as pd

    x = np.zeros(480, np.int16)
    x[160:320] = 1000                      # one active middle frame
    df = spark.createDataFrame(pd.DataFrame({
        "audio_id": ["a"], "bytes": [encode_wav(x, 16_000)],
        "fmt": ["wav"]}))
    rows = activity_segments(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["seg_idx"], r["start_frame"], r["n_frames"]) == (0, 1, 1)
    assert r["energy"] == 160 * 1000 * 1000


def test_flac_row_decodes_identically(spark):
    # seed 2 is the flac rotation slot
    mid, buf, _r, _n, fmt, _t = make_segmented_audio_row(2)
    assert fmt == "flac"
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({
        "audio_id": [mid], "bytes": [buf], "fmt": [fmt]}))
    rows = activity_segments(df).collect()
    assert [(r["start_frame"], r["n_frames"]) for r in rows] == \
        planted_layout(2)


def test_undecodable_quarantines(spark):
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({
        "audio_id": ["x"], "bytes": [b"junk"], "fmt": ["wav"]}))
    rows = activity_segments(df).collect()
    assert len(rows) == 1 and rows[0]["seg_idx"] == -1
    assert rows[0]["error"] is not None
