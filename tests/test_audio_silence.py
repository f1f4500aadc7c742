"""Audio silence segmentation: real decode → window energy → span
merge, pinned against the fixture's closed form in pure Python."""

from __future__ import annotations

import pyspark.sql.functions as F

from sea_express_customs_etl_spark.multimodal.binary_ops import (
    silence_spans,
    synth_wav_silence,
    wav_window_energy,
)


def _py_spans(mid: int, n_windows: int = 8) -> list[tuple[int, int, int]]:
    run = 2 + mid % 3
    silent = [w for w in range(n_windows) if (mid * 7 + w) % n_windows < run]
    spans, cur = [], None
    for w in silent:
        if cur and w == cur[1] + 1:
            cur[1] = w
        else:
            if cur:
                spans.append(tuple(cur) + (cur[1] - cur[0] + 1,))
            cur = [w, w]
    if cur:
        spans.append(tuple(cur) + (cur[1] - cur[0] + 1,))
    return [(a, b, n) for (a, b, n) in spans]


def test_silence_spans_match_closed_form(spark):
    ids = spark.createDataFrame([(i,) for i in range(1, 25)], ["media_id"])
    wav = synth_wav_silence(ids)
    got: dict[int, list] = {}
    for r in silence_spans(wav_window_energy(wav)).collect():
        got.setdefault(r.media_id, []).append(
            (r.start_win, r.end_win, r.n_windows)
        )
    for mid in range(1, 25):
        assert sorted(got.get(mid, [])) == sorted(_py_spans(mid)), mid
    # wrap geometry: at least one id has TWO spans (edge-wrapped run
    # must NOT merge across the clip boundary)
    assert any(len(v) == 2 for v in got.values())


def test_silence_corrupt_rows_contained(spark):
    ids = spark.createDataFrame([(1,), (2,), (3,)], ["media_id"])
    wav = synth_wav_silence(ids).withColumn(
        "payload",
        F.when(F.col("media_id") == 2, F.lit(b"JUNK")).otherwise(
            F.col("payload")
        ),
    )
    energy = wav_window_energy(wav)
    errs = energy.filter(F.col("decode_error").isNotNull()).collect()
    assert [r.media_id for r in errs] == [2]
    spans = silence_spans(energy)
    assert spans.filter(F.col("media_id") == 2).count() == 0
    assert spans.filter(F.col("media_id") == 1).count() > 0
