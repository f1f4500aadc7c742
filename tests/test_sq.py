"""Unit tests for SQ8 scalar quantization (operators/sq.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from sea_express_customs_etl_spark.operators.sq import (
    sq8_encode,
    sq8_stats,
    sq8_topk,
)

VECS = [
    (0, [0.0, 0.5, -1.0]),
    (1, [1.0, 0.5, 1.0]),
    (2, [0.5, 0.5, 0.0]),
    (3, [0.25, 0.5, -0.5]),
]


def _emb(spark):
    return spark.createDataFrame(VECS, "vec_id long, embedding array<float>")


def test_sq8_stats_lo_span(spark):
    row = sq8_stats(_emb(spark)).collect()[0]
    # dim 0: [0, 1e6] → lo=0, span=1e6; dim 1 constant → span floored at 1
    assert row.lo_arr == [0, 500000, -1000000]
    assert row.span_arr == [1000000, 1, 2000000]


def test_sq8_encode_extremes_and_constant_dim(spark):
    codes = {
        (r.vec_id, r.dim): r.code for r in sq8_encode(_emb(spark)).collect()
    }
    assert codes[(0, 0)] == 0 and codes[(1, 0)] == 255  # min→0, max→255
    assert codes[(0, 1)] == 0  # constant dim encodes to 0 (span floor)
    assert codes[(2, 0)] == 127  # midpoint: floor(0.5*255)
    assert all(0 <= c <= 255 for c in codes.values())


def test_sq8_topk_ranks_by_reconstruction_distance(spark):
    emb = _emb(spark)
    got = sq8_topk(emb, emb.filter(F.col("vec_id") == 0), k=3).collect()
    assert [r.neighbor_id for r in got] == [3, 2, 1]  # nearest → farthest
    assert all(r.query_id == 0 for r in got)
    d2 = [r.d2_u for r in got]
    assert d2 == sorted(d2) and d2[0] > 0  # quantization error ≠ exact 0


def test_sq8_train_on_sample_still_clamps(spark):
    emb = _emb(spark)
    # train only on vec_id<=2: vec 3's dim 2 (-0.5) is inside range, but
    # a hypothetical out-of-range value must clamp, not wrap
    wild = spark.createDataFrame(
        [(9, [5.0, 0.5, -9.0])], "vec_id long, embedding array<float>"
    )
    codes = {
        (r.vec_id, r.dim): r.code
        for r in sq8_encode(emb.union(wild), train_df=emb).collect()
    }
    assert codes[(9, 0)] == 255 and codes[(9, 2)] == 0
