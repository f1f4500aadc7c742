"""Isotonic calibration via the minimax closed form
(operators/isotonic.py): hand-computed PAVA pools, monotonicity, and
the already-monotone no-op case."""

import pyspark.sql.functions as F

from sea_express_customs_etl_spark.operators.isotonic import (
    isotonic_from_deciles,
)


def _dec(spark, rates, n=100):
    rows = [
        (i + 1, n, int(n * r), int(1_000_000 * r))
        for i, r in enumerate(rates)
    ]
    return spark.createDataFrame(
        rows, "bucket int, n_rows bigint, n_pos bigint, pos_ppm bigint"
    )


def test_pools_adjacent_violators_exactly(spark):
    # rates 0.10, 0.30, 0.20, 0.40 with equal counts:
    # PAVA pools buckets 2-3 to their mean 0.25
    out = {
        r.bucket: r.iso_ppm
        for r in isotonic_from_deciles(
            _dec(spark, [0.10, 0.30, 0.20, 0.40])
        ).collect()
    }
    assert out == {1: 100_000, 2: 250_000, 3: 250_000, 4: 400_000}


def test_monotone_input_is_untouched(spark):
    rates = [0.05, 0.10, 0.40, 0.80]
    out = {
        r.bucket: r.iso_ppm
        for r in isotonic_from_deciles(_dec(spark, rates)).collect()
    }
    assert out == {
        i + 1: int(1_000_000 * r) for i, r in enumerate(rates)
    }


def test_decreasing_input_pools_to_global_mean(spark):
    # fully decreasing rates pool into ONE block = the global mean
    out = [
        r.iso_ppm
        for r in isotonic_from_deciles(
            _dec(spark, [0.40, 0.30, 0.20, 0.10])
        )
        .orderBy("bucket")
        .collect()
    ]
    assert out == [250_000] * 4


def test_unequal_counts_weighted_pool(spark):
    # bucket 1: 10 rows 0 pos; bucket 2: 90 rows 90 pos -> monotone;
    # reversed -> pooled weighted mean (90+0)/(100) = 0.9*... =
    # (1e6*90)//100 = 900000? counts: b1 90/90 pos, b2 10 rows 0 pos
    df = spark.createDataFrame(
        [
            (1, 90, 90, 1_000_000),
            (2, 10, 0, 0),
        ],
        "bucket int, n_rows bigint, n_pos bigint, pos_ppm bigint",
    )
    out = {
        r.bucket: r.iso_ppm for r in isotonic_from_deciles(df).collect()
    }
    assert out == {1: 900_000, 2: 900_000}
