"""Tests for order-dependent operators (ffill, seq_number)."""

from __future__ import annotations

import pytest

from sea_express_customs_etl_spark.operators import ffill, seq_number


def test_ffill_merged_cells(spark):
    # sheet-order forward fill of the HAWB column (merged-cell repair)
    df = spark.createDataFrame(
        [
            ("f1", 0, "H1"),
            ("f1", 1, None),
            ("f1", 2, None),
            ("f1", 3, "H2"),
            ("f1", 4, None),
            ("f2", 0, None),  # other file: leading null stays null
            ("f2", 1, "H9"),
        ],
        "file string, _row_idx int, hawb string",
    )
    got = {
        (r.file, r._row_idx): r.hawb
        for r in ffill(df, "hawb", "_row_idx", ("file",)).collect()
    }
    assert got == {
        ("f1", 0): "H1",
        ("f1", 1): "H1",
        ("f1", 2): "H1",
        ("f1", 3): "H2",
        ("f1", 4): "H2",
        ("f2", 0): None,
        ("f2", 1): "H9",
    }


def test_seq_number_cumcount(spark):
    df = spark.createDataFrame(
        [("H1", 0), ("H1", 1), ("H2", 2), ("H1", 3)],
        "hawb string, _row_idx int",
    )
    got = {
        (r.hawb, r._row_idx): r.item_no
        for r in seq_number(df, ("hawb",), "_row_idx").collect()
    }
    assert got == {("H1", 0): 1, ("H1", 1): 2, ("H1", 3): 3, ("H2", 2): 1}


def test_ordered_ops_require_partitions(spark):
    df = spark.createDataFrame([("x", 1)], "a string, i int")
    with pytest.raises(ValueError):
        ffill(df, "a", "i", ())
    with pytest.raises(ValueError):
        seq_number(df, (), "i")


def test_interval_join_boundaries_and_bucket_spans(spark):
    """BETWEEN is inclusive on both ends; intervals spanning many
    buckets still match each point exactly once."""
    import datetime as dt

    import pyspark.sql.functions as F  # noqa: F401

    from sea_express_customs_etl_spark.operators.asof import interval_join

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    pts = spark.createDataFrame(
        [(1, ts(0), "at_start"), (1, ts(150), "mid_span"),
         (1, ts(240), "at_end"), (1, ts(241), "after"),
         (2, ts(100), "other_key")],
        "k long, ts timestamp, tag string",
    )
    ivs = spark.createDataFrame(
        [(1, ts(0), ts(240))], "k long, s timestamp, e timestamp"
    )
    got = interval_join(pts, ivs, ["k"], "ts", "s", "e")
    tags = sorted(r.tag for r in got.collect())
    # 5-hour span = 5 hour-buckets; each in-range point matched ONCE
    assert tags == ["at_end", "at_start", "mid_span"]
