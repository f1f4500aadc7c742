"""Unit tests for warehouse-ops operators (operators/profiling.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from sea_express_customs_etl_spark.operators.profiling import (
    check_constraints,
    latest_by_key,
    profile_table,
)


def test_profile_counts_nulls_distincts_and_extremes(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "b")], "x long, s string"
    )
    got = {r.column: r for r in profile_table(df, ["x", "s"]).collect()}
    assert got["x"].n_rows == 4 and got["x"].n_nulls == 1
    assert got["x"].n_distinct == 2 and (got["x"].lo, got["x"].hi) == ("1", "2")
    assert got["s"].n_nulls == 1 and got["s"].n_distinct == 2


def test_constraints_null_counts_as_violation(spark):
    df = spark.createDataFrame([(5,), (None,), (-1,)], "x long")
    got = {
        r.rule: r
        for r in check_constraints(
            df, {"pos": F.col("x") > 0, "any": F.lit(True)}
        ).collect()
    }
    # -1 fails, NULL is unevaluable → both count (conservative dbt rule)
    assert got["pos"].n_violations == 2
    assert got["pos"]["pass"] is False
    assert got["any"].n_violations == 0 and got["any"]["pass"] is True


def test_latest_by_key_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, 10, 1, "a"), (1, 10, 2, "b"), (1, 9, 9, "c"), (2, 5, 1, "d")],
        "k long, o long, t long, p string",
    )
    got = {r.k: r for r in latest_by_key(df, ["k"], "o", "t", ["p"]).collect()}
    assert got[1].p == "b"  # equal order 10 → higher tiebreak wins
    assert got[2].p == "d"
