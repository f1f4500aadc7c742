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


def test_profile_approx_no_expand(spark):
    """exact_ndv=False must collapse to ONE aggregation pass: no Expand
    node (the |cols|-way scan multiplication countDistinct incurs), and
    the approx counts stay sane on low-cardinality data."""
    df = spark.createDataFrame(
        [(i % 3, str(i % 5)) for i in range(200)], "x long, s string"
    )
    approx = profile_table(df, ["x", "s"], exact_ndv=False)
    plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    exact_plan = (
        profile_table(df, ["x", "s"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" in exact_plan  # the contrast the flag exists to remove
    got = {r.column: r for r in approx.collect()}
    # HLL++ at default rsd is exact at these cardinalities
    assert got["x"].n_distinct == 3 and got["s"].n_distinct == 5
    assert got["x"].n_rows == 200


def test_profile_and_constraints_escape_quoted_names(spark):
    df = spark.createDataFrame([(1,)], "x long").select(
        F.col("x").alias("it's, tricky")
    )
    prof = profile_table(df, ["it's, tricky"]).collect()
    assert prof[0].column == "it's, tricky" and prof[0].n_distinct == 1
    rules = check_constraints(
        df, {"it's, a rule": F.col("`it's, tricky`") > 0}
    ).collect()
    assert rules[0].rule == "it's, a rule" and rules[0].n_violations == 0


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


def test_sigma_outliers_golden_and_no_float(spark):
    """A planted extreme value is flagged, uniform-ish values are not;
    layout invariance (pure integer/decimal arithmetic)."""
    from sea_express_customs_etl_spark.operators.profiling import (
        sigma_outliers,
    )

    rows = (
        [(i, "a", 10 + (i % 3)) for i in range(60)]
        + [(99, "a", 5000)]
        + [(200 + i, "b", i % 5) for i in range(40)]
    )
    df = spark.createDataFrame(rows, "event_id long, g string, x long")
    out = sigma_outliers(df, "x", ["g"], ["event_id"], k_tenths=30)
    got = sorted(map(tuple, out.collect()))
    assert got == [(99, "a", 5000, 61)]
    again = sorted(
        map(
            tuple,
            sigma_outliers(
                df.repartition(7), "x", ["g"], ["event_id"], k_tenths=30
            ).collect(),
        )
    )
    assert got == again


def test_gini_goldens_and_layout_invariance(spark):
    from sea_express_customs_etl_spark.operators.profiling import (
        gini_by_group,
    )

    rows = [("eq", i, 10) for i in range(4)] + [
        ("one", 0, 0), ("one", 1, 0), ("one", 2, 0), ("one", 3, 100)
    ]
    df = spark.createDataFrame(rows, "g string, id long, x long")
    got = {r.g: (r.n_rows, r.gini_ppm) for r in gini_by_group(
        df, "x", ["g"], "id"
    ).collect()}
    # equal shares -> 0; single holder of n=4 -> (n-1)/n = 0.75
    assert got == {"eq": (4, 0), "one": (4, 750_000)}
    again = {r.g: (r.n_rows, r.gini_ppm) for r in gini_by_group(
        df.repartition(7), "x", ["g"], "id"
    ).collect()}
    assert got == again
