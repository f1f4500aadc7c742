"""Tests for mergeable histogram quantiles (operators/quantiles.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from sea_express_customs_etl_spark.operators.quantiles import (
    histogram_quantiles,
    sketch_quantiles,
    value_histogram,
)


def _df(spark, vals, group="g"):
    return spark.createDataFrame(
        [(group, float(v)) for v in vals], ["event_type", "value"]
    )


def test_known_tiny_case(spark):
    # values 0.00..0.99 step 0.01 → bins 0..99, one count each; N=100
    df = _df(spark, [i / 100 for i in range(100)])
    got = {
        r.q: r.bin
        for r in sketch_quantiles(
            df, qs=(("p50", 1, 2), ("p95", 19, 20), ("p99", 99, 100))
        ).collect()
    }
    # ceil(0.5*100)=50 → 50th smallest bin = bin 49
    assert got == {"p50": 49, "p95": 94, "p99": 98}


def test_within_one_bin_of_exact(spark):
    vals = [((i * 2654435761) % 10_000) / 17.0 for i in range(2000)]
    df = _df(spark, vals)
    got = {r.q: r.bin for r in sketch_quantiles(df).collect()}
    exact = sorted(vals)
    import math

    for label, q in (("p50", 0.5), ("p95", 0.95), ("p99", 0.99)):
        lo = got[label] / 100.0
        exact_q = exact[math.ceil(q * len(vals)) - 1]
        assert lo <= exact_q <= lo + 0.01 + 1e-9, (label, lo, exact_q)


def test_histogram_state_is_additively_mergeable(spark):
    a = _df(spark, [0.1, 0.2, 0.2, 5.5])
    b = _df(spark, [0.2, 5.5, 9.9])
    both = a.unionByName(b)
    merged = (
        value_histogram(a)
        .unionByName(value_histogram(b))
        .groupBy("event_type", "bin")
        .agg(F.sum("n").alias("n"))
    )
    direct = value_histogram(both)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    # quantiles from the merged state == quantiles computed directly
    qa = sorted(map(tuple, histogram_quantiles(merged).collect()))
    qb = sorted(map(tuple, histogram_quantiles(direct).collect()))
    assert qa == qb


def test_groups_are_independent(spark):
    df = _df(spark, [1.0] * 99 + [100.0], group="a").unionByName(
        _df(spark, [50.0] * 100, group="b")
    )
    got = {(r.event_type, r.q): r.bin for r in sketch_quantiles(df).collect()}
    assert got[("a", "p50")] == 100  # bin floor(1.0*100)
    assert got[("a", "p99")] == 100
    assert got[("b", "p95")] == 5000


def test_negative_values_floor_binning(spark):
    df = _df(spark, [-0.015, -0.005, 0.005])
    hist = {r.bin: r.n for r in value_histogram(df).collect()}
    # floor(-1.5)=-2, floor(-0.5)=-1, floor(0.5)=0
    assert hist == {-2: 1, -1: 1, 0: 1}


def test_winsorize_clamps_tails_only(spark):
    """Values inside [p01, p99] pass through; tails clamp to the
    discrete quantile bins; sums shrink accordingly."""
    import pyspark.sql.functions as F

    from sea_express_customs_etl_spark.operators.quantiles import (
        winsorize_by_group,
    )

    rows = [("a", v) for v in range(1, 101)]  # 1..100, p01=1? ceil rule
    df = spark.createDataFrame(rows, "g string, x long")
    w = winsorize_by_group(df, "x", group_cols=("g",))
    got = {r.x: r.x_winsor for r in w.collect()}
    # ceil(0.01*100)=1 -> lo bin = 1; ceil(0.99*100)=99 -> hi bin = 99
    assert got[1] == 1 and got[100] == 99 and got[50] == 50
    assert sum(got.values()) == sum(range(1, 101)) - 1
