"""Tests for Neyman-allocation stratified sampling
(operators/sampling.py:neyman_allocation_sample): isqrt exactness,
budget conservation under largest-remainder rounding, degenerate
(zero-variance) strata, and layout invariance of the drawn membership.
"""

import pyspark.sql.functions as F

from sea_express_customs_etl_spark.operators.sampling import (
    _isqrt_exact,
    neyman_allocation_sample,
)


def _orders(spark, rows):
    return spark.createDataFrame(
        rows, ["o_orderkey", "o_orderpriority", "o_totalprice"]
    )


def _run(spark, rows, divisor=30):
    return neyman_allocation_sample(
        _orders(spark, rows),
        strata_col="o_orderpriority",
        cents_col=F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"),
        key_col="o_orderkey",
        divisor=divisor,
    ).collect()


def test_isqrt_exact_boundaries(spark):
    # perfect squares, square-minus-one, square-plus-one, and large
    # values near the int64 double-precision edge
    vals = []
    for s in [0, 1, 2, 3, 10, 999, 10**6, 10**7, 2**26 - 3]:
        for v in [s * s, s * s + 1, max(0, s * s - 1)]:
            vals.append((v,))
    df = spark.createDataFrame(vals, ["v"]).select(
        "v", _isqrt_exact(F.col("v").cast("bigint")).alias("s")
    )
    import math

    for r in df.collect():
        assert r.s == math.isqrt(r.v), (r.v, r.s)


def test_budget_conservation_and_proportionality(spark):
    # Stratum A: high spread, B: low spread, equal sizes -> A gets more
    rows = [(i, "A", float((i * 137) % 1000)) for i in range(1, 101)]
    rows += [(1000 + i, "B", 500.0 + (i % 3)) for i in range(1, 101)]
    out = {r.stratum: r for r in _run(spark, rows, divisor=10)}
    total_alloc = sum(r.alloc_n for r in out.values())
    budget = (200 + 9) // 10
    assert total_alloc == budget
    assert out["A"].alloc_n > out["B"].alloc_n
    for r in out.values():
        assert r.picked_n == r.alloc_n


def test_zero_variance_stratum_gets_nothing(spark):
    # constant stratum has sd 0 -> weight 0 -> allocation only via
    # largest-remainder top-up if the budget exceeds the other strata
    rows = [(i, "CONST", 100.0) for i in range(1, 31)]
    rows += [(100 + i, "VAR", float(i * 97 % 500)) for i in range(1, 31)]
    out = {r.stratum: r for r in _run(spark, rows, divisor=6)}
    assert out["CONST"].sd_cents == 0
    assert out["VAR"].alloc_n >= out["CONST"].alloc_n
    assert sum(r.alloc_n for r in out.values()) == 10


def test_membership_layout_invariance(spark):
    rows = [
        (i, "PQ"[i % 2], float((i * 37) % 900) + 0.25) for i in range(1, 121)
    ]
    a = sorted(map(tuple, _run(spark, rows, divisor=4)))
    b = sorted(
        map(
            tuple,
            neyman_allocation_sample(
                _orders(spark, rows).repartition(7),
                strata_col="o_orderpriority",
                cents_col=F.expr(
                    "CAST(round(o_totalprice * 100) AS BIGINT)"
                ),
                key_col="o_orderkey",
                divisor=4,
            ).collect(),
        )
    )
    assert a == b
