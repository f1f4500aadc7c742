"""Hill estimator for the heavy-tail index of a value distribution.

Beyond-parity operator (no counterpart in the reference's pandas core
at ``/root/reference``; nearest surface: its per-key count tables):
the tail-heaviness dial next to ``revenue_pareto``'s concentration
share and ``zipf_alpha``'s rank-frequency slope — Hill (1975)
estimates the Pareto tail exponent from the top-k order statistics,

    alpha_hat = k / sum_{i<=k} ln(x_(i) / x_(k+1)),

the number a capacity planner uses to decide whether value sums even
have finite variance (alpha < 2) — i.e. whether mean-based
aggregations of this column are stable at all.

Spec (engine-portable, integer-exact): k = ceil(sqrt(N)) derived FROM
the data (one count() action on the Spark side, a scalar CTE in the
oracle — the scaling-scalar rule; ceil(sqrt) is parity-exact because
perfect squares are exact in double and non-squares never land on an
integer). The top k+1 values are a distributed orderBy+limit
(TakeOrderedAndProject — no window, no single-partition funnel);
each of the k largest contributes r(x_i) - r(x_(k+1)) with
r(x) = round(ln(x)*1e6) (the token_entropy single-libm license;
monotone, so every term >= 0 and the final DIV is positive-operand).

Output (1 row): ``n``, ``k``, ``sum_ln_u6``, ``alpha_u6``
(alpha_u6 = k*1e12 DIV sum_ln_u6; 0 when the top k+1 values are all
equal — a degenerate tail).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

MICRO = 1_000_000


def hill_tail_index(
    df: DataFrame, value_col: Column, key_col: str
) -> DataFrame:
    """Hill tail-index over positive ``value_col`` (rows with
    non-positive values are excluded — ln is undefined there and a
    Pareto tail is a statement about the positive tail)."""
    base = df.select(
        value_col.cast("bigint").alias("_y"),
        F.col(key_col).alias("_k"),
    ).filter(F.col("_y") > 0)
    n = base.count()  # the one count() action (scaling-scalar rule)
    k = math.isqrt(n)
    if k * k < n:
        k += 1
    top = base.orderBy(F.col("_y").desc(), F.col("_k").asc()).limit(k + 1)
    floor_val = top.agg(F.min("_y").alias("_xk1"))
    r = lambda c: F.round(F.log(c.cast("double")) * MICRO).cast("bigint")
    summed = (
        top.crossJoin(F.broadcast(floor_val))
        .withColumn("_rd", r(F.col("_y")) - r(F.col("_xk1")))
        .agg(F.sum("_rd").alias("_s"), F.count(F.lit(1)).alias("_m"))
    )
    # the k+1-th row contributes 0, so summing all k+1 rows equals
    # summing the top k — no second limit needed
    return summed.select(
        F.lit(n).cast("bigint").alias("n"),
        F.lit(k).cast("bigint").alias("k"),
        F.col("_s").cast("bigint").alias("sum_ln_u6"),
        F.expr(
            f"CAST(CASE WHEN _s = 0 THEN 0"
            f" ELSE (CAST({k} AS BIGINT) * 1000000000000) DIV _s END"
            " AS BIGINT)"
        ).alias("alpha_u6"),
    )
