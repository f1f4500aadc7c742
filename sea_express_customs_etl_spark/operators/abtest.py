"""A/B experiment analysis: CUPED variance-reduced lift.

CUPED (Deng et al., WSDM 2013, "Improving the Sensitivity of Online
Controlled Experiments by Utilizing Pre-Experiment Data") adjusts each
user's experiment-period metric y by their pre-period covariate x:
``y_adj = y − θ·(x − x̄)`` with ``θ = cov(x, y) / var(x)``, removing
the between-user variance that x explains.

Exactness discipline (the repo's float-free convention): θ and x̄ are
RATIONALS whose numerators/denominators are integer sums — so instead
of ever dividing, the per-variant adjusted total is carried multiplied
out by the common denominator ``n·den``:

    adj_num_v = n·den·Σy_v − num·(n·Σx_v − n_v·Σx)
    denom_v   = n_v·n·den        (adjusted mean = adj_num_v / denom_v)

where ``num = n·Σxy − Σx·Σy`` and ``den = n·Σx² − (Σx)²``. Every
intermediate is an integer in DECIMAL(38,0) (the oracle mirrors in
HUGEINT): per-user cent sums are ≤ ~1e6, so adj_num peaks ~1e29 at
sf0.1 and ~1e33-1e35 at sf1-sf10 — inside both engines' 38-digit
range; the bound, not floats, is the scaling limit.

OUTPUT envelope (round-8 fix): the raw numerator exceeds int64
(≈7.9e22 at sf0.01) and wider-than-int64 finals are not portable
through every consumer's hashing envelope, so the query emits the
adjusted per-variant MEAN in micro-cents instead:

    adj_mean_u6 = (10⁶·adj_num_v) DIV denom_v     (≈1e11 — int64-safe)

computed as the exact quotient/remainder split ``q·10⁶ +
(r·10⁶) DIV denom`` (q = adj_num DIV denom, r = adj_num − q·denom) so
the widest intermediate stays under 38 digits even at sf10, where
``10⁶·adj_num`` alone would overflow. Both engines' integer division
truncates toward zero, so the split is engine-exact.

Reference parity: the reference engine has no experiment surface; this
extends the engine's analytics layer the way `operators/stats_tests.py`
does (z-test for the same variants, `segment_conversion_ztest`).

Scale shape: one user-grain partial-agg shuffle, then TWO model-sized
aggregates (a 1-row global frame broadcast-joined onto a |variants|-row
frame). No corpus-sized window, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from sea_express_customs_etl_spark.operators.sampling import hash_split
from sea_express_customs_etl_spark.plans.cache import tracked_persist


def cuped_adjusted_lift(
    events: DataFrame,
    split_ts: str,
    key_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    salt: str = "cuped",
) -> DataFrame:
    """Per-variant CUPED-adjusted outcome totals, exact integers.

    ``x`` = user's pre-period cent total (ts < split_ts), ``y`` = the
    experiment-period total (ts ≥ split_ts); variants are the md5
    hash-split halves of the key space (engine-portable, no rand()).
    Output: variant, n_users, sum_x_cents, sum_y_cents, adj_mean_u6
    (all int64-safe — see module docstring for the envelope rationale).
    """
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    per_user = events.groupBy(key_col).agg(
        F.coalesce(
            F.sum(F.when(F.col(ts_col) < split_ts, cents)), F.lit(0)
        )
        .cast("bigint")
        .alias("_x"),
        F.coalesce(
            F.sum(F.when(F.col(ts_col) >= split_ts, cents)), F.lit(0)
        )
        .cast("bigint")
        .alias("_y"),
    )
    per_user = hash_split(
        per_user,
        {"control": 0.5, "treatment": 0.5},
        key_col=key_col,
        salt=salt,
        split_col="variant",
    )

    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    g = per_user.agg(
        dec(F.count(F.lit(1))).alias("_n"),
        dec(F.sum("_x")).alias("_sx"),
        dec(F.sum("_y")).alias("_sy"),
        F.sum(dec(F.col("_x") * F.col("_y"))).alias("_sxy"),
        F.sum(dec(F.col("_x") * F.col("_x"))).alias("_sxx"),
    )
    v = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("_x").cast("bigint").alias("sum_x_cents"),
        F.sum("_y").cast("bigint").alias("sum_y_cents"),
    )
    num = F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    den = F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    base = v.join(F.broadcast(g)).select(
        "variant",
        "n_users",
        "sum_x_cents",
        "sum_y_cents",
        (
            F.col("_n") * den * dec(F.col("sum_y_cents"))
            - num
            * (
                F.col("_n") * dec(F.col("sum_x_cents"))
                - dec(F.col("n_users")) * F.col("_sx")
            )
        )
        .cast("decimal(38,0)")
        .alias("_adj_num"),
        (dec(F.col("n_users")) * F.col("_n") * den)
        .cast("decimal(38,0)")
        .alias("_denom"),
    )
    # q/r split (module docstring): DIV returns BIGINT on decimals, so
    # q re-casts to DECIMAL(38,0) before the r = adj − q·denom multiply
    # (the CLAUDE.md DIV-overflow rule).
    split = base.withColumn(
        "_q", F.expr("_adj_num div _denom")
    ).withColumn(
        "_r",
        (
            F.col("_adj_num")
            - F.col("_q").cast("decimal(38,0)") * F.col("_denom")
        ).cast("decimal(38,0)"),
    )
    return split.select(
        "variant",
        "n_users",
        "sum_x_cents",
        "sum_y_cents",
        (
            F.col("_q") * F.lit(1_000_000).cast("bigint")
            + F.expr(
                "(_r * CAST(1000000 AS DECIMAL(38,0))) div _denom"
            )
        )
        .cast("bigint")
        .alias("adj_mean_u6"),
    )


def did_lift(
    events: DataFrame,
    split_ts: str,
    key_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    salt: str = "did",
) -> DataFrame:
    """Difference-in-differences at user grain, exact integers — the
    pre-trend-robust sibling of :func:`cuped_adjusted_lift`: variants
    are the md5 hash-split halves, x/y the per-user pre/post cent
    totals, and because each variant's pre and post denominators are
    the SAME user count,

        did = (Σy_T − Σx_T)/n_T − (Σy_C − Σx_C)/n_C

    carries as one exact rational: ``did_num = (Σy_T − Σx_T)·n_C −
    (Σy_C − Σx_C)·n_T`` over ``did_den = n_T·n_C`` (DECIMAL(38,0);
    at sf1 |num| ≲ 1e12·1e7 = 1e19 — 19 digits, 19 to spare).
    Output: one row — n_treat, n_ctrl, the four cell sums, did_num,
    did_den.

    Scale shape: one per-user aggregate shuffle (partial map-side),
    one 2-row variant aggregate, a 1-row×1-row join — nothing after
    the first shuffle touches corpus grain.
    """
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    per_user = events.groupBy(key_col).agg(
        F.coalesce(
            F.sum(F.when(F.col(ts_col) < split_ts, cents)), F.lit(0)
        )
        .cast("bigint")
        .alias("_x"),
        F.coalesce(
            F.sum(F.when(F.col(ts_col) >= split_ts, cents)), F.lit(0)
        )
        .cast("bigint")
        .alias("_y"),
    )
    per_user = hash_split(
        per_user,
        {"control": 0.5, "treatment": 0.5},
        key_col=key_col,
        salt=salt,
        split_col="variant",
    )
    v = tracked_persist(
        per_user.groupBy("variant").agg(
            F.count(F.lit(1)).cast("bigint").alias("_n"),
            F.sum("_x").cast("bigint").alias("_sx"),
            F.sum("_y").cast("bigint").alias("_sy"),
        )
    )  # two consumers: the treatment/control branch filters
    t = v.filter(F.col("variant") == "treatment").select(
        F.col("_n").alias("n_treat"),
        F.col("_sx").alias("sum_pre_treat_c"),
        F.col("_sy").alias("sum_post_treat_c"),
    )
    c = v.filter(F.col("variant") == "control").select(
        F.col("_n").alias("n_ctrl"),
        F.col("_sx").alias("sum_pre_ctrl_c"),
        F.col("_sy").alias("sum_post_ctrl_c"),
    )
    dec = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    return t.join(F.broadcast(c)).select(
        "n_treat",
        "n_ctrl",
        "sum_pre_treat_c",
        "sum_post_treat_c",
        "sum_pre_ctrl_c",
        "sum_post_ctrl_c",
        (
            (dec("sum_post_treat_c") - dec("sum_pre_treat_c")) * dec("n_ctrl")
            - (dec("sum_post_ctrl_c") - dec("sum_pre_ctrl_c"))
            * dec("n_treat")
        )
        .cast("decimal(38,0)")
        .alias("did_num"),
        (dec("n_treat") * dec("n_ctrl")).cast("decimal(38,0)").alias("did_den"),
    )
