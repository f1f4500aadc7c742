"""Marketing-attribution over matched (conversion, touch) pairs.

`purchase_last_click_asof` is LAST-touch attribution (the as-of join);
this module adds the LINEAR model over the pair table the interval
join already produces: each conversion's value splits equally across
its qualifying touches, in exact micro-unit integers — floor shares
plus the remainder assigned to the EARLIEST touch, so the split sums
exactly to the conversion value and every share is deterministic
(a float division would neither sum exactly nor hash-match).

Scale shape: one window over the pair table partitioned by the
conversion id (per-conversion state = its touch list, bounded by the
attribution lookback), nothing else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F


def linear_attribution(
    pairs: DataFrame,
    conversion_id: str,
    value_u_col: str,
    touch_order_cols: list[str],
) -> DataFrame:
    """Input: one row per (conversion, touch) with the conversion's
    integer value ``value_u_col`` repeated. Output: the same rows with
    ``n_touches``, ``share_u`` (floor split + remainder on the first
    touch by ``touch_order_cols``)."""
    w = Window.partitionBy(conversion_id)
    wo = w.orderBy(*[F.col(c).asc() for c in touch_order_cols])
    n = F.count(F.lit(1)).over(w)
    base = F.expr(f"{value_u_col} div n_touches")
    rem = F.col(value_u_col) - base * F.col("n_touches")
    return (
        pairs.withColumn("n_touches", n)
        .withColumn("_rn", F.row_number().over(wo))
        .withColumn(
            "share_u",
            (base + F.when(F.col("_rn") == 1, rem).otherwise(F.lit(0))).cast(
                "bigint"
            ),
        )
        .drop("_rn")
    )


def u_shaped_attribution(
    pairs: DataFrame,
    conversion_id: str,
    value_u_col: str,
    touch_order_cols: list[str],
) -> DataFrame:
    """Position-based ("U-shaped") attribution: the FIRST and LAST
    touch each take 40% of the conversion value and the middles split
    the remaining 20% — the standard position-based model next to
    :func:`linear_attribution`'s equal split.

    Exact-integer policy (all DIV on nonnegative operands, every
    conversion's shares sum EXACTLY to its value):

    - n = 1: the sole touch takes everything.
    - n = 2: ``base = value DIV 2``; first takes base + remainder,
      last takes base.
    - n ≥ 3: ``w_end = (value · 2) DIV 5`` to first AND last;
      ``mid_total = value − 2·w_end``; each middle takes
      ``mid_total DIV (n−2)`` with the remainder on the EARLIEST
      middle (the linear_attribution remainder convention).

    Same scale shape as linear: one window per conversion id, state
    bounded by the lookback."""
    w = Window.partitionBy(conversion_id)
    wo = w.orderBy(*[F.col(c).asc() for c in touch_order_cols])
    val = F.col(value_u_col)
    out = (
        pairs.withColumn("n_touches", F.count(F.lit(1)).over(w))
        .withColumn("_rn", F.row_number().over(wo))
    )
    n = F.col("n_touches")
    rn = F.col("_rn")
    w_end = F.expr(f"({value_u_col} * 2) DIV 5")
    half = F.expr(f"{value_u_col} DIV 2")
    mid_total = val - F.lit(2) * w_end
    n_mid = n - F.lit(2)
    mid_base = F.expr(
        f"({value_u_col} - 2 * (({value_u_col} * 2) DIV 5))"
        " DIV (n_touches - 2)"
    )
    mid_rem = mid_total - mid_base * n_mid
    share = (
        F.when(n == 1, val)
        .when((n == 2) & (rn == 1), half + (val - F.lit(2) * half))
        .when((n == 2) & (rn == 2), half)
        .when(rn == 1, w_end)
        .when(rn == n, w_end)
        .when(rn == 2, mid_base + mid_rem)  # earliest middle
        .otherwise(mid_base)
    )
    return out.withColumn("share_u", share.cast("bigint")).drop("_rn")


def time_decay_attribution(
    pairs: DataFrame,
    conversion_id: str,
    value_u_col: str,
    conv_ts_col: str = "ts",
    touch_ts_col: str = "prior_ts",
    touch_id_col: str = "prior_event_id",
    half_life_us: int = 6 * 3600 * 1_000_000,
    max_buckets: int = 4,
) -> DataFrame:
    """Time-decay attribution, exact integers: a touch Δ before the
    conversion carries weight ``2^(max_buckets-1-b)`` where
    ``b = Δ DIV half_life`` — the exponential-decay model quantized to
    half-life buckets so the weights are INTEGER powers of two (the
    float ``exp(-Δ/τ)`` would neither sum exactly nor hash-match; the
    ewma_hourly discipline). With the 24 h lookback and 6 h half-life,
    b ∈ {0..3} and weights are {8,4,2,1}. Base share is
    ``(value·w) DIV Σw``; the floor remainder credits the MOST RECENT
    touch (the model's own bias direction — recency), making the
    split deterministic and exactly value-preserving.

    Output: input pair rows + decay_bucket, n_touches, share_u6.
    Scale shape: three windows over the pair table, all partitioned by
    the conversion id (per-conversion state = its bounded touch list).
    """
    nb = int(max_buckets)
    b = F.expr(
        f"(unix_micros({conv_ts_col}) - unix_micros({touch_ts_col})) "
        f"DIV {int(half_life_us)}"
    )
    w = None  # when-chain: shiftleft() needs a literal bit count
    for k in range(nb - 1):
        cond = b == k
        w = (
            F.when(cond, F.lit(1 << (nb - 1 - k)))
            if w is None
            else w.when(cond, F.lit(1 << (nb - 1 - k)))
        )
    w = (w.otherwise(F.lit(1)) if w is not None else F.lit(1)).cast("bigint")
    wconv = Window.partitionBy(conversion_id)
    wrecent = Window.partitionBy(conversion_id).orderBy(
        F.desc(touch_ts_col), F.desc(touch_id_col)
    )
    staged = pairs.select(
        "*",
        b.cast("bigint").alias("decay_bucket"),
        w.alias("_w"),
    )
    staged = staged.select(
        "*",
        F.sum("_w").over(wconv).alias("_wtot"),
        F.count(F.lit(1)).over(wconv).cast("bigint").alias("n_touches"),
        F.row_number().over(wrecent).alias("_rnr"),
    )
    staged = staged.select(
        "*",
        F.expr(f"({value_u_col} * _w) DIV _wtot").alias("_share0"),
    ).select(
        "*",
        F.sum("_share0").over(wconv).alias("_ft"),
    )
    return staged.select(
        *[c for c in pairs.columns],
        "decay_bucket",
        "n_touches",
        (
            F.col("_share0")
            + F.when(
                F.col("_rnr") == 1, F.col(value_u_col) - F.col("_ft")
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("share_u6"),
    )
