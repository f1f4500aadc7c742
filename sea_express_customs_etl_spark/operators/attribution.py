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
