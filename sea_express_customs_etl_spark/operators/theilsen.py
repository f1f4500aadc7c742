"""Theil–Sen robust trend slope per event type (Theil 1950, Sen 1968)
— the ESTIMATE companion to ``stats_tests.mann_kendall_trend``'s
significance test, on the same hour-bucket spine: the median of all
pairwise slopes, 29%-breakdown-robust where OLS shatters on one
outlier hour.

Exactness: each pairwise slope is u6-rounded ONCE via the signed
integer division sdiv((s_j − s_i)·10⁶, h_j − h_i) (negate-first —
the trunc-vs-floor rule), then the median is an exact ORDER STATISTIC
of integers under the total order (slope_u6, h_i, h_j): the lower
median at rank ⌈n/2⌉ — never a float percentile, never an
interpolated midpoint (an even-count average would reintroduce a
division; the lower-median spec is documented instead of hidden).

Scale shape: the pair stage is the Mann–Kendall self-join — bounded
by the TIME window (≤ 8,760 buckets/year per type), never by event
volume; the median is a per-type rank filter on the pair frame
(row_number-then-filter — the WindowGroupLimit family) whose
partition is again time-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

from ..plans.cache import tracked_persist


def theil_sen_slope(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Output: event_type, n_buckets (int), n_pairs (bigint),
    slope_u6 (bigint — median pairwise slope in milli-units/hour
    scaled by 10⁶, i.e. u9/hour overall)."""
    b = events.select(
        F.col(type_col).alias("event_type"),
        (F.floor(F.unix_timestamp(F.col(ts_col)) / 3600))
        .cast("bigint")
        .alias("_h"),
        F.round(F.col(value_col) * 1000).cast("bigint").alias("_v3"),
    )
    hb = tracked_persist(
        b.groupBy("event_type", "_h").agg(F.sum("_v3").alias("_s3"))
    )
    a = hb.select(
        "event_type", F.col("_h").alias("_hi"), F.col("_s3").alias("_si")
    )
    c = hb.select(
        "event_type", F.col("_h").alias("_hj"), F.col("_s3").alias("_sj")
    )
    pairs = (
        a.join(c, "event_type")
        .filter(F.col("_hi") < F.col("_hj"))
        .select(
            "event_type",
            "_hi",
            "_hj",
            F.expr(
                "CASE WHEN (_sj - _si) >= 0"
                " THEN ((_sj - _si) * 1000000) div (_hj - _hi)"
                " ELSE -(((_si - _sj) * 1000000) div (_hj - _hi)) END"
            )
            .cast("bigint")
            .alias("_sl"),
        )
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("_sl").asc(), F.col("_hi").asc(), F.col("_hj").asc()
    )
    wn = Window.partitionBy("event_type")
    ranked = pairs.select(
        "event_type",
        "_sl",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(wn).alias("_np"),
    )
    med = ranked.filter(
        F.col("_rn") == F.expr("(_np + 1) div 2")
    ).select(
        "event_type",
        F.col("_np").cast("bigint").alias("n_pairs"),
        F.col("_sl").alias("slope_u6"),
    )
    nb = hb.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("int").alias("n_buckets")
    )
    return nb.join(med, "event_type").select(
        "event_type", "n_buckets", "n_pairs", "slope_u6"
    )
