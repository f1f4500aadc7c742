"""Survival analysis: the Kaplan-Meier life table over user lifetimes.

Users "enter" at their first observed event and "exit" at their last;
with a fully-observed window every exit is an event (no censoring), so
the K-M ingredients reduce to exact integers: at each distinct
lifetime t, ``n_events(t)`` = users whose lifetime is exactly t and
``n_risk(t)`` = users with lifetime ≥ t (a reverse cumulative sum).
The hazard is reported as an integral ratio ``d·1e6 DIV n_risk``
(nonnegative operands — floor == truncate on both engines) rather than
the float product-limit estimator, keeping the table hash-exact; the
survival curve is recoverable downstream as Π(1 − hazard_ppm/1e6).

Reference parity: none (the reference has no time-to-event surface);
this is the retention-analytics sibling of `cohort_retention` in
plans/relational.py.

Scale shape: one user-grain partial-agg shuffle (first/last ts), one
lifetime-grain aggregate (the t domain is bounded by the observation
window in DAYS — model-sized at any corpus scale), then an
unpartitioned window over that model-sized frame (the documented
WindowExec-warning license, same as ranking.global_rank's offsets)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F


def km_life_table(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Output: t_hours, n_events, n_risk, hazard_ppm (HOUR grain —
    integral micros DIV, exact; day grain degenerates to ~3 buckets on
    the one-month testdata window)."""
    staged = events.select(
        F.col(key_col).alias("_k"),
        F.unix_micros(F.col(ts_col)).alias("_us"),
    )
    lives = staged.groupBy("_k").agg(
        # nonnegative operands: DIV == floor == the oracle's //
        F.expr("(max(_us) - min(_us)) DIV 3600000000").alias("t_hours")
    )
    deaths = lives.groupBy("t_hours").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
    # |distinct lifetimes| rows — bounded by the observation window,
    # model-sized: the unpartitioned window is the global_rank license
    w = (
        Window.orderBy(F.col("t_hours").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return deaths.select(
        "t_hours",
        "n_events",
        F.sum("n_events").over(w).cast("bigint").alias("n_risk"),
    ).withColumn(
        "hazard_ppm",
        F.expr("(n_events * 1000000) DIV n_risk").cast("bigint"),
    )
