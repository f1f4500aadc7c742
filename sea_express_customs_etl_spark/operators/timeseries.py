"""Time-series bucket gap-fill + LOCF — the hypertable-rollup shape
(TimescaleDB's ``time_bucket_gapfill`` / ``locf``): hourly rollups
where EMPTY buckets are materialized as rows (a dashboard or
downstream join must see the hour existed and was quiet — a missing
row is indistinguishable from missing data) and the last observed
value carries forward across the gaps.

No reference-parity citation: the reference has no time-series layer;
this extends the events family (``plans/relational.py``) the same way
the dedup/ANN families extend the corpus ops.

Portability: buckets are EPOCH-HOUR INTEGERS (``floor(epoch/3600)``)
and values are micro-unit bigints, so the gap-filled frame —
including which buckets are null vs zero and every carried-forward
value — hash-matches the DuckDB oracle exactly.

Scale: the rollup is one partial-aggregated (type, hour) shuffle of
the raw events; the SPINE (types × hours) is bucket-grained —
hours-per-year × |types|, independent of event volume — so the
gap-fill join and the LOCF window run on the small frame. The LOCF
window funnels one partition per type, bounded by the hour count
(8,760 rows/type/year), never by events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

MICRO = 1_000_000


def hourly_gapfill_locf(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per-type hourly rollup over a GAPLESS hour spine spanning the
    observed range, with last-observation-carried-forward.

    Output: type_col, epoch_hour (bigint), n_events (int — 0 for
    empty buckets), sum_value_u6 (bigint — NULL for empty buckets:
    "no data" stays distinguishable from "sums to zero"),
    locf_value_u6 (bigint — the latest non-null sum at or before this
    bucket; NULL before a type's first observation).
    """
    ev = events.select(
        F.col(type_col),
        F.floor(F.unix_timestamp(F.col(ts_col)) / 3600)
        .cast("bigint")
        .alias("epoch_hour"),
        F.round(F.col(value_col) * MICRO).cast("bigint").alias("_v6"),
    )
    hourly = ev.groupBy(type_col, "epoch_hour").agg(
        F.count(F.lit(1)).cast("int").alias("n_events"),
        F.sum("_v6").alias("sum_value_u6"),
    )
    bounds = hourly.agg(
        F.min("epoch_hour").alias("_lo"), F.max("epoch_hour").alias("_hi")
    )
    spine = (
        hourly.select(type_col)
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            type_col,
            F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias(
                "epoch_hour"
            ),
        )
    )
    w = (
        Window.partitionBy(type_col)
        .orderBy("epoch_hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, [type_col, "epoch_hour"], "left")
        .select(
            type_col,
            "epoch_hour",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            "sum_value_u6",
            F.last("sum_value_u6", ignorenulls=True)
            .over(w)
            .alias("locf_value_u6"),
        )
    )
