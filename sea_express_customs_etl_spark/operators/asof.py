"""As-of (nearest-prior-event) join.

For each left row, attach the most recent right row with
``right.ts <= left.ts`` within the same partition key. The naive
formulation is a range join (quadratic blow-up per key); this operator
uses the union + last-ignorenulls-window form instead:

    tag both sides → union → window ``last(right_payload, ignorenulls)``
    ordered by (ts, side) per key → keep left rows

which is ONE shuffle on the key, linear state, and works at any key
cardinality — the standard scale formulation for "price as of trade
time" / "last click before purchase" joins.

Tie semantics: a right row at exactly ``left.ts`` IS visible to that
left row (right sorts before left at equal ts via the side tag).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    payload_cols: list[str],
    tiebreak_col: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Attach ``prefix + payload_col`` (and ``prefix + ts``) from the
    nearest prior ``right`` row to every ``left`` row.

    ``tiebreak_col`` orders simultaneous events deterministically
    (e.g. an event id); required whenever ``ts`` can repeat.

    Payloads are carried as ONE struct, not per-column: a per-column
    ``last(..., ignorenulls)`` would silently MIX fields from
    different right rows whenever the nearest row holds a NULL payload
    value (ignorenulls skips it and reaches back to an older row) —
    found the hard way by ``pit_join``, whose open versions carry
    ``valid_to = NULL``. The struct is non-null exactly when the row
    is a right row, so every attached field comes from the same one.
    """
    order = [F.col(ts_col).asc(), F.col("_side").asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())

    l_tag = left.withColumn("_side", F.lit(1))
    r_tag = right.withColumn("_side", F.lit(0))
    for c in l_tag.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None))
    for c in r_tag.columns:
        if c not in l_tag.columns:
            l_tag = l_tag.withColumn(c, F.lit(None))
    unioned = l_tag.unionByName(r_tag)

    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = F.when(
        F.col("_side") == 0,
        F.struct(
            *[F.col(c).alias(c) for c in payload_cols],
            F.col(ts_col).alias("_ts"),
        ),
    )
    carried = unioned.withColumn(
        "_pay", F.last(packed, ignorenulls=True).over(w)
    )
    return carried.filter(F.col("_side") == 1).select(
        *left.columns,
        *[F.col(f"_pay.{c}").alias(f"{prefix}{c}") for c in payload_cols],
        F.col("_pay._ts").alias(f"{prefix}{ts_col}"),
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key_cols: list[str],
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Point-in-interval join without a range-join blow-up: inner-join
    every ``points`` row to each ``intervals`` row of the same key with
    ``start <= ts <= end``.

    The naive formulation is a non-equi join — Spark plans it as a
    per-key cross product (quadratic in the hot key). This operator
    uses TIME-BUCKET BLOCKING, the standard distributed range-join
    rewrite (what Databricks' range-join optimization does under the
    hood): each interval explodes into the epoch buckets it spans,
    each point maps to its single bucket, and the join becomes a plain
    equi-join on (keys…, bucket) with the BETWEEN as a residual
    filter. A point's bucket intersects an interval's bucket list at
    most once, so no dedup is needed. Cost: |intervals| × avg-span /
    bucket exploded rows and ONE hash shuffle — pick ``bucket_seconds``
    near the typical interval length so the explosion factor stays
    small while buckets stay selective.

    All columns of both inputs survive (interval columns suffixed only
    on collision is the caller's concern — keep them disjoint).
    """
    us = F.lit(bucket_seconds * 1_000_000).cast("bigint")
    # floor-division bucket (negative-safe: floor, not truncation)
    pts = points.withColumn(
        "_ib",
        F.floor(F.expr(f"unix_micros({ts_col})") / us).cast("bigint"),
    )
    ivs = intervals.withColumn(
        "_ib",
        F.explode(
            F.sequence(
                F.floor(F.expr(f"unix_micros({start_col})") / us).cast("bigint"),
                F.floor(F.expr(f"unix_micros({end_col})") / us).cast("bigint"),
            )
        ),
    )
    return (
        pts.join(ivs, [*key_cols, "_ib"])
        .filter(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) <= F.col(end_col))
        )
        .drop("_ib")
    )
