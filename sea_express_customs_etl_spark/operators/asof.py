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
    carried = unioned
    for c in payload_cols:
        carried = carried.withColumn(
            f"{prefix}{c}",
            F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True).over(w),
        )
    carried = carried.withColumn(
        f"{prefix}{ts_col}",
        F.last(F.when(F.col("_side") == 0, F.col(ts_col)), ignorenulls=True).over(w),
    )
    return carried.filter(F.col("_side") == 1).select(
        *left.columns, *[f"{prefix}{c}" for c in payload_cols], f"{prefix}{ts_col}"
    )
