"""Business-day calendar arithmetic, closed-form and engine-exact —
the SLA question ("how many working days from order to ship") without
a calendar dimension table or a per-row loop.

Weekday counting is O(1) per row: with ``dm`` = days since the Monday
1969-12-29 (epoch-days + 3, nonnegative for any modern date), the
number of weekdays in [1969-12-29, d) is

    W(d) = 5 · (dm DIV 7) + least(dm MOD 7, 5)

(each full week contributes 5; the partial week contributes its
first ``min(dm mod 7, 5)`` days because the window starts on Monday).
Business days in [a, b) are then ``W(b) − W(a)`` — pure integer
column arithmetic, identical on any engine, no UDF, no generator.
Holidays are out of scope by design (a holiday table would join in as
one more subtrahend at date grain — bounded, never corpus-sized).

Beyond reference parity: the reference's date handling is string
reformatting (src/import_xml_history.py); this adds the calendar
computation every logistics/SLA report needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F


def weekdays_before(date_col: Column) -> Column:
    """Weekdays in [1969-12-29, date) — the prefix-count primitive.
    ``floor(dm/7)`` is exact (dm ≪ 2^52); DIV is avoided only because
    Column has no integral-divide operator outside ``F.expr``."""
    dm = (
        F.datediff(date_col.cast("date"), F.lit("1970-01-01").cast("date"))
        + F.lit(3)
    ).cast("bigint")
    return (
        F.lit(5) * F.floor(dm / F.lit(7)).cast("bigint")
        + F.least(dm % 7, F.lit(5))
    ).cast("bigint")


def business_days_between(start_col: Column, end_col: Column) -> Column:
    """Business days in [start, end) as a BIGINT column (negative when
    end < start, antisymmetric by construction)."""
    return (weekdays_before(end_col) - weekdays_before(start_col)).cast(
        "bigint"
    )


def ship_bizdays_by_priority(
    orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Order→ship business-day latency aggregated by order priority:
    n_lineitems, sum_bizdays, max_bizdays — exact integers, one fact
    join + one partial-aggregated groupBy (the dates arrive on both
    fact rows; nothing here is date-dimension-sized)."""
    j = lineitem.select("l_orderkey", "l_shipdate").join(
        orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    bd = business_days_between(F.col("o_orderdate"), F.col("l_shipdate"))
    return (
        j.select("o_orderpriority", bd.alias("_bd"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lineitems"),
            F.sum("_bd").cast("bigint").alias("sum_bizdays"),
            F.max("_bd").cast("bigint").alias("max_bizdays"),
        )
    )
