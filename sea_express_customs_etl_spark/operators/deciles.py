"""Value-decile migration — the classic CRM/cohort question "which
spend decile did each customer move to between period A and period
B", as a (decile_from, decile_to) transition matrix. Deciles are
computed over EACH period's full active population (the business
definition), then the matrix counts customers present in both.

Decile assignment is engine-exact: rank customers by (spend DESC,
key) — a total order — and bucket as ``((rank - 1) · n_buckets) DIV
n``: no NTILE, whose remainder-distribution rules would have to be
trusted to match across engines; this formula IS the definition on
both sides.

Scale shape: per-period spend is one partial-aggregated groupBy of
the fact table; the global rank runs through
``ranking.global_rank`` (range shuffle + bounded per-partition
windows + a |partitions|-row offset broadcast — never a
single-partition corpus window); the period population count is a
1-row broadcast; the final migration join is customer-grained.

Beyond reference parity: the reference has no ranking layer; this
extends the RFM/segmentation family (``customer_rfm``) with the
period-over-period transition view a retention team actually reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from ..plans.cache import tracked_persist
from .ranking import global_rank


def decile_of(
    spend: DataFrame,
    key_col: str,
    value_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """(key, value) → (key, bucket): rank by (value DESC, key), bucket
    ``((rank-1) · n_buckets) DIV n``. Bucket 0 is the TOP decile."""
    ranked = global_rank(
        spend.select(F.col(key_col).alias("_k"), F.col(value_col).alias("_v")),
        [F.desc("_v"), F.asc("_k")],
        rank_col="_r",
    )
    n = ranked.groupBy().agg(F.count(F.lit(1)).alias("_n"))
    return (
        ranked.join(F.broadcast(n))
        .select(
            F.col("_k").alias(key_col),
            F.expr(f"((_r - 1) * {int(n_buckets)}) DIV _n")
            .cast("bigint")
            .alias("bucket"),
        )
    )


def decile_migration(
    facts: DataFrame,
    key_col: str,
    period_col: str,
    value_col: str,
    period_a,
    period_b,
    n_buckets: int = 10,
) -> DataFrame:
    """Transition matrix of per-key value deciles from ``period_a`` to
    ``period_b``. Output: decile_from, decile_to, n_keys."""
    spend = tracked_persist(
        facts.filter(F.col(period_col).isin(period_a, period_b))
        .groupBy(key_col, period_col)
        .agg(F.sum(value_col).alias("_sp"))
    )  # two consumers: the per-period decile branches
    da = decile_of(
        spend.filter(F.col(period_col) == period_a), key_col, "_sp", n_buckets
    ).withColumnRenamed("bucket", "decile_from")
    db = decile_of(
        spend.filter(F.col(period_col) == period_b), key_col, "_sp", n_buckets
    ).withColumnRenamed("bucket", "decile_to")
    return (
        da.join(db, key_col)
        .groupBy("decile_from", "decile_to")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_keys"))
    )
