"""2-D skyline (Pareto frontier) — the "cheapest part at every size
class" / "best price-for-size tradeoff" query (Börzsönyi, Kossmann,
Stocker, ICDE 2001). A row is ON the skyline iff no other row
dominates it: dominates(a, b) ⇔ a minimizes x at least as well AND
maximizes y at least as well, with at least one strict.

Reference parity anchor: the reference's only "best row" notion is
the per-key majority vote (``/root/reference/src/batch_train.py:
118-141``); the skyline is the two-criteria generalization every
procurement/pricing analysis runs.

Algorithm — the sort-based skyline, re-shaped for distribution:

1. **Grain reduction first** (the fuzzy_join dictionary-grain rule):
   aggregate to one row per distinct x with ``ymax(x) = max(y)`` — a
   partial-aggregated shuffle on x. Any row below its own x's ymax is
   dominated at equal x (strict y), so only the grain frame matters.
2. **Strict-prior running max, two-phase**: the classic single-pass
   skyline scans x ascending keeping a running max of y — a GLOBAL
   ordered window, the canonical Spark scale-killer. Re-expressed in
   the ``ranking.global_rank`` shape: range-shuffle the grain frame
   by x, per-partition ``max(ymax) OVER (ROWS UNBOUNDED PRECEDING TO
   1 PRECEDING)`` (bounded state), then one model-sized per-partition
   max collect broadcast back as the cross-partition prefix. No
   single-partition funnel anywhere.
3. A grain row survives iff ``ymax > prior_max`` (strictly-cheaper
   rows all have smaller y) — dominance against CHEAPER x; equal-x
   dominance was resolved by the grain max. Rows join back on
   ``(x, y = ymax)`` to emit every skyline member (ties on both
   coordinates are mutually non-dominating and all kept).

The nullable prior max is compared via ``coalesce(prior, -1)`` — a
sentinel below the nonnegative y domain — rather than engine
``greatest`` NULL semantics, which differ across dialects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

from ..plans.cache import tracked_persist


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    keep_cols: list[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Rows of ``df`` on the (minimize ``x_col``, maximize ``y_col``)
    skyline. Both criteria columns must be integers (pre-quantized by
    the caller) and ``y_col`` nonnegative (the -1 sentinel's domain).
    Output: ``keep_cols + [x_col, y_col]``, skyline members only."""
    spark = df.sparkSession
    n_parts = num_partitions or spark.conf.get(
        "spark.sql.shuffle.partitions", "32"
    )
    grain = df.groupBy(x_col).agg(F.max(y_col).alias("_ymax"))
    ranged = tracked_persist(
        grain.repartitionByRange(int(n_parts), F.col(x_col))
        .withColumn("_pid", F.spark_partition_id())
    )
    # model-sized frame (num_partitions rows) — the unpartitioned
    # window below carries the global_rank WindowExec-warning license
    offsets = (
        ranged.groupBy("_pid")
        .agg(F.max("_ymax").alias("_pmax"))
        .select(
            "_pid",
            F.max("_pmax")
            .over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            )
            .alias("_off"),
        )
    )
    within = F.max("_ymax").over(
        Window.partitionBy("_pid")
        .orderBy(x_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    kept = (
        ranged.withColumn("_prior_in", within)
        .join(F.broadcast(offsets), "_pid")
        .filter(
            F.col("_ymax")
            > F.greatest(
                F.coalesce(F.col("_prior_in"), F.lit(-1)),
                F.coalesce(F.col("_off"), F.lit(-1)),
            )
        )
        .select(F.col(x_col).alias("_kx"), F.col("_ymax").alias("_ky"))
    )
    # renamed join keys, not a self-join equality — kept derives from
    # df, so qualified df[col] references would be ambiguous
    return (
        df.join(
            kept,
            (F.col(x_col) == F.col("_kx")) & (F.col(y_col) == F.col("_ky")),
        )
        .select(*keep_cols, x_col, y_col)
    )
