"""Distributed global ranking — exact ``row_number``/``ntile`` over a
total order WITHOUT the single-partition window funnel.

``Window.orderBy(...)`` with no ``partitionBy`` sends every row to ONE
task — the canonical Spark scale-killer (fine at 60k rows, dead at
100 TB). The classic fix, expressed here in pure DataFrame ops, is the
two-phase global sort every distributed engine uses internally:

1. ``repartitionByRange`` on the order key — rows land in range-ordered
   partitions (a shuffle Spark performs with sampled boundaries);
2. per-partition ``row_number`` — a PARTITIONED window, bounded state;
3. partition offsets — one count per partition (``spark_partition_id``
   groupBy), a MODEL-sized collect (num_partitions rows, the same
   license as k-means centroid collects), added back via broadcast.

The ranked frame is persisted between the offset count and the final
projection so both jobs see the same physical partitioning (range
boundaries come from sampling; two independent materializations could
legally disagree).

``ntile_by_rank`` reproduces ANSI NTILE arithmetic from the global
rank (first ``N % n`` buckets get one extra row), so the result is
bit-identical to any engine's ``ntile(n) OVER (ORDER BY ...)`` while
every stage stays distributed. Used by the CCNet-style
perplexity-bucketing query (``lm_terciles``): CCNet cuts the corpus
into head/middle/tail thirds by LM score — at 100 TB production would
threshold on sampled quantiles (map-only); this operator is the exact
form, and both reduce to the same buckets up to boundary ties.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F

from ..plans.cache import tracked_persist


def global_rank(
    df: DataFrame,
    order_by: list[Column],
    rank_col: str = "global_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a 1-based dense global row number under the TOTAL order
    ``order_by`` (caller must make it total — include a unique
    tie-break column — or ranks are partitioning-dependent).

    Returns the input columns plus ``rank_col``. The input frame is
    persisted (narrow projection) for boundary stability; callers
    running inside a larger pipeline should unpersist via
    ``result.sparkSession.catalog`` when done.
    """
    n_parts = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"
    )
    # stamp the physical partition id as a CONCRETE column immediately
    # after the range shuffle — later exchanges (the window's, the
    # groupBy's) then carry the value instead of re-evaluating
    # spark_partition_id() on a different partitioning
    ranged = tracked_persist(
        df.repartitionByRange(int(n_parts), *order_by)
        .withColumn("_pid", F.spark_partition_id())
    )
    # model-sized collect path: one (pid, count) row per partition.
    # The unpartitioned window below is what emits Spark's "WindowExec:
    # No Partition Defined" warning in gate logs — intentional: this
    # frame is num_partitions rows (model-sized), never the corpus.
    offsets = (
        ranged.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .select(
            "_pid",
            F.sum("_cnt")
            .over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            )
            .alias("_off"),
        )
        .fillna(0, subset=["_off"])
    )
    within = F.row_number().over(
        Window.partitionBy("_pid").orderBy(*order_by)
    )
    return (
        ranged.withColumn("_rn", within)
        .join(F.broadcast(offsets), "_pid")
        .withColumn(rank_col, (F.col("_off") + F.col("_rn")).cast("bigint"))
        .drop("_pid", "_rn", "_off")
    )


def ntile_by_rank(
    ranked: DataFrame, n: int, rank_col: str = "global_rank"
) -> DataFrame:
    """ANSI NTILE(n) from a global rank: with N rows, the first
    ``N % n`` buckets hold ``N div n + 1`` rows, the rest ``N div n``.
    Adds an int ``bucket`` column (1-based). The total N joins in as a
    1-row broadcast (scalar, the allowed broadcast class)."""
    total = ranked.agg(F.count(F.lit(1)).alias("_N"))
    r = F.col(rank_col)
    big = F.col("_N") % n  # buckets with one extra row
    size_big = (F.col("_N") / n).cast("bigint") + 1  # N div n + 1
    size_small = (F.col("_N") / n).cast("bigint")
    boundary = big * size_big  # last rank inside the "big" buckets
    bucket = F.when(
        r <= boundary, F.ceil(r / size_big)
    ).otherwise(big + F.ceil((r - boundary) / size_small))
    return (
        ranked.join(F.broadcast(total))
        .withColumn("bucket", bucket.cast("int"))
        .drop("_N")
    )


def global_cumsum(
    df: DataFrame,
    order_by: list[Column],
    value_col: str,
    out_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global cumulative sum of ``value_col`` under the TOTAL
    order ``order_by`` (include a unique tie-break) — the weighted
    sibling of :func:`global_rank`, same two-phase shape: range
    shuffle → per-partition cumsum window (bounded state) →
    model-sized per-partition offset collect broadcast back. Never a
    single-partition window funnel."""
    n_parts = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"
    )
    ranged = tracked_persist(
        df.repartitionByRange(int(n_parts), *order_by)
        .withColumn("_pid", F.spark_partition_id())
    )
    # (same "No Partition Defined" warning license as global_rank:
    # the offsets frame is num_partitions rows)
    offsets = (
        ranged.groupBy("_pid")
        .agg(F.sum(value_col).alias("_psum"))
        .select(
            "_pid",
            F.sum("_psum")
            .over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            )
            .alias("_off"),
        )
        .fillna(0, subset=["_off"])
    )
    within = F.sum(value_col).over(
        Window.partitionBy("_pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ranged.withColumn("_cs", within)
        .join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_off") + F.col("_cs")).cast("bigint"))
        .drop("_pid", "_cs", "_off")
    )


def grouped_rank_via_global(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    rank_col: str = "group_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Dense 1-based rank WITHIN each group, without ever sending a
    whole group to one task: rank globally under the composite total
    order (group..., order...) — the two-phase :func:`global_rank`,
    range-shuffled, bounded windows — then subtract each group's
    minimum global rank (a |groups|-row aggregate joined back,
    hint-free). A plain ``Window.partitionBy(group)`` funnels every
    group through a single partition — fatal when groups are
    corpus-sized (5 order priorities × 10¹¹ rows); this shape keeps
    every stage range-partitioned."""
    composite = [F.col(c) for c in group_cols] + list(order_by)
    ranked = global_rank(df, composite, "_gr", num_partitions)
    mins = ranked.groupBy(*group_cols).agg(F.min("_gr").alias("_g0"))
    return (
        ranked.join(mins, group_cols)
        .withColumn(rank_col, (F.col("_gr") - F.col("_g0") + 1).cast("bigint"))
        .drop("_gr", "_g0")
    )


def round_robin_shards(
    ranked: DataFrame,
    n_shards: int,
    rank_col: str = "global_rank",
) -> DataFrame:
    """Difficulty-stratified sharding: documents ordered by a quality/
    difficulty score (the caller's :func:`global_rank` order) dealt
    round-robin into ``n_shards`` — every shard receives the same
    difficulty DISTRIBUTION (rank residues), the property a curriculum
    or mixed-difficulty training run wants from its file shards
    (contrast hash_split: uniform but difficulty-blind; contrast
    contiguous range sharding: each shard is a difficulty stratum).
    Map-only on top of the two-phase rank — adds no shuffle. Output:
    input columns + ``shard`` (int, 0-based)."""
    return ranked.withColumn(
        "shard", ((F.col(rank_col) - 1) % n_shards).cast("int")
    )
