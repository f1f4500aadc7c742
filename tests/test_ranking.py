"""Tests for the distributed global rank / ntile (operators/ranking.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from sea_express_customs_etl_spark.operators.ranking import (
    global_rank,
    ntile_by_rank,
)


def _scores(spark, n=257, seed=7):
    # deterministic pseudo-random scores with ties (mod 50)
    return (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            ((F.col("id") * 2654435761 + seed) % 50).alias("score"),
        )
        .repartition(7)  # scramble the input layout
    )


def test_global_rank_matches_single_partition_window(spark):
    df = _scores(spark)
    order = [F.col("score").desc(), F.col("doc_id")]
    got = {
        r.doc_id: r.global_rank
        for r in global_rank(df, order, num_partitions=5).collect()
    }
    want = {
        r.doc_id: r.want
        for r in df.withColumn(
            "want", F.row_number().over(Window.orderBy(*order))
        ).collect()
    }
    assert got == want
    assert sorted(got.values()) == list(range(1, 258))


def test_global_rank_single_row_and_empty(spark):
    one = spark.createDataFrame([(1, 10)], ["doc_id", "score"])
    assert global_rank(one, [F.col("doc_id")]).collect()[0].global_rank == 1
    empty = one.filter(F.lit(False))
    assert global_rank(empty, [F.col("doc_id")]).count() == 0


def test_ntile_matches_spark_builtin(spark):
    df = _scores(spark, n=101)
    order = [F.col("score").desc(), F.col("doc_id")]
    ranked = global_rank(df, order, num_partitions=4)
    got = {r.doc_id: r.bucket for r in ntile_by_rank(ranked, 4).collect()}
    want = {
        r.doc_id: r.b
        for r in df.withColumn(
            "b", F.ntile(4).over(Window.orderBy(*order))
        ).collect()
    }
    assert got == want
    # 101 rows into 4 buckets: sizes 26, 25, 25, 25
    from collections import Counter

    assert sorted(Counter(got.values()).items()) == [
        (1, 26),
        (2, 25),
        (3, 25),
        (4, 25),
    ]


def test_global_rank_plan_has_no_global_sort_funnel(spark):
    """The point of the operator: no single-partition Sort/Window over
    the full frame. The only unpartitioned window allowed is the one
    over the model-sized per-partition counts."""
    df = _scores(spark, n=503)
    plan = global_rank(
        df, [F.col("score").desc(), F.col("doc_id")], num_partitions=6
    )._jdf.queryExecution().executedPlan().toString()
    # the two-phase sort: a range exchange feeds the ranked frame
    assert "rangepartitioning(score" in plan
    # the per-row window is PARTITIONED on the stamped _pid — never an
    # unpartitioned row_number over the full frame
    assert "row_number() windowspecdefinition(_pid" in plan
    # the only SinglePartition exchange feeds the per-partition COUNT
    # aggregate (model-sized: one row per partition), not row data
    before = plan.split("Exchange SinglePartition")[1]
    assert "HashAggregate" in before.split("InMemoryTableScan")[0]
