"""Tests: cross-batch stateful dedup stream + shuffle-free bucketed joins."""

from __future__ import annotations

import pyspark.sql.functions as F

from sea_express_customs_etl_spark.sinks.bucketed import bucketed_join, write_bucketed
from sea_express_customs_etl_spark.streaming.stateful import dedup_stream


def test_dedup_stream_across_batches(spark, tmp_path):
    src = str(tmp_path / "dup_events")
    # two files → two potential micro-batches, duplicate keys within and across
    spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "k long, payload string"
    ).repartition(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(2, "d"), (3, "e")], "k long, payload string"
    ).repartition(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema("k long, payload string").option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    # timeout_ms=None for a drain-style run: with a processing-time
    # timeout the availableNow trigger would keep scheduling batches to
    # fire expirations and never terminate
    q = (
        dedup_stream(stream, "k", timeout_ms=None)
        .writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(90)
    finally:
        q.stop()
    rows = spark.sql("select * from dedup_test").collect()
    assert sorted(r.k for r in rows) == [1, 2, 3]  # one row per key, ever


def test_bucketed_join_no_shuffle(spark, tmp_path):
    left = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v1")
    )
    right = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v2")
    )
    write_bucketed(left, "t_left", ("k",), num_buckets=4, sort_cols=("k",))
    write_bucketed(right, "t_right", ("k",), num_buckets=4, sort_cols=("k",))
    try:
        joined = bucketed_join(spark, "t_left", "t_right", ["k"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan  # bucket-local join
        assert joined.count() == 1000
    finally:
        spark.sql("DROP TABLE IF EXISTS t_left")
        spark.sql("DROP TABLE IF EXISTS t_right")
