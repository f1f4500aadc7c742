"""Layout sink tests: partition pruning, compaction, keyed upsert."""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F

from sea_express_customs_etl_spark.sinks.layout import (
    compact_parquet,
    upsert_parquet,
    write_partitioned,
)


def test_write_partitioned_prunes(spark, tmp_path):
    path = str(tmp_path / "pt")
    df = spark.createDataFrame(
        [("202503", 1), ("202503", 2), ("202504", 3)], "month string, v int"
    )
    write_partitioned(df, path, ("month",), mode="overwrite")
    assert os.path.isdir(os.path.join(path, "month=202503"))

    q = spark.read.parquet(path).filter(F.col("month") == "202503")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(month" in plan
    assert q.count() == 2


def test_compact_parquet(spark, tmp_path):
    path = str(tmp_path / "many")
    spark.range(100).repartition(10).write.parquet(path)
    assert len(glob.glob(os.path.join(path, "*.parquet"))) == 10
    compact_parquet(spark, path, target_files=2)
    assert len(glob.glob(os.path.join(path, "*.parquet"))) == 2
    assert spark.read.parquet(path).count() == 100


def test_upsert_parquet(spark, tmp_path):
    path = str(tmp_path / "kb")
    spark.createDataFrame(
        [("a", "old_a", 1), ("b", "old_b", 1)], "k string, v string, ver int"
    ).write.parquet(path)
    updates = spark.createDataFrame(
        [("b", "new_b", 2), ("c", "new_c", 2)], "k string, v string, ver int"
    )
    upsert_parquet(spark, path, updates, ("k",), version_col="ver")
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got == {"a": "old_a", "b": "new_b", "c": "new_c"}
