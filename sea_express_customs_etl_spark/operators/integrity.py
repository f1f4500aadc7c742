"""Referential-integrity audit: orphan foreign keys across the star
schema, one row per FK relation.

The reference engine's import path implicitly trusts its keys (the
knowledge table is keyed by normalized text,
/root/reference/src/batch_train.py:109-147, and nothing validates the
member→declaration linkage); a warehouse at 100 TB needs the audit as a
first-class operator, same family as `operators/profiling.py`'s
`table_profile` and `lineitem_constraints`.

Scale shape per relation: the fact side is aggregated to KEY GRAIN
first (one partial-agg shuffle: distinct key + rowcount), so the
anti-join probes |distinct keys| rows, never raw facts; the dim side
projects only its key column. The 6 relation branches are independent
single-row aggregates unioned at the end — each is its own job stage,
nothing is recomputed across branches.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from sea_express_customs_etl_spark.plans.standins import load_table


def orphan_counts(
    fact: DataFrame, fact_key: str, dim: DataFrame, dim_key: str, name: str
) -> DataFrame:
    """One row: relation name, #distinct orphan keys, #orphan rows."""
    keys = fact.groupBy(F.col(fact_key).alias("_k")).agg(
        F.count(F.lit(1)).alias("_rows")
    )
    orphans = keys.join(
        dim.select(F.col(dim_key).alias("_dk")),
        F.col("_k") == F.col("_dk"),
        "left_anti",
    )
    return orphans.agg(
        F.lit(name).alias("relation"),
        F.count(F.lit(1)).cast("bigint").alias("n_orphan_keys"),
        F.coalesce(F.sum("_rows"), F.lit(0)).cast("bigint").alias("n_orphan_rows"),
    )


def fk_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit every FK edge of the testdata star schema."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part")
    n = load_table(spark, sf_dir, "nation")
    branches = [
        orphan_counts(li, "l_orderkey", o, "o_orderkey", "lineitem.l_orderkey->orders"),
        orphan_counts(li, "l_partkey", p, "p_partkey", "lineitem.l_partkey->part"),
        orphan_counts(li, "l_suppkey", s, "s_suppkey", "lineitem.l_suppkey->supplier"),
        orphan_counts(o, "o_custkey", c, "c_custkey", "orders.o_custkey->customer"),
        orphan_counts(c, "c_nationkey", n, "n_nationkey", "customer.c_nationkey->nation"),
        orphan_counts(s, "s_nationkey", n, "n_nationkey", "supplier.s_nationkey->nation"),
    ]
    return reduce(DataFrame.unionByName, branches)
