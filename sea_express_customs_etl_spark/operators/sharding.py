"""Consistent-hash shard planning — "what moves if we grow the
cluster": assign every key to a shard via a virtual-node hash ring
(Karger et al., STOC 1997 — the memcached/Dynamo placement scheme)
and diff the assignment between N and N+1 shards. The consistent-hash
guarantee — only ~1/(N+1) of keys move, vs ~N/(N+1) under mod-N
hashing — is exactly the repartitioning-cost question a 100 TB store
asks before scaling, and here it is a hash-checkable artifact.

All hashing is the engine-portable md5-60bit recipe; the ring is
|shards|·|vnodes| rows (model-sized, pinned broadcast), and the
successor lookup is ONE aggregation trick: the successor of key hash
h is ``min(struct(vnode_h < h, vnode_h, shard))`` — preferring
vnodes at-or-after h, falling back to the ring's global minimum
(wrap-around) — so assignment is a broadcast fan-out + one
partial-aggregated min-struct per key, no per-key loop, no sort.

Beyond reference parity: the reference is single-node (no placement
layer); this is the scale-out planning primitive its warehouse would
need first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

H60 = (
    "cast(conv(substring(md5({expr}), 1, 15), 16, 10) as bigint)"
)


def _ring(spark: SparkSession, n_shards: int, vnodes: int) -> DataFrame:
    rows = [(s, v) for s in range(n_shards) for v in range(vnodes)]
    ring = spark.createDataFrame(rows, ["shard", "vn"])
    return ring.select(
        "shard",
        F.expr(
            H60.format(expr="concat('ring|', cast(shard as string), "
                            "'|', cast(vn as string))")
        ).alias("_vh"),
    )


def _assign(keys: DataFrame, ring: DataFrame, out_col: str) -> DataFrame:
    """keys: (_k, _h) → (_k, out_col) via the min-struct successor."""
    fan = keys.crossJoin(F.broadcast(ring))
    return (
        fan.groupBy("_k")
        .agg(
            F.min(
                F.struct(
                    (F.col("_vh") < F.col("_h")).alias("_wrap"),
                    F.col("_vh").alias("_vhh"),
                    F.col("shard").alias("_s"),
                )
            ).alias("_t")
        )
        .select("_k", F.col("_t._s").alias(out_col))
    )


def consistent_hash_rebalance(
    keys: DataFrame,
    key_col: str,
    n_before: int = 8,
    n_after: int = 9,
    vnodes: int = 16,
) -> DataFrame:
    """Shard-movement matrix when growing n_before → n_after shards.
    Output: shard_before, shard_after, n_keys (diagonal = unmoved).
    The after-ring is a SUPERSET of the before-ring (same vnode
    hashes for shards < n_before), which is what yields the minimal-
    movement property being demonstrated."""
    from ..plans.cache import tracked_persist

    spark = keys.sparkSession
    k = tracked_persist(
        keys.select(
            F.col(key_col).alias("_k"),
            F.expr(
                H60.format(expr=f"concat('doc|', cast({key_col} as string))")
            ).alias("_h"),
        )
    )  # two consumers: the before- and after-ring assignments
    before = _assign(k, _ring(spark, int(n_before), int(vnodes)),
                     "shard_before")
    after = _assign(k, _ring(spark, int(n_after), int(vnodes)),
                    "shard_after")
    return (
        before.join(after, "_k")
        .groupBy("shard_before", "shard_after")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_keys"))
    )
