"""KMV (k-minimum-values) distinct-count sketch — the third mergeable
cardinality sketch in the engine next to HLL (``operators/sketches``)
and CMS: keep the k smallest hash values of the distinct keys; the
k-th smallest estimates the cardinality as ``(k-1) · 2^60 / h_(k)``
(Bar-Yossef et al., RANDOM 2002 — the original distinct-values
sketch). Unlike HLL the KMV state is exactly reproducible across
engines (an ordered list of md5-60bit integers — no float registers,
no harmonic means), so BOTH the sketch state digest (the k-th minimum
itself) and the estimate are hash-checked, not just "close".

Mergeability at 100 TB: union two KMV states by merging the two
k-lists and re-taking the k smallest — associative/commutative/
idempotent, so per-partition states combine map-side like any
partial aggregate; this implementation expresses it as the
row_number-then-filter top-k shape, which Spark rewrites to
WindowGroupLimit (map-side partial top-k — each partition forwards
at most k rows per group).

Beyond reference parity: the reference counts distinct keys exactly
with pandas ``drop_duplicates`` (src/batch_train.py) — viable at
60k rows, not at 10^12; KMV is the fixed-memory answer whose state
the gate can still hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

TWO_POW_60 = 1 << 60


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 16,
    salt: str = "kmv|",
) -> DataFrame:
    """Per-group KMV sketch + estimate. Output: group, k_used (may be
    < k when a group has fewer distinct keys — the estimate is then
    just a deterministic artifact of the full hash list, documented),
    kth_min_h (the sketch digest — the k-th smallest 60-bit md5),
    est_distinct (``(k_used - 1) · 2^60 DIV kth_min_h``, floored).

    Scale shape: one distinct (group, key) aggregate (partial
    map-side), one hash projection, the WindowGroupLimit top-k, one
    final group aggregate. Ties on the 60-bit hash are broken by the
    key itself, keeping the digest deterministic even under an
    (astronomically unlikely) hash collision.
    """
    d = df.select(
        F.col(group_col).alias("_g"), F.col(key_col).alias("_k")
    ).distinct()
    h = d.select(
        "_g",
        "_k",
        F.expr(
            f"cast(conv(substring(md5(concat('{salt}', cast(_k as string))), "
            "1, 15), 16, 10) as bigint)"
        ).alias("_h"),
    )
    w = Window.partitionBy("_g").orderBy("_h", "_k")
    topk = h.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= int(k)
    )
    return topk.groupBy(F.col("_g").alias(group_col)).agg(
        F.count(F.lit(1)).cast("bigint").alias("k_used"),
        F.max("_h").cast("bigint").alias("kth_min_h"),
        # (k-1)·2^60 exceeds int64 (15·2^60 ≈ 1.7e19) — go through
        # DECIMAL(38,0); Spark DIV returns BIGINT on DECIMAL operands
        F.expr(
            f"cast(count(1) - 1 as decimal(38,0)) * {TWO_POW_60} "
            "DIV max(_h)"
        )
        .cast("bigint")
        .alias("est_distinct"),
    )
