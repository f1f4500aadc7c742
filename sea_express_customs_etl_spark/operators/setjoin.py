"""Exact set-similarity join by DELETION NEIGHBORHOODS — all pairs of
small sets within ONE DELETION PER SIDE (|A∖B| ≤ 1 and |B∖A| ≤ 1:
equal, one-element insert/delete, or a one-element swap), found
WITHOUT an all-pairs comparison: each set emits md5 keys of itself
and of every one-element-removed subset; two qualifying sets
necessarily share a key:

    A = B           → full keys match
    A = B ∪ {x}     → A∖{x} is B's full key
    one-for-one swap → A∖{y} = B∖{x} for the differing x, y

(the |A| = |B|+2 superset case is NOT in scope — per-side distance 1
is the FastSS neighborhood; two-deletion keys would widen it at
C(n,2) key cost.)

This is the deletion-neighborhood blocking of SSJoin/FastSS —
candidate volume is Σ(|basket|+1) keys, linear in the data for
bounded set sizes (baskets, tag sets, n-gram shingles), against the
|n|² a naive pair join costs. The EMPTY deletion key (two singletons
always "match") is excluded by construction: singleton↔singleton
pairs are the degenerate Δ≤2 class and would pair every singleton
with every other — the quadratic hub this blocking exists to avoid.
The residual verify recomputes the exact symmetric difference on the
candidates only (the LSH-band discipline: candidates from an
equi-key, exactness from a filter).

No reference-parity citation: extends the dedup family
(``operators/dedup.py``) with the EXACT small-set join none of the
probabilistic members (minhash/simhash) provide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from ..plans.cache import tracked_persist


def deletion_neighbor_pairs(
    df: DataFrame, id_col: str, item_col: str
) -> DataFrame:
    """All id pairs whose DISTINCT item sets are within one deletion
    per side and share at least one element (see module doc for scope;
    pure singleton pairs excluded with the empty key). Input:
    (id, item) rows, duplicates tolerated. Output: id_a < id_b,
    size_a, size_b, n_common, sym_diff — exact, verified values.
    """
    baskets = tracked_persist(
        df.select(F.col(id_col).alias("_id"), F.col(item_col).alias("_it"))
        .groupBy("_id")
        .agg(F.sort_array(F.collect_set("_it")).alias("_arr"))
    )  # scans: key explode + two verify sides
    n = F.size("_arr")
    # index 0 = the full set; index i>0 = drop element i (1-based)
    keys = baskets.select(
        "_id",
        "_arr",
        F.explode(F.sequence(F.lit(0), n)).alias("_i"),
    ).select(
        "_id",
        F.md5(
            F.concat_ws(
                ",",
                F.filter(
                    F.col("_arr"), lambda x, j: j + 1 != F.col("_i")
                ).cast("array<string>"),
            )
        ).alias("_k"),
        (n - F.when(F.col("_i") > 0, 1).otherwise(0)).alias("_klen"),
    ).filter(F.col("_klen") >= 1)
    cand = (
        keys.alias("l")
        .join(keys.alias("r"), "_k")
        .filter(F.col("l._id") < F.col("r._id"))
        .select(
            F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b")
        )
        .distinct()
    )
    verified = (
        cand.join(
            baskets.select(
                F.col("_id").alias("id_a"), F.col("_arr").alias("_aa")
            ),
            "id_a",
        )
        .join(
            baskets.select(
                F.col("_id").alias("id_b"), F.col("_arr").alias("_ab")
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.size("_aa").alias("size_a"),
            F.size("_ab").alias("size_b"),
            F.size(F.array_intersect("_aa", "_ab")).alias("n_common"),
        )
        .withColumn(
            "sym_diff",
            F.col("size_a") + F.col("size_b") - 2 * F.col("n_common"),
        )
        .filter(
            (F.col("size_a") - F.col("n_common") <= 1)
            & (F.col("size_b") - F.col("n_common") <= 1)
            & (F.col("n_common") >= 1)
        )
    )
    return verified
