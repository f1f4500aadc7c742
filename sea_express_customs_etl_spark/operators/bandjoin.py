"""Banded numeric band-join — pairs with ``|x_a − x_b| ≤ eps`` found
via BUCKET + NEIGHBOR equi-joins instead of a non-equi join.

The naive plan for a band predicate is a nested-loop/cartesian join
(|L|·|R| comparisons — dead at scale). The standard distributed
rewrite: bucket each value by ``floor(x / eps)``; any qualifying pair
lies in the same or adjacent buckets, so ONE side explodes into its
three candidate buckets {b−1, b, b+1} (3× map-side amplification, no
shuffle growth beyond it), the join becomes an equi-join on the bucket
id, and the exact band predicate filters residually. This is the same
blocking discipline as the LSH band join (``operators/dedup.py``) and
the interval join (``clicks_in_error_window``): candidates from an
equi-key, exactness from a residual filter.

Grain reduction first (the fuzzy_join lesson, CLAUDE.md): values
repeat, so pairing runs at DISTINCT-(cell) grain — here (brand,
price-cents) cells with multiplicities — and pair counts multiply the
cell sizes instead of enumerating row pairs. Self-pairs within one
cell contribute C(c, 2).

No reference-parity citation: the reference has no numeric band
operator; this fills the range-join row of the join-family matrix
(equi / asof / interval / band).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from ..plans.cache import tracked_persist


def band_pair_counts(
    df: DataFrame,
    key_col: str,
    value_col: str,
    eps: int,
) -> DataFrame:
    """Unordered within-band pair counts between key groups: for every
    (key_a ≤ key_b), how many row pairs (one from each side, the two
    rows distinct) satisfy ``|value_a − value_b| ≤ eps``.

    ``value_col`` must be integral (quantize first: cents, micro-units)
    and nonnegative; ``eps`` is an integer in the same units.

    Plan: one partial-agg shuffle to (key, value) cells; the LEFT cell
    frame explodes to 3 candidate buckets; one equi-join on bucket; the
    residual band filter + a strict cell order (value, key) dedupes the
    pair (each unordered cell pair is counted exactly once, from its
    lower cell); same-cell self-pairs add C(c, 2). Output: key_a,
    key_b, n_pairs.
    """
    cells = tracked_persist(
        df.select(
            F.col(key_col).alias("_k"), F.col(value_col).alias("_v")
        )
        .groupBy("_k", "_v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
    )
    b = (F.col("_v") / F.lit(eps)).cast("bigint")
    left = cells.select(
        F.col("_k").alias("k_l"),
        F.col("_v").alias("v_l"),
        F.col("_c").alias("c_l"),
        F.explode(
            F.array(b - 1, b, b + 1)
        ).alias("_bkt"),
    )
    right = cells.select(
        F.col("_k").alias("k_r"),
        F.col("_v").alias("v_r"),
        F.col("_c").alias("c_r"),
        b.alias("_bkt"),
    )
    # strict total order on cells: (value, key) — each unordered
    # distinct-cell pair counted once, from the lower cell's bucket row
    cell_lt = (F.col("v_l") < F.col("v_r")) | (
        (F.col("v_l") == F.col("v_r")) & (F.col("k_l") < F.col("k_r"))
    )
    cross = (
        left.join(right, "_bkt")
        .filter(F.abs(F.col("v_l") - F.col("v_r")) <= eps)
        .filter(cell_lt)
        .select(
            F.least("k_l", "k_r").alias("key_a"),
            F.greatest("k_l", "k_r").alias("key_b"),
            (F.col("c_l") * F.col("c_r")).alias("_n"),
        )
    )
    same = cells.select(
        F.col("_k").alias("key_a"),
        F.col("_k").alias("key_b"),
        F.expr("(_c * (_c - 1)) DIV 2").alias("_n"),
    ).filter(F.col("_n") > 0)
    return (
        cross.unionByName(same)
        .groupBy("key_a", "key_b")
        .agg(F.sum("_n").cast("bigint").alias("n_pairs"))
    )
