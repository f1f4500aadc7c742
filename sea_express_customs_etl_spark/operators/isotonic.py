"""Isotonic calibration of a classifier's reliability table — PAVA's
solution via the exact MINIMAX closed form (Ayer et al. 1955;
Robertson, Wright & Dykstra 1988; Zadrozny & Elkan 2002 for the
calibration use), so the data-dependent pool-adjacent-violators
control flow never has to be replayed: over score buckets

    iso(i) = max_{j ≤ i} min_{k ≥ i} rate_u6(j, k)
    rate_u6(j, k) = (10⁶ · Σ_{b=j..k} n_pos) DIV Σ_{b=j..k} n_rows

The u6-ROUNDED-rate spec (round each pooled rate before comparing)
makes every comparison an integer one — deterministic on both
engines — and differs from real-rational PAVA by at most one ppm per
pool, which the docstring owns rather than hides. The result is
monotone non-decreasing in the bucket order by construction (max of
mins over nested index sets).

Beyond-parity operator; input is the :func:`evalstats.score_deciles`
reliability table, so calibration plugs onto every scored classifier
in the repo. Scale: everything here runs at BUCKET grain (n ≤ a few
dozen rows — model-sized); the n³ range enumeration is over buckets,
never over corpus rows, and every join side is pinned broadcast under
the model-sized license.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def isotonic_from_deciles(
    deciles: DataFrame, bucket_col: str = "bucket"
) -> DataFrame:
    """Append ``iso_ppm`` (the isotonic-calibrated positive rate) to a
    reliability table with columns (bucket, n_rows, n_pos, pos_ppm,
    ...). Output: bucket, n_rows, n_pos, pos_ppm, iso_ppm."""
    # the reliability table is referenced FIVE times below (range
    # sums, j/k spines, the i spine, the final join) — without a cut,
    # the WHOLE upstream scoring pipeline re-executes per reference
    # (222 Exchange nodes / 25 s cold at sf0.1). It is n-bucket rows
    # (model-sized), so an eager localCheckpoint is free and flattens
    # every reference to a scan of the materialized 10 rows.
    deciles = deciles.localCheckpoint()
    b = deciles.select(
        F.col(bucket_col).alias("_b"),
        F.col("n_rows").alias("_nr"),
        F.col("n_pos").alias("_np"),
    )
    jj = deciles.select(F.col(bucket_col).alias("_j"))
    kk = deciles.select(F.col(bucket_col).alias("_k"))
    ranges = (
        jj.join(F.broadcast(kk), F.col("_j") <= F.col("_k"))
        .join(
            F.broadcast(b),
            (F.col("_b") >= F.col("_j")) & (F.col("_b") <= F.col("_k")),
        )
        .groupBy("_j", "_k")
        .agg(F.sum("_nr").alias("_rows"), F.sum("_np").alias("_pos"))
        .select(
            "_j",
            "_k",
            F.expr("(1000000 * _pos) div _rows").alias("_rate"),
        )
    )
    iso = (
        deciles.select(F.col(bucket_col).alias("_i"))
        .join(
            F.broadcast(ranges),
            (F.col("_j") <= F.col("_i")) & (F.col("_k") >= F.col("_i")),
        )
        .groupBy("_i", "_j")
        .agg(F.min("_rate").alias("_mn"))
        .groupBy("_i")
        .agg(F.max("_mn").cast("bigint").alias("iso_ppm"))
    )
    return deciles.join(
        iso, deciles[bucket_col] == iso["_i"]
    ).select(
        bucket_col, "n_rows", "n_pos", "pos_ppm", "iso_ppm"
    )
