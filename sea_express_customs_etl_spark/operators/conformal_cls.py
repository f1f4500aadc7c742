"""Split conformal CLASSIFICATION — prediction sets with guaranteed
coverage (Vovk et al. 2005; the classification leg beside
``conformal.split_conformal_coverage``'s regression intervals): for a
binary scorer, the nonconformity of labeling a doc with class y is
the signed margin a = −y·s (y ∈ {−1, +1}); calibrate its
⌈(1−α)(n+1)⌉-th order statistic on true labels of the calibration
half, then a test doc's prediction SET contains every y whose
nonconformity is ≤ q. Coverage (true label ∈ set) is guaranteed
≥ 1 − α under exchangeability; the abstention structure is the
payoff — ambiguous docs get BOTH labels instead of a coin flip, and
the set-size histogram is the classifier's honest uncertainty
report.

Exactness: scores are the repo's integer perceptron scores; the
quantile is an exact order statistic via two-phase ``global_rank``;
every set decision is an integer comparison. Output is aggregated to
the auditable 1-row summary (n_cal, n_test, k_rank, q_score,
covered, coverage_ppm, n_both, n_single, n_empty) — every count
hash-pinned.

Scale shape: one rank exchange on the calibration half, 1-row
quantile broadcast into the test half, map-only set membership.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def conformal_label_sets(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "truth",
    id_col: str = "doc_id",
    alpha_ppm: int = 100_000,
) -> DataFrame:
    """``scored``: (id, score int, truth 0/1). Even ids calibrate,
    odd ids are evaluated. y is mapped to ±1; a = −y·s."""
    # No pin on scored (r10 VERDICT #10: the r10 pin read 2.12→2.64 s
    # in driver data and 3.7 vs 3.3 s unpinned in the r11 A/B probe —
    # a 2-consumer pin on a scan whose exchanges Spark already reuses
    # costs more than it saves). The calibration side is materialized
    # once anyway by global_rank's internal range-shuffle pin, and
    # n_cal below reads THAT pin instead of re-running the upstream.
    y = (2 * F.col(label_col) - 1).cast("bigint")
    s = F.col(score_col).cast("bigint")
    cal = (
        scored.filter(F.col(id_col) % 2 == 0)
        .select(F.col(id_col).alias("_id"), (-y * s).alias("_a"))
    )
    from sea_express_customs_etl_spark.operators.ranking import global_rank

    ranked = global_rank(
        cal, [F.col("_a").asc(), F.col("_id").asc()], rank_col="_gr"
    )
    # count over ranked ≡ count over cal (global_rank is 1:1) and it
    # reads the rank pass's internal pin, not the scoring pipeline
    nfr = ranked.agg(F.count(F.lit(1)).cast("bigint").alias("n_cal"))
    kexpr = (
        "least(n_cal, ((n_cal + 1) * "
        f"{1_000_000 - alpha_ppm} + 999999) div 1000000)"
    )
    kframe = nfr.select("n_cal", F.expr(kexpr).alias("k_rank"))
    q = (
        ranked.crossJoin(F.broadcast(kframe))
        .filter(F.col("_gr") == F.col("k_rank"))
        .select("n_cal", "k_rank", F.col("_a").alias("_q"))
    )
    test = scored.filter(F.col(id_col) % 2 == 1).select(
        y.alias("_y"), s.alias("_s")
    )
    sets = test.crossJoin(F.broadcast(q)).select(
        "n_cal",
        "k_rank",
        "_q",
        "_y",
        (-F.col("_s") <= F.col("_q")).cast("int").alias("_in_pos"),
        (F.col("_s") <= F.col("_q")).cast("int").alias("_in_neg"),
    )
    covered = F.when(F.col("_y") > 0, F.col("_in_pos")).otherwise(
        F.col("_in_neg")
    )
    size = F.col("_in_pos") + F.col("_in_neg")
    return (
        sets.groupBy("n_cal", "k_rank")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.first("_q").cast("bigint").alias("q_score"),
            F.sum(covered).cast("bigint").alias("covered"),
            F.sum((size == 2).cast("int")).cast("bigint").alias("n_both"),
            F.sum((size == 1).cast("int")).cast("bigint").alias(
                "n_single"
            ),
            F.sum((size == 0).cast("int")).cast("bigint").alias(
                "n_empty"
            ),
        )
        .select(
            "n_cal",
            "n_test",
            "k_rank",
            "q_score",
            "covered",
            F.expr("(1000000 * covered) div n_test").alias(
                "coverage_ppm"
            ),
            "n_both",
            "n_single",
            "n_empty",
        )
    )
