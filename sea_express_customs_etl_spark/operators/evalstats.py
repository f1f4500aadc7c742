"""Exact classifier-evaluation statistics over INTEGER scores — the
ranking-quality half of the eval harness (``perceptron.confusion_stats``
covers the thresholded half). Re-expresses the reference's
audit-the-output discipline (src/import_xml_history.py's per-batch
count reconciliation) for model-quality outputs.

AUC is computed through the Mann–Whitney U identity

    AUC = (#{(p, n): s_p > s_n} + ½·#{s_p = s_n}) / (n_pos·n_neg)

evaluated at DISTINCT-SCORE grain: group once by score value into
(pos, neg) counts, take an exact global cumulative sum of ``neg``
under ascending score (``ranking.global_cumsum`` — the two-phase
range-shuffle shape, never a single-partition window), and fold

    pairs_gt = Σ_s pos(s) · cum_neg(< s)        pairs_eq = Σ_s pos(s)·neg(s)

Everything is bigint arithmetic on counts — no float ever appears, so
the result is aggregation-order-exact and hash-stable (the repo's
float-through-arithmetic rule). ``auc_ppm`` doubles the numerator to
keep the ½-tie term integral: ppm = 1e6·(2·gt + eq) DIV (2·n_pos·n_neg).

Scale shape: one partial-agg shuffle to score grain (vocabulary-of-
scores-bounded, ≤ corpus but typically far smaller), one range
shuffle for the cumsum, one scalar fold. The pair counts themselves
are never materialized pairwise — n_pos·n_neg enters only as a final
scalar product (DECIMAL(38,0) internally; outputs stay int64-safe:
ppm ≤ 1e6 and the pair counts are emitted only after an int64 guard
at the call sites' scales — see tests/test_output_envelope.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from .ranking import global_cumsum, global_rank, ntile_by_rank


def auc_exact(
    scored: DataFrame, score_col: str = "score", label_col: str = "truth"
) -> DataFrame:
    """One-row exact ROC-AUC of integer ``score_col`` against 0/1
    ``label_col``: n_pos, n_neg, pairs_gt, pairs_eq, auc_ppm."""
    g = scored.groupBy(score_col).agg(
        F.sum(F.col(label_col)).cast("bigint").alias("pos"),
        F.sum(1 - F.col(label_col)).cast("bigint").alias("neg"),
    )
    c = global_cumsum(g, [F.col(score_col)], "neg", out_col="_cum_neg")
    agg = c.agg(
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.sum("neg").cast("bigint").alias("n_neg"),
        F.sum(F.col("pos") * (F.col("_cum_neg") - F.col("neg")))
        .cast("bigint")
        .alias("pairs_gt"),
        F.sum(F.col("pos") * F.col("neg")).cast("bigint").alias("pairs_eq"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        "pairs_gt",
        "pairs_eq",
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0))"
            " * (2 * pairs_gt + pairs_eq))"
            " DIV (CAST(2 AS DECIMAL(38,0)) * n_pos * n_neg) AS BIGINT)"
        ).alias("auc_ppm"),
    )


def score_deciles(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "truth",
    tie_col: str = "doc_id",
    n: int = 10,
) -> DataFrame:
    """Reliability table: rank every row under the TOTAL order
    (score ASC, tie ASC) with the two-phase ``global_rank``, cut into
    ``n`` ANSI-NTILE buckets, and report per-bucket volume, positive
    rate, and the integer score span — the calibration-curve input
    (bucket 10 should be near-all-positive for a useful ranker, bucket
    1 near-none). Output: bucket, n_rows, n_pos, pos_ppm, score_min,
    score_max. All bigint; bucket boundaries are rank-exact, so the
    table is partitioning-independent."""
    ranked = global_rank(
        scored.select(score_col, label_col, tie_col),
        [F.col(score_col).asc(), F.col(tie_col).asc()],
        rank_col="_r",
    )
    return (
        ntile_by_rank(ranked, n, rank_col="_r")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col(label_col)).cast("bigint").alias("n_pos"),
            F.min(score_col).cast("bigint").alias("score_min"),
            F.max(score_col).cast("bigint").alias("score_max"),
        )
        .select(
            "bucket",
            "n_rows",
            "n_pos",
            F.expr("(1000000 * n_pos) DIV n_rows").alias("pos_ppm"),
            "score_min",
            "score_max",
        )
    )


def cohens_kappa(
    labeled: DataFrame, a_col: str = "a", b_col: str = "b"
) -> DataFrame:
    """Cohen's kappa between two binary annotators (Cohen 1960 —
    public): chance-corrected agreement, the label-quality readout a
    preference/classification data pipeline runs before trusting its
    annotations. With po = (n11+n00)/N and pe = (a1·b1 + a0·b0)/N²,

        kappa = (po − pe)/(1 − pe)
              = (N·(n11+n00) − (a1·b1 + a0·b0)) / (N² − (a1·b1+a0·b0))

    — one exact integer rational. Kappa can be NEGATIVE (worse than
    chance), and integer division of a negative numerator is
    convention-dependent across engines (CLAUDE.md), so the micro-unit
    quotient divides |num| and re-applies the sign. One count shuffle
    over the (a, b) cells; everything after is 4-row arithmetic.
    Output: 1 row (n11, n10, n01, n00, kappa_u6)."""
    cells = labeled.groupBy(a_col, b_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("_n")
    )
    g = cells.agg(
        F.sum(F.when((F.col(a_col) == 1) & (F.col(b_col) == 1), F.col("_n")).otherwise(F.lit(0))).cast("bigint").alias("n11"),
        F.sum(F.when((F.col(a_col) == 1) & (F.col(b_col) == 0), F.col("_n")).otherwise(F.lit(0))).cast("bigint").alias("n10"),
        F.sum(F.when((F.col(a_col) == 0) & (F.col(b_col) == 1), F.col("_n")).otherwise(F.lit(0))).cast("bigint").alias("n01"),
        F.sum(F.when((F.col(a_col) == 0) & (F.col(b_col) == 0), F.col("_n")).otherwise(F.lit(0))).cast("bigint").alias("n00"),
    )
    return g.select(
        "n11",
        "n10",
        "n01",
        "n00",
        F.expr(
            "CAST(CASE WHEN"
            " ((n11+n10+n01+n00) * (n11+n00)"
            "  - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00))) >= 0"
            " THEN (1000000 * ((n11+n10+n01+n00) * (n11+n00)"
            "       - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00))))"
            "      DIV ((n11+n10+n01+n00) * (n11+n10+n01+n00)"
            "           - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00)))"
            " ELSE -((1000000 * (((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00))"
            "        - (n11+n10+n01+n00) * (n11+n00)))"
            "      DIV ((n11+n10+n01+n00) * (n11+n10+n01+n00)"
            "           - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00))))"
            " END AS BIGINT)"
        ).alias("kappa_u6"),
    )
