"""Propensity-score matching (caliper 1-NN) and the ATT estimate.

Beyond-parity operator (no counterpart in the reference's pandas core
at ``/root/reference``): the third leg of the causal family next to
``did_lift`` (diff-in-diff) and ``cuped_adjusted_lift`` (variance
reduction) — match every treated unit to its nearest control BY
PROPENSITY SCORE within a caliper and average the outcome
differences (Rosenbaum & Rubin 1983; caliper-width practice per
Austin 2011: 0.2 x the score's standard deviation).

Engine-portable spec, all integer:
- scores are the trained classifier's integer dot products (the
  propensity surrogate; monotone in any calibrated transform, and
  matching only uses distances);
- caliper c = max(1, ceil(0.2 * sd)) with sd the EXACT integer
  population standard deviation (``_isqrt_exact`` over DECIMAL
  moments — the Neyman recipe);
- candidate generation is CALIPER-BUCKET BLOCKING (the interval_join
  rewrite): score-buckets of width c, controls attach to buckets
  b-1/b/b+1, so every |delta| <= c pair appears in exactly one
  equi-join — never a corpus cross product, never a global sort;
- 1-NN per treated = argmin (|delta|, control score, control id) —
  total order, WindowGroupLimit-riding rank shape;
- ATT is emitted as the signed integer numerator plus a
  negate-first-DIV mean (the lm_slice_report convention).

Output (1 row): ``n_treated``, ``n_matched``, ``caliper_c``,
``att_num``, ``att_u6``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F

from .sampling import _isqrt_exact

MICRO = 1_000_000


def psm_att(
    scored: DataFrame,
    treated_col: str = "treated",
    score_col: str = "score",
    outcome_col: str = "outcome",
    id_col: str = "doc_id",
) -> DataFrame:
    """``scored``: one row per unit with integer ``score``, integer
    ``outcome``, boolean ``treated``."""
    dec = "decimal(38,0)"
    base = scored.select(
        F.col(id_col).alias("_id"),
        F.col(treated_col).cast("boolean").alias("_t"),
        F.col(score_col).cast("bigint").alias("_s"),
        F.col(outcome_col).cast("bigint").alias("_y"),
    )
    mom = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum(F.col("_s").cast(dec)).alias("_ss"),
        F.sum(F.col("_s").cast(dec) * F.col("_s").cast(dec)).alias("_ss2"),
        F.min("_s").alias("_smin"),
    )
    scal = (
        mom.withColumn(
            "_v",
            F.expr(
                "CAST((CAST(_n AS decimal(38,0)) * _ss2 - _ss * _ss)"
                " DIV (CAST(_n AS decimal(38,0))"
                "      * CAST(_n AS decimal(38,0))) AS BIGINT)"
            ),
        )
        .withColumn("_sd0", _isqrt_exact(F.col("_v")))
        .select(
            "_smin",
            F.greatest(
                F.lit(1).cast("bigint"),
                F.expr("(2 * _sd0 + 9) DIV 10"),
            ).alias("_c"),
        )
    )
    b = base.crossJoin(F.broadcast(scal)).withColumn(
        "_b", F.expr("(_s - _smin) DIV _c")
    )
    treated = b.filter(F.col("_t")).select(
        F.col("_id").alias("_tid"),
        F.col("_s").alias("_ts"),
        F.col("_y").alias("_ty"),
        F.col("_b").alias("_tb"),
        F.col("_c"),
    )
    controls = b.filter(~F.col("_t")).select(
        F.col("_id").alias("_cid"),
        F.col("_s").alias("_cs"),
        F.col("_y").alias("_cy"),
        F.explode(
            F.array(F.col("_b") - 1, F.col("_b"), F.col("_b") + 1)
        ).alias("_tb"),
    )
    cand = treated.join(controls, "_tb").filter(
        F.abs(F.col("_ts") - F.col("_cs")) <= F.col("_c")
    )
    w = Window.partitionBy("_tid").orderBy(
        F.abs(F.col("_ts") - F.col("_cs")).asc(),
        F.col("_cs").asc(),
        F.col("_cid").asc(),
    )
    matched = (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("_tid", "_ty", "_cy")
    )
    stats = matched.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matched"),
        F.coalesce(F.sum(F.col("_ty") - F.col("_cy")), F.lit(0))
        .cast("bigint")
        .alias("att_num"),
    )
    nt = base.filter(F.col("_t")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_treated")
    )
    return (
        nt.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(scal.select(F.col("_c"))))
        .select(
            "n_treated",
            "n_matched",
            F.col("_c").cast("bigint").alias("caliper_c"),
            "att_num",
            F.expr(
                "CAST(CASE WHEN n_matched = 0 THEN 0"
                " WHEN att_num >= 0 THEN"
                f" ({MICRO} * att_num) DIV n_matched"
                f" ELSE -(({MICRO} * (-att_num)) DIV n_matched)"
                " END AS BIGINT)"
            ).alias("att_u6"),
        )
    )
