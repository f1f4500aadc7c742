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
- matching runs at DISTINCT-SCORE grain (the fuzzy_join
  repeated-value rule) as a SORTED TWO-SIDED AS-OF: in 1-D the
  nearest control is always the floor or ceiling neighbor on the
  sorted score axis, found by two rank-equi-joins over the two-phase
  global_rank/global_cumsum primitives — never a caliper-candidate
  pair set (whose density grows with the corpus: the bucketed form
  probed 3.0-3.9x at 8x, this one is two linear shuffles), never a
  corpus cross product or single-partition sort;
- 1-NN per treated = argmin (|delta|, control score, control id) —
  resolved as floor-vs-ceiling with floor winning ties, and the
  min-id champion per control score;
- ATT is emitted as the signed integer numerator plus a
  negate-first-DIV mean (the lm_slice_report convention).

Output (1 row): ``n_treated``, ``n_matched``, ``caliper_c``,
``att_num``, ``att_u6``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from ..plans.cache import tracked_persist
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
    # base is read FOUR times (moments, treated values, control
    # champions, the n_treated count) — without a pin the upstream
    # scoring pipeline (a corpus explode + model join) re-executes per
    # reference (the ≥2-consumers rule; 5.5 s → matching-only cost)
    base = tracked_persist(
        scored.select(
            F.col(id_col).alias("_id"),
            F.col(treated_col).cast("boolean").alias("_t"),
            F.col(score_col).cast("bigint").alias("_s"),
            F.col(outcome_col).cast("bigint").alias("_y"),
        )
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
    # Two-stage scale shape. (1) DISTINCT-SCORE grain (the fuzzy_join
    # repeated-value rule): every treated unit with the same score
    # matches the same control, so matching runs on distinct scores
    # and row counts only join back. (2) SORTED TWO-SIDED AS-OF
    # instead of caliper-bucket pair generation: in 1-D the nearest
    # control is always the floor or ceiling neighbor on the sorted
    # score axis, so each treated value needs TWO rank-equi-joins —
    # never the caliper's whole candidate population (the bucketed
    # form probed 3.0-3.9x at 8x; density inside a caliper grows
    # with the corpus, the two-neighbor lookup does not). The rank /
    # cumsum primitives are the two-phase global_rank family — no
    # single-partition funnel.
    from .ranking import global_cumsum, global_rank

    # both distinct-score frames are model-sized and multiply consumed
    # (tvals: the index union + the match join; cvals: the index union
    # + the rank spine, whose output is itself read twice as floor and
    # ceiling) — pin them so each partial agg over base runs once
    tvals = tracked_persist(
        base.filter(F.col("_t"))
        .groupBy("_s")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("_nt"),
            F.sum("_y").cast("bigint").alias("_syt"),
        )
        .select(F.col("_s").alias("_ts"), "_nt", "_syt")
    )
    # control champion per distinct score: the per-treated tie-break
    # argmin (|delta|, cs, cid) always resolves to the min-cid
    # control of the winning score
    cvals = tracked_persist(
        base.filter(~F.col("_t"))
        .groupBy("_s")
        .agg(F.min(F.struct(F.col("_id"), F.col("_y"))).alias("_ch"))
        .select(F.col("_s").alias("_cs"), F.col("_ch._y").alias("_cy"))
    )
    u = cvals.select(
        F.col("_cs").alias("_s"),
        F.lit(0).alias("_side"),
        F.lit(1).alias("_isc"),
    ).unionByName(
        tvals.select(
            F.col("_ts").alias("_s"),
            F.lit(1).alias("_side"),
            F.lit(0).alias("_isc"),
        )
    )
    # floor index: controls sort before treated at equal score, so a
    # control AT the treated score is its own floor (|delta| = 0)
    cum = global_cumsum(
        u, [F.col("_s").asc(), F.col("_side").asc()], "_isc", "_fidx"
    )
    tidx = cum.filter(F.col("_side") == 1).select(
        F.col("_s").alias("_ts"), "_fidx"
    )
    crk = global_rank(cvals, [F.col("_cs").asc()], rank_col="_cr")
    floor_c = crk.select(
        F.col("_cr").alias("_fidx"),
        F.col("_cs").alias("_fs"),
        F.col("_cy").alias("_fy"),
    )
    ceil_c = crk.select(
        (F.col("_cr") - 1).alias("_fidx"),
        F.col("_cs").alias("_es"),
        F.col("_cy").alias("_ey"),
    )
    j = (
        tvals.join(tidx, "_ts")
        .join(floor_c, "_fidx", "left")
        .join(ceil_c, "_fidx", "left")
        .crossJoin(F.broadcast(scal.select("_c")))
    )
    fl_ok = F.col("_fs").isNotNull() & (
        (F.col("_ts") - F.col("_fs")) <= F.col("_c")
    )
    ce_ok = F.col("_es").isNotNull() & (
        (F.col("_es") - F.col("_ts")) <= F.col("_c")
    )
    best_cy = (
        F.when(
            fl_ok
            & (
                ~ce_ok
                | (
                    (F.col("_ts") - F.col("_fs"))
                    <= (F.col("_es") - F.col("_ts"))
                )
            ),
            F.col("_fy"),
        )
        .when(ce_ok, F.col("_ey"))
        .otherwise(F.lit(None))
    )
    matched = (
        j.withColumn("_cy", best_cy)
        .filter(F.col("_cy").isNotNull())
        .select("_ts", "_nt", "_syt", "_cy")
    )
    stats = matched.agg(
        F.coalesce(F.sum("_nt"), F.lit(0))
        .cast("bigint")
        .alias("n_matched"),
        F.coalesce(
            F.sum(F.col("_syt") - F.col("_nt") * F.col("_cy")), F.lit(0)
        )
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
