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
  sorted score axis, found by rank-equi-joins over ONE fused
  two-phase global_cumsum pass (the inclusive control-indicator
  cumsum doubles as the control rank spine) — never a
  caliper-candidate pair set (whose density grows with the corpus:
  the bucketed form probed 3.0-3.9x at 8x, this one is one linear
  shuffle), never a corpus cross product or single-partition sort;
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
    base = scored.select(
        F.col(id_col).alias("_id"),
        F.col(treated_col).cast("boolean").alias("_t"),
        F.col(score_col).cast("bigint").alias("_s"),
        F.col(outcome_col).cast("bigint").alias("_y"),
    )
    # ONE partial-aggregated groupBy collapses the corpus to
    # (distinct score, side) grain — every downstream consumer
    # (moments, treated values, control champions, n_treated) derives
    # from this pinned frame, so the upstream scoring pipeline (a
    # corpus explode + model join) executes exactly once and the four
    # former base scans (r10: ~130 residual small exchanges) become
    # filters over one model-sized cache (guide §2.3/§2.4).
    grouped = tracked_persist(
        base.groupBy("_s", "_t").agg(
            F.count(F.lit(1)).cast("bigint").alias("_n"),
            F.sum("_y").cast("bigint").alias("_sy"),
            F.min(F.struct(F.col("_id"), F.col("_y"))).alias("_ch"),
        )
    )
    # moments over groups are row-moment-exact: Σ_rows s = Σ_g s·n_g,
    # Σ_rows s² = Σ_g s²·n_g (integer decimal arithmetic both ways)
    mom = grouped.agg(
        F.sum("_n").cast("bigint").alias("_n"),
        F.sum(F.col("_s").cast(dec) * F.col("_n").cast(dec)).alias("_ss"),
        F.sum(
            F.col("_s").cast(dec)
            * F.col("_s").cast(dec)
            * F.col("_n").cast(dec)
        ).alias("_ss2"),
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
    from .ranking import global_cumsum

    # distinct-score side frames, both filters over the one pinned
    # grouped table. Control champion per distinct score: the
    # per-treated tie-break argmin (|delta|, cs, cid) always resolves
    # to the min-cid control of the winning score.
    tvals = grouped.filter(F.col("_t")).select(
        F.col("_s").alias("_ts"),
        F.col("_n").alias("_nt"),
        F.col("_sy").alias("_syt"),
    )
    cvals = grouped.filter(~F.col("_t")).select(
        F.col("_s").alias("_cs"), F.col("_ch._y").alias("_cy")
    )
    # ONE fused two-phase pass replaces the former global_cumsum +
    # global_rank pair: under the (_s asc, _side asc) total order the
    # INCLUSIVE cumsum of the control indicator IS, on a control row,
    # that control's 1-based rank among controls — so the same pass
    # yields the treated floor index AND the control rank spine, with
    # the per-side payloads (_nt/_syt, _cy) carried through the union
    # so no join back to tvals is needed afterwards.
    u = cvals.select(
        F.col("_cs").alias("_s"),
        F.lit(0).alias("_side"),
        F.lit(1).alias("_isc"),
        F.lit(None).cast("bigint").alias("_nt"),
        F.lit(None).cast("bigint").alias("_syt"),
        F.col("_cy"),
    ).unionByName(
        tvals.select(
            F.col("_ts").alias("_s"),
            F.lit(1).alias("_side"),
            F.lit(0).alias("_isc"),
            "_nt",
            "_syt",
            F.lit(None).cast("bigint").alias("_cy"),
        )
    )
    # floor index: controls sort before treated at equal score, so a
    # control AT the treated score is its own floor (|delta| = 0);
    # cum is consumed three ways (treated rows, floor spine, ceiling
    # spine) — pin it (the ≥2-consumers rule)
    cum = tracked_persist(
        global_cumsum(
            u, [F.col("_s").asc(), F.col("_side").asc()], "_isc", "_fidx"
        )
    )
    tidx = cum.filter(F.col("_side") == 1).select(
        F.col("_s").alias("_ts"), "_nt", "_syt", "_fidx"
    )
    floor_c = cum.filter(F.col("_side") == 0).select(
        F.col("_fidx"),
        F.col("_s").alias("_fs"),
        F.col("_cy").alias("_fy"),
    )
    ceil_c = cum.filter(F.col("_side") == 0).select(
        (F.col("_fidx") - 1).alias("_fidx"),
        F.col("_s").alias("_es"),
        F.col("_cy").alias("_ey"),
    )
    j = (
        tidx.join(floor_c, "_fidx", "left")
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
    # n_treated rides the grouped table too (Σ per-score counts)
    nt = grouped.filter(F.col("_t")).agg(
        F.coalesce(F.sum("_n"), F.lit(0)).cast("bigint").alias("n_treated")
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
