"""Split conformal prediction over the integer OLS fit —
distribution-free uncertainty quantification (Vovk et al. 2005;
Angelopoulos & Bates 2023 for the modern recipe) with an actually
checkable guarantee: calibrate a residual quantile on one half,
measure coverage on the other; exchangeability alone promises
coverage ≥ 1 − α, and the gate-checked output shows it holding.

Exactness: the fitted line is never materialized as floats — with
calibration moments cxy = nΣxy − S·T and cxx = nΣx² − S² (the
``ols_by_group`` normal equations), every residual is the EXACT
integer

    rs = | n·cxx·y − ( n·cxy·x + (T·cxx − S·cxy) ) |

i.e. |y − ŷ| scaled by the common denominator D = n·cxx — DECIMAL(38,0)
throughout (≈10²⁷ at sf0.01, ≈10³⁰ at sf0.1; past ~10¹² rows train on
a bounded sample, the kmeans_fit_q rule, and ANSI mode fails loudly
rather than wrapping). The conformal quantile is the k-th smallest
calibration residual with k = ⌈(1−α)(n_cal+1)⌉ — an exact order
statistic via the two-phase ``global_rank``, never a float
percentile. Coverage compares same-denominator integers.

Scale shape: one partial-agg moments pass, one 1-row model broadcast
into each half (map-only residuals), the global_rank offset exchange,
and a 1-row quantile broadcast into the test half.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

D38 = "decimal(38,0)"


def split_conformal_coverage(
    df: DataFrame,
    x_c_col: str,
    y_c_col: str,
    id_col: str,
    alpha_ppm: int = 100_000,
) -> DataFrame:
    """Fit on even-``id`` rows, calibrate the |residual| quantile at
    level 1 − α, report held-out coverage on odd-``id`` rows.

    Output: ONE row (n_cal, n_test, k_rank, qhat_c, covered,
    coverage_ppm) — ``qhat_c`` is the interval half-width back in
    centi-units (q DIV D, human-readable), the comparison itself runs
    at the exact D scale."""
    cal = df.filter(F.col(id_col) % 2 == 0)
    test = df.filter(F.col(id_col) % 2 == 1)
    x, y = F.col(x_c_col), F.col(y_c_col)
    mom = cal.agg(
        F.count(F.lit(1)).cast(D38).alias("_n"),
        F.sum(x.cast(D38)).alias("_s"),
        F.sum(y.cast(D38)).alias("_t"),
        F.sum((x * y).cast(D38)).alias("_sxy"),
        F.sum((x * x).cast(D38)).alias("_sxx"),
    ).select(
        "_n",
        F.expr("_n * _sxy - _s * _t").alias("_cxy"),
        F.expr("_n * _sxx - _s * _s").alias("_cxx"),
        "_s",
        "_t",
    )
    rs = (
        f"abs(_n * _cxx * CAST({y_c_col} AS DECIMAL(38,0))"
        f" - (_n * _cxy * CAST({x_c_col} AS DECIMAL(38,0))"
        " + (_t * _cxx - _s * _cxy)))"
    )
    cal_rs = cal.crossJoin(F.broadcast(mom)).select(
        F.col(id_col).alias("_id"), F.expr(rs).alias("_rs")
    )
    from sea_express_customs_etl_spark.operators.ranking import global_rank

    ranked = global_rank(
        cal_rs,
        [F.col("_rs").asc(), F.col("_id").asc()],
        rank_col="_gr",
    )
    # k = ceil((1 - alpha) * (n_cal + 1)), capped at n_cal — the
    # finite-sample conformal rank (integer ceiling division)
    kexpr = (
        "least(CAST(_n AS BIGINT), "
        f"((CAST(_n AS BIGINT) + 1) * {1_000_000 - alpha_ppm}"
        " + 999999) div 1000000)"
    )
    kframe = mom.select(
        F.col("_n").cast("bigint").alias("n_cal"),
        F.expr(kexpr).alias("k_rank"),
    )
    q = (
        ranked.crossJoin(F.broadcast(kframe))
        .filter(F.col("_gr") == F.col("k_rank"))
        .select("n_cal", "k_rank", F.col("_rs").alias("_q"))
    )
    test_rs = test.crossJoin(F.broadcast(mom)).select(
        F.expr(rs).alias("_rs"),
        F.expr("_n * _cxx").alias("_dden"),
    )
    cov = (
        test_rs.crossJoin(F.broadcast(q))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum((F.col("_rs") <= F.col("_q")).cast("bigint"))
            .cast("bigint")
            .alias("covered"),
            F.first("n_cal").alias("n_cal"),
            F.first("k_rank").alias("k_rank"),
            F.first(F.expr("CAST(_q DIV _dden AS BIGINT)")).alias(
                "qhat_c"
            ),
        )
    )
    return cov.select(
        "n_cal",
        "n_test",
        "k_rank",
        "qhat_c",
        "covered",
        F.expr("(1000000 * covered) div n_test").alias("coverage_ppm"),
    )
