"""Mergeable histogram quantiles — the single-pass, shuffle-light
percentile path for 100 TB.

The exact form (``percentile(value, q)`` — query
``event_value_percentiles``) sorts every group's values; correct, but
at 100 TB a per-group sort of raw events is the expensive way to learn
a p95. The estimator here is the classic fixed-width histogram sketch:

1. bin every value to an integer bucket (``floor(value·100)`` —
   centi-unit bins) — map-only;
2. ONE partial-aggregated count per (group, bin) — the only shuffle,
   and map-side combine collapses it to |groups|·|occupied bins| rows
   regardless of event count;
3. cumulative counts per group (a window PARTITIONED by group whose
   state is the occupied-bin count — value-range-bounded, corpus-
   independent), then for each requested quantile the smallest bin
   whose cumulative count reaches ``ceil(q·N)``.

The histogram STATE is mergeable by plain addition (sketch of a union
= sum of sketches — the same distributability property as the
HLL/CMS/Bloom family in ``operators/sketches.py``), so shards /
streaming micro-batches combine losslessly. Error is one bin width,
by construction — a DIAL, not a hope.

Determinism/portability: bins are ``floor`` of an IEEE product —
bit-identical in Spark and DuckDB; quantile thresholds are computed in
integer arithmetic (``ceil(q·N) = (N·num + den - 1) div den`` with q
as a rational), so the selected bin hash-matches cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

from ..plans.cache import tracked_persist

CENTI = 100  # bin width = 0.01 value units


def value_histogram(
    df: DataFrame,
    value_col: str = "value",
    group_cols: tuple[str, ...] = ("event_type",),
    scale: int = CENTI,
) -> DataFrame:
    """The sketch state: (group..., bin, n) with integer centi-unit
    bins. Additively mergeable across shards/batches."""
    binned = df.select(
        *group_cols,
        F.floor(F.col(value_col).cast("double") * scale)
        .cast("bigint")
        .alias("bin"),
    )
    return binned.groupBy(*group_cols, "bin").agg(
        F.count(F.lit(1)).alias("n")
    )


def histogram_quantiles(
    hist: DataFrame,
    qs: tuple[tuple[str, int, int], ...] = (
        ("p50", 1, 2),
        ("p95", 19, 20),
        ("p99", 99, 100),
    ),
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Quantiles from the sketch state. ``qs`` is (label, num, den)
    rationals; the answer for q is the LOWER EDGE of the smallest bin
    whose cumulative count reaches ``ceil(q·N)`` (discrete-quantile
    semantics at bin granularity — within one bin width of the exact
    percentile). Output: group..., q, bin (bigint centi-units)."""
    gc = list(group_cols)
    w = (
        Window.partitionBy(*gc)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.select(
        *gc,
        "bin",
        F.sum("n").over(w).alias("_cum"),
        F.sum("n").over(Window.partitionBy(*gc)).alias("_N"),
    )
    spark = hist.sparkSession
    qdf = spark.createDataFrame(list(qs), ["q", "_num", "_den"])
    # ceil(q*N) in integer arithmetic: (N*num + den - 1) div den
    thresh = F.expr("(_N * _num + _den - 1) DIV _den")
    return (
        cum.join(F.broadcast(qdf))
        .filter(F.col("_cum") >= thresh)
        .groupBy(*gc, "q")
        .agg(F.min("bin").alias("bin"))
    )


def sketch_quantiles(
    df: DataFrame,
    value_col: str = "value",
    group_cols: tuple[str, ...] = ("event_type",),
    qs: tuple[tuple[str, int, int], ...] = (
        ("p50", 1, 2),
        ("p95", 19, 20),
        ("p99", 99, 100),
    ),
    scale: int = CENTI,
) -> DataFrame:
    """Convenience composition: histogram state → quantiles."""
    return histogram_quantiles(
        value_histogram(df, value_col, group_cols, scale), qs, group_cols
    )


def winsorize_by_group(
    df: DataFrame,
    value_c_col: str,
    group_cols: tuple[str, ...] = ("event_type",),
    lo: tuple[int, int] = (1, 100),
    hi: tuple[int, int] = (99, 100),
) -> DataFrame:
    """Per-group winsorization from the histogram sketch: clamp the
    (pre-quantized integer) value column to the group's [lo, hi]
    discrete quantiles — the robust-statistics tail treatment (cap
    outliers instead of dropping rows) composed entirely from the
    module's mergeable state: integer bins at unit granularity
    (scale=1: the value IS the bin), quantile = lower edge of the
    first bin reaching ceil(q·N), clamp map-side.

    Plan: one (group, bin)-bounded count shuffle for the histogram,
    the cumulative window bounded by occupied bins, a |groups|-row
    bounds table joined back hint-free (AQE broadcasts it), then a
    map-only ``least(greatest(...))``. Adds ``<value>_winsor`` next to
    the original column."""
    hist = value_histogram(df, value_c_col, group_cols, scale=1)
    qs = (("lo", lo[0], lo[1]), ("hi", hi[0], hi[1]))
    bounds = (
        histogram_quantiles(hist, qs, group_cols)
        .groupBy(*group_cols)
        .agg(
            F.max(F.when(F.col("q") == "lo", F.col("bin"))).alias("_lo"),
            F.max(F.when(F.col("q") == "hi", F.col("bin"))).alias("_hi"),
        )
    )
    out_col = f"{value_c_col}_winsor"
    return (
        df.join(bounds, list(group_cols))
        .withColumn(
            out_col,
            F.least(
                F.greatest(F.col(value_c_col), F.col("_lo")), F.col("_hi")
            ),
        )
        .drop("_lo", "_hi")
    )


def mad_outliers(
    df: DataFrame,
    value_c_col: str,
    group_cols: tuple[str, ...] = ("event_type",),
    keep_cols: tuple[str, ...] = ("event_id",),
    k_tenths: int = 30,
) -> DataFrame:
    """Robust per-group outlier gate: flag rows with

        |x − median| > (k/10) · MAD

    tested in the integer cross-multiplied form ``10·|x − med| >
    k_tenths·mad`` — the median/MAD sibling of
    ``profiling.sigma_outliers``. Mean/σ gates move with the outliers
    they hunt (one 10⁶× spike inflates σ enough to hide nine 10³×
    spikes); the median and the median-absolute-deviation have
    breakdown point ½, the standard robust screen (Hampel).

    Both medians are DISCRETE (lower edge of the first unit bin whose
    cumulative count reaches ceil(N/2) — :func:`histogram_quantiles`
    at scale=1 over pre-quantized integers, so the answer is exact and
    hash-portable, never an interpolated float). Plan: two bounded
    (group, bin) count shuffles (values, then absolute deviations),
    |groups|-row med/mad tables joined back hint-free, map-only
    filter. Groups with MAD = 0 (a majority at one value) flag every
    deviating row — the correct degenerate-robust behavior. Output:
    keep_cols + group_cols + value_c + med_c + mad_c, outliers only."""
    gc = list(group_cols)
    med = (
        histogram_quantiles(
            value_histogram(df, value_c_col, tuple(gc), scale=1),
            (("med", 1, 2),),
            tuple(gc),
        )
        .select(*gc, F.col("bin").alias("med_c"))
    )
    # persisted: feeds BOTH the deviation histogram and the final
    # outlier filter (the CLAUDE.md ≥2-consumers rule)
    with_med = tracked_persist(
        df.join(med, gc).withColumn(
            "_absdev", F.abs(F.col(value_c_col) - F.col("med_c"))
        )
    )
    mad = (
        histogram_quantiles(
            value_histogram(with_med, "_absdev", tuple(gc), scale=1),
            (("mad", 1, 2),),
            tuple(gc),
        )
        .select(*gc, F.col("bin").alias("mad_c"))
    )
    return (
        with_med.join(mad, gc)
        .filter(
            10 * F.abs(F.col(value_c_col) - F.col("med_c"))
            > k_tenths * F.col("mad_c")
        )
        .select(
            *keep_cols,
            *gc,
            F.col(value_c_col).alias("value_c"),
            "med_c",
            "mad_c",
        )
    )


def exact_group_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """EXACT per-group lower median, distributed — the sketch-free
    member of the quantile family (``event_value_qsketch`` is the
    mergeable approximation; this is the audit-grade number a billing
    or compliance report wants). The corpus is ranked ONCE under the
    composite total order (group, value, id) via ``ranking.
    global_rank`` (range shuffle + bounded per-partition windows —
    never a per-group corpus window), each group's median position is
    ``min_rank + (n-1) DIV 2`` computed on the |groups|-row rollup,
    and one dictionary-grain broadcast join picks the row at that
    global rank. Output: group, n_rows, median_value.

    Scale shape: one range shuffle of (group, value, id), one
    partial-aggregated group rollup, one model-sized broadcast join —
    the two-phase discipline of lm_terciles/customer_rfm; ties need no
    break beyond the id column already in the order.
    """
    from .ranking import global_rank

    ranked = global_rank(
        df.select(
            F.col(group_col).alias("_g"),
            F.col(value_col).alias("_v"),
            F.col(id_col).alias("_id"),
        ),
        [F.asc("_g"), F.asc("_v"), F.asc("_id")],
        rank_col="_r",
    )
    pos = ranked.groupBy("_g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.expr("min(_r) + (count(1) - 1) DIV 2").cast("bigint").alias("_t"),
    )
    return (
        ranked.join(F.broadcast(pos), "_g")
        .filter(F.col("_r") == F.col("_t"))
        .select(
            F.col("_g").alias(group_col),
            "n_rows",
            F.col("_v").alias("median_value"),
        )
    )


def trimmed_sums(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    trim_den: int = 10,
) -> DataFrame:
    """Exact two-sided trimmed aggregate per group: drop the bottom
    and top ``n DIV trim_den`` ranks under the (value, id) total order
    and report the surviving count and sum — the robust-mean sibling
    of winsorize (winsorize CLAMPS the tails to the cut values; trim
    REMOVES them; both defeat heavy tails, trim is what "10% trimmed
    mean" means in a stats report). Rank boundaries are exact integer
    positions (never a quantile estimate), so the artifact
    hash-checks. Output: group, n_rows, n_kept, sum_kept (micro-unit
    exact; the mean stays a caller-side rational).

    Scale shape: same two-phase global_rank discipline as
    :func:`exact_group_median` — one range shuffle, per-group bounds
    from the |groups|-row rollup, one dictionary-grain broadcast join,
    one partial-aggregated final sum.
    """
    from .ranking import global_rank

    ranked = global_rank(
        df.select(
            F.col(group_col).alias("_g"),
            F.col(value_col).alias("_v"),
            F.col(id_col).alias("_id"),
        ),
        [F.asc("_g"), F.asc("_v"), F.asc("_id")],
        rank_col="_r",
    )
    bounds = ranked.groupBy("_g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.expr(f"min(_r) + count(1) DIV {int(trim_den)} - 1").alias("_lo"),
        F.expr(
            f"min(_r) + count(1) - count(1) DIV {int(trim_den)} - 1"
        ).alias("_hi"),
    )
    return (
        ranked.join(F.broadcast(bounds), "_g")
        .filter((F.col("_r") > F.col("_lo")) & (F.col("_r") <= F.col("_hi")))
        .groupBy(F.col("_g").alias(group_col))
        .agg(
            F.max("n_rows").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.sum("_v").cast("bigint").alias("sum_kept_u6"),
        )
    )
