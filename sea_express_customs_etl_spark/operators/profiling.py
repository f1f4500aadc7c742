"""Warehouse-ops: table profiling, constraint checking, latest-by-key.

The reference trusts its inputs blindly (/root/reference/src/
process_excel_order.py parses and inserts — a malformed qty or an
out-of-range date lands in MySQL unchecked, surfacing weeks later in
training); these operators are the data-quality layer a production
lake runs on every load:

* :func:`profile_table` — ANALYZE-style per-column statistics (row
  count, nulls, distincts, min/max) in ONE pass; the numbers that
  feed both optimizer stats and drift monitoring.
* :func:`check_constraints` — dbt-test-style rule evaluation: one
  aggregate scan, one row per rule with its violation count. Rules
  are arbitrary boolean Columns, so anything Catalyst can express is
  checkable (range, pattern, cross-column ordering).
* :func:`latest_by_key` — CDC/event-stream compaction to current
  state: the max-struct aggregate form (partial-aggregatable, no
  window sort), deterministic under ties via an explicit tiebreak
  column.

Scale shapes: profiling is one aggregate whose multi-distinct expands
to |cols| grouping passes (Spark's Expand — the standard cost of exact
NDV; swap ``approx_count_distinct`` in at 100 TB where ±2% is fine and
the pass collapses to one). Constraints are a single map-side
conditional-sum aggregate — cost of one scan regardless of rule
count. latest_by_key is one partial-aggregated shuffle on the key.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F


def _sql_str(name: str) -> str:
    """Embed a caller-supplied name as a SQL string literal inside the
    generated stack() expression — single quotes doubled, so a name
    containing a quote or comma can't break parsing (ADVICE r4)."""
    return "'" + name.replace("'", "''") + "'"


def profile_table(
    df: DataFrame, cols: Sequence[str], exact_ndv: bool = True
) -> DataFrame:
    """One row per profiled column: column, n_rows, n_nulls,
    n_distinct (excludes NULL), lo / hi (min/max cast to
    string so heterogeneous column types stack into one frame).

    ``exact_ndv=True`` uses ``countDistinct`` — exact, but Spark
    rewrites multiple distinct aggregates via Expand, multiplying the
    scanned rows |cols|-fold. ``exact_ndv=False`` swaps in
    ``approx_count_distinct`` (HLL++, ±2.3% default rsd): all columns
    profile in ONE partial-aggregated pass with no Expand — the 100 TB
    form. The plan shape difference is pinned by
    tests/test_profiling.py::test_profile_approx_no_expand."""
    ndv = F.countDistinct if exact_ndv else F.approx_count_distinct
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        aggs += [
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"_nulls_{i}"),
            ndv(F.col(c)).alias(f"_nd_{i}"),
            F.min(F.col(c)).cast("string").alias(f"_lo_{i}"),
            F.max(F.col(c)).cast("string").alias(f"_hi_{i}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"{_sql_str(c)}, _nulls_{i}, _nd_{i}, _lo_{i}, _hi_{i}"
        for i, c in enumerate(cols)
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_nulls, n_distinct, lo, hi)"
        ),
        F.col("_n").alias("n_rows"),
    ).select("column", "n_rows", "n_nulls", "n_distinct", "lo", "hi")


def check_constraints(
    df: DataFrame, rules: Mapping[str, Column]
) -> DataFrame:
    """Evaluate named boolean rules in one scan. Output: one row per
    rule — rule, n_rows, n_violations (rows where the rule is FALSE
    **or NULL** — an unevaluable rule is a violation, the conservative
    dbt semantics), pass (violations == 0)."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    names = list(rules)
    for i, name in enumerate(names):
        cond = rules[name]
        aggs.append(
            F.sum(
                F.when(cond.isNull() | ~cond, F.lit(1)).otherwise(F.lit(0))
            ).alias(f"_v_{i}")
        )
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"{_sql_str(name)}, _v_{i}" for i, name in enumerate(names)
    )
    return wide.select(
        F.expr(f"stack({len(names)}, {stack_args}) AS (rule, n_violations)"),
        F.col("_n").alias("n_rows"),
    ).select(
        "rule",
        "n_rows",
        "n_violations",
        (F.col("n_violations") == 0).alias("pass"),
    )


def latest_by_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    tiebreak_col: str,
    payload_cols: Sequence[str],
) -> DataFrame:
    """Current state per key: the row with the greatest
    ``(order_col, tiebreak_col)``. Max-struct aggregate — partial
    merge happens map-side, no per-key sort window; the deterministic
    tie-break is mandatory (event time repeats at scale)."""
    packed = F.max(
        F.struct(
            F.col(order_col).alias("_o"),
            F.col(tiebreak_col).alias("_t"),
            *[F.col(c).alias(c) for c in payload_cols],
        )
    ).alias("_b")
    out = df.groupBy(*key_cols).agg(packed)
    return out.select(
        *key_cols,
        F.col("_b._o").alias(order_col),
        F.col("_b._t").alias(tiebreak_col),
        *[F.col(f"_b.{c}").alias(c) for c in payload_cols],
    )


def merge_agg_states(
    states: Sequence[DataFrame],
    key_cols: Sequence[str],
    count_cols: Sequence[str] = (),
    sum_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
) -> DataFrame:
    """Incremental-view maintenance for algebraic aggregates: merge
    per-shard/per-batch aggregate STATES into the state of the union,
    without touching raw rows — counts and sums add, mins and maxes
    fold, so the merge is itself one groupBy over |keys|-sized inputs.
    This is the table-level form of Spark's own partial aggregation
    (and the reason the engine's sketches/quantiles are mergeable):
    nightly delta loads update a 10¹²-row aggregate by re-aggregating
    STATE rows, not by rescanning 100 TB.

    Not applicable to holistic aggregates (exact distinct, exact
    median) — those need the sketch family (`operators/sketches.py`)
    or a re-scan, which is precisely why the engine keeps mergeable
    sketch states for them."""
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    aggs = (
        [F.sum(c).alias(c) for c in count_cols]
        + [F.sum(c).alias(c) for c in sum_cols]
        + [F.min(c).alias(c) for c in min_cols]
        + [F.max(c).alias(c) for c in max_cols]
    )
    return out.groupBy(*key_cols).agg(*aggs)


def sigma_outliers(
    df: DataFrame,
    value_c_col: str,
    group_cols: Sequence[str],
    keep_cols: Sequence[str],
    k_tenths: int = 17,
) -> DataFrame:
    """Per-group k-sigma outlier detection with ZERO floating point —
    the drift/data-quality gate that stays hash-portable: a row is
    anomalous iff ``|x − μ| > (k/10)·σ`` over its group, tested in the
    equivalent cross-multiplied integer form

        100 · (n·x − S)² > k² · (n·Q − S²)

    with ``S = Σx``, ``Q = Σx²`` (x pre-quantized to integer units by
    the caller — the repo's float-through-aggregation rule). All
    products run in DECIMAL(38,0) (the pagerank damping precedent):
    exact up to |n·x| < 10¹⁹ — a 10¹²-row group of 10⁵-unit values
    squares to 10³⁴, inside DECIMAL(38).

    Plan: one partial-aggregated stats pass (|groups| rows — model-
    sized, hint-free join back; AQE broadcasts it), then a MAP-ONLY
    filter. Output: keep_cols + group_cols + x + n (outlier rows
    only)."""
    gc = list(group_cols)
    x = F.col(value_c_col)
    # accumulate in DECIMAL(38,0), not BIGINT: Σx² of 10⁵-unit values
    # wraps int64 silently near 10⁹ rows while the DuckDB oracle sums
    # in HUGEINT — the decimal sum keeps Spark exact (and oracle-
    # matching) through the 10¹²-row bound the docstring claims
    stats = df.groupBy(*gc).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(x.cast("decimal(38,0)")).alias("_s"),
        F.sum((x * x).cast("decimal(38,0)")).alias("_q"),
    )
    d = "CAST({} AS DECIMAL(38,0))"
    dev = f"({d.format('_n')} * {d.format(value_c_col)} - {d.format('_s')})"
    lhs = f"100 * {dev} * {dev}"
    rhs = (
        f"{k_tenths * k_tenths} * "
        f"({d.format('_n')} * {d.format('_q')} - {d.format('_s')} * {d.format('_s')})"
    )
    return (
        df.join(stats, gc)
        .filter(F.expr(f"{lhs} > {rhs}"))
        .select(
            *keep_cols,
            *gc,
            x.alias("value_c"),
            F.col("_n").cast("bigint").alias("n_group"),
        )
    )


def gini_by_group(
    df: DataFrame,
    value_c_col: str,
    group_cols: Sequence[str],
    tiebreak_col: str,
) -> DataFrame:
    """Per-group Gini concentration index in exact integer ppm — the
    inequality diagnostic (revenue concentration, token-frequency
    skew) with zero floating point: over the within-group ascending
    rank i (ties broken by ``tiebreak_col`` — deterministic),

        gini_ppm = floor( 10⁶ · Σ(2i − n − 1)·x  /  (n · Σx) )

    Ranks come from ``ranking.grouped_rank_via_global`` (range-
    partitioned two-phase — corpus-sized groups never funnel through
    one task); both Σ terms are partial-aggregated; the final ratio is
    one floor division per group in DECIMAL(38,0) (i·x reaches ~10¹⁸
    at 10⁶-unit values × 10¹²-row groups — past int64, inside
    decimal38). Output: group..., n_rows, gini_ppm. Requires
    nonnegative values (standard Gini domain)."""
    from sea_express_customs_etl_spark.operators.ranking import (
        grouped_rank_via_global,
    )

    gc = list(group_cols)
    ranked = grouped_rank_via_global(
        df.select(*gc, value_c_col, tiebreak_col),
        gc,
        [F.col(value_c_col), F.col(tiebreak_col)],
    )
    d = "CAST({} AS DECIMAL(38,0))"
    term = (
        f"(2 * {d.format('group_rank')} - CAST(_n AS DECIMAL(38,0)) - 1) "
        f"* {d.format(value_c_col)}"
    )
    counts = ranked.groupBy(*gc).agg(
        F.count(F.lit(1)).alias("_n"), F.sum(value_c_col).alias("_sx")
    )
    return (
        ranked.join(counts, gc)
        .groupBy(*gc)
        .agg(
            F.first("_n").alias("n_rows"),
            F.sum(F.expr(term)).alias("_num"),
            F.first("_sx").alias("_sx"),
        )
        .select(
            *gc,
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.expr(
                "CAST(CAST(1000000 AS DECIMAL(38,0)) * _num "
                "DIV (CAST(n_rows AS DECIMAL(38,0)) "
                "* CAST(_sx AS DECIMAL(38,0))) AS BIGINT)"
            ).alias("gini_ppm"),
        )
    )


def ols_by_group(
    df: DataFrame,
    x_c_col: str,
    y_c_col: str,
    group_cols: Sequence[str],
) -> DataFrame:
    """Per-group simple linear regression (OLS y = a + b·x) from the
    closed-form normal equations, entirely in exact integer
    arithmetic — the "is price actually linear in quantity, and how
    tight" profiling question answered without a single float
    aggregation (``corr()``/``regr_slope()`` built-ins can never
    hash-match across engines; the ``returnflag_qty_price_corr``
    precedent, extended from correlation to the fitted line).

    Inputs are pre-quantized integer units (the repo's
    float-through-aggregation rule). With S = Σx, T = Σy, and the
    centered second moments

        Sxy = n·Σxy − S·T,   Sxx = n·Σx² − S²,   Syy = n·Σy² − T²

    the outputs are

        slope_ppm     = sign · (10⁶·|Sxy|) DIV Sxx
        intercept_c   = sign · (|T·Sxx − S·Sxy|) DIV (n·Sxx)
        r2_ppm        = (10⁶·(|Sxy| DIV n)²) DIV ((Sxx DIV n)·(Syy DIV n))

    Signs are split from magnitudes before the division so Spark's
    truncating ``DIV`` and DuckDB's flooring ``//`` agree (the
    modularity rule). All products run in DECIMAL(38,0): Sxy/Sxx/Syy
    are exact while n·σ² < 10³⁸ (10¹²-row groups of 10⁵-unit values);
    the r² term divides each moment by n FIRST so its cross products
    stay inside DECIMAL(38) while n·σx·σy < 10¹⁹ — beyond that bound
    ANSI mode fails loudly (never a silent int64 wrap — the
    sigma_outliers ADVICE discipline). One partial-aggregated stats
    pass; output is |groups| rows. Degenerate groups (Sxx or Syy = 0,
    constant x or y) emit slope/intercept/r² of 0 rather than
    dividing by zero."""
    gc = list(group_cols)
    x, y = F.col(x_c_col), F.col(y_c_col)
    d38 = "decimal(38,0)"
    stats = df.groupBy(*gc).agg(
        F.count(F.lit(1)).cast(d38).alias("_n"),
        F.sum(x.cast(d38)).alias("_s"),
        F.sum(y.cast(d38)).alias("_t"),
        F.sum((x * y).cast(d38)).alias("_sxy"),
        F.sum((x * x).cast(d38)).alias("_sxx"),
        F.sum((y * y).cast(d38)).alias("_syy"),
    )
    m = stats.select(
        *gc,
        F.col("_n").cast("bigint").alias("n_rows"),
        F.expr("_n * _sxy - _s * _t").alias("_cxy"),
        F.expr("_n * _sxx - _s * _s").alias("_cxx"),
        F.expr("_n * _syy - _t * _t").alias("_cyy"),
        F.col("_n").alias("_nd"),
        F.col("_s").alias("_sd"),
        F.col("_t").alias("_td"),
    )
    slope = (
        "CASE WHEN _cxx = 0 THEN 0 ELSE "
        "CASE WHEN _cxy < 0 THEN -1 ELSE 1 END * "
        "((CAST(1000000 AS DECIMAL(38,0)) * abs(_cxy)) DIV _cxx) END"
    )
    icept_num = "(_td * _cxx - _sd * _cxy)"
    icept = (
        "CASE WHEN _cxx = 0 THEN 0 ELSE "
        f"CASE WHEN {icept_num} < 0 THEN -1 ELSE 1 END * "
        f"(abs({icept_num}) DIV (_nd * _cxx)) END"
    )
    # abs() BEFORE the DIV n reduction: the square kills the sign
    # anyway, and truncating (Spark) vs flooring (DuckDB) division
    # only agree on nonnegative operands (the CLAUDE.md sign rule).
    # Spark DIV yields BIGINT — re-cast each reduced moment to
    # DECIMAL(38,0) before the cross product or the multiply overflows
    # long (the reduced moments are ~n·σ², far past 2⁶³ at scale)
    red = "CAST(abs(_cxy) DIV _nd AS DECIMAL(38,0))"
    rxx = "CAST(_cxx DIV _nd AS DECIMAL(38,0))"
    ryy = "CAST(_cyy DIV _nd AS DECIMAL(38,0))"
    r2 = (
        f"CASE WHEN {rxx} = 0 OR {ryy} = 0 THEN 0 ELSE "
        f"(CAST(1000000 AS DECIMAL(38,0)) * {red} * {red})"
        f" DIV ({rxx} * {ryy}) END"
    )
    return m.select(
        *gc,
        "n_rows",
        F.expr(slope).cast("bigint").alias("slope_ppm"),
        F.expr(icept).cast("bigint").alias("intercept_c"),
        F.expr(r2).cast("bigint").alias("r2_ppm"),
    )


# Benford first-digit probabilities log10(1 + 1/d) as FIXED ppm
# literals (they sum to exactly 10⁶) — the transcendental log is
# precomputed once here, so both the Spark plan and the DuckDB oracle
# consume identical integer constants (the bm25 FIXED_QUERIES rule).
BENFORD_PPM: tuple[int, ...] = (
    301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757
)


def benford_first_digit(
    df: DataFrame,
    value_c_col: str,
) -> DataFrame:
    """Benford's-law first-digit screen — the forensic-accounting /
    fraud-detection data-quality test (Nigrini): naturally-grown
    multiplicative quantities follow P(d) = log10(1 + 1/d); fabricated
    or mechanically-generated ones don't, and the per-digit deviation
    localizes WHERE. (TPC-H-style uniform synthetic prices deviate
    hugely — itself the finding: this screen detects synthetic data.)

    First digit extracted from the INTEGER value's decimal string
    (``substring(cast(x AS string), 1, 1)``) — integer→string is
    engine-portable, unlike double→string (the profile_table rule),
    and avoids the transcendental floor(log10) path entirely. Rows
    with value < 1 have no first significant digit and are excluded.

    Output per digit 1-9: n, obs_ppm = (10⁶·n) DIV N, exp_ppm (the
    fixed literal), dev_ppm = |obs − exp|. One partial-aggregated
    digit count (≤9 groups) + a pinned 1-row total cross join (the
    allowed scalar class) + the 9-row literal expectation table."""
    spark = df.sparkSession
    exp = spark.createDataFrame(
        [(d + 1, ppm) for d, ppm in enumerate(BENFORD_PPM)],
        ["digit", "exp_ppm"],
    )
    digits = (
        df.filter(F.col(value_c_col) >= 1)
        .select(
            F.substring(F.col(value_c_col).cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    total = digits.agg(F.sum("n").alias("_N"))
    return (
        digits.crossJoin(F.broadcast(total))
        .join(F.broadcast(exp), "digit")
        .select(
            "digit",
            "n",
            F.expr("(1000000 * n) DIV _N").cast("bigint").alias("obs_ppm"),
            F.col("exp_ppm").cast("bigint").alias("exp_ppm"),
            F.expr("abs((1000000 * n) DIV _N - exp_ppm)")
            .cast("bigint")
            .alias("dev_ppm"),
        )
    )


def profile_drift(
    old: DataFrame, new: DataFrame, cols: Sequence[str]
) -> DataFrame:
    """Schema/data-contract drift report between two snapshots of the
    same table — the monitoring query a nightly load runs against
    yesterday's profile before promoting a partition: per column, row
    counts, exact null ppm on both sides, NDV delta, and whether the
    min/max envelope moved. Composed from two :func:`profile_table`
    passes (one scan each) joined on the column name — |cols|-row
    frames, so the drift join is model-sized. null_ppm divisions are
    guarded (an empty side reports 0) and use nonnegative operands
    (Spark DIV ≡ DuckDB //); envelope changes use null-safe equality
    (``<=>``), so NULL→value transitions register as drift."""
    po = profile_table(old, cols).select(
        "column",
        F.col("n_rows").alias("n_rows_old"),
        F.col("n_nulls").alias("_nn_o"),
        F.col("n_distinct").alias("_nd_o"),
        F.col("lo").alias("_lo_o"),
        F.col("hi").alias("_hi_o"),
    )
    pn = profile_table(new, cols).select(
        "column",
        F.col("n_rows").alias("n_rows_new"),
        F.col("n_nulls").alias("_nn_n"),
        F.col("n_distinct").alias("_nd_n"),
        F.col("lo").alias("_lo_n"),
        F.col("hi").alias("_hi_n"),
    )
    ppm = (
        "CAST(CASE WHEN {n} = 0 THEN 0 "
        "ELSE (1000000 * {c}) DIV {n} END AS BIGINT)"
    )
    return po.join(pn, "column").select(
        "column",
        F.col("n_rows_old").cast("bigint").alias("n_rows_old"),
        F.col("n_rows_new").cast("bigint").alias("n_rows_new"),
        F.expr(ppm.format(c="_nn_o", n="n_rows_old")).alias("null_ppm_old"),
        F.expr(ppm.format(c="_nn_n", n="n_rows_new")).alias("null_ppm_new"),
        (F.col("_nd_n") - F.col("_nd_o")).cast("bigint").alias("ndv_delta"),
        (~F.expr("_lo_o <=> _lo_n")).alias("lo_changed"),
        (~F.expr("_hi_o <=> _hi_n")).alias("hi_changed"),
    )
