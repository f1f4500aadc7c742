"""Nonparametric two-sample tests and exact rank statistics — the
data-quality screening layer a training-data pipeline runs when two
corpus slices are supposed to "look alike" (did the new crawl shift
the value distribution? is source A stochastically larger than B?).

No reference-parity citation: the reference has no statistics layer;
this extends the events/relational families the way the dedup/ANN
families extend the corpus ops (see ``operators/dedup.py``).

Portability discipline (the ``returnflag_qty_price_corr`` recipe,
``plans/relational.py:392``): every accumulation is an EXACT integer /
DECIMAL(38,0) sum — aggregation-order-independent, so it hash-matches
a single-threaded oracle — and any final ratio is either exact integer
ppm (``DIV`` on nonnegative operands) or ONE deterministic double
expression over the exact components, rounded 6dp (identical IEEE ops
in DuckDB).

Scale notes per operator:

- The two-sample tests (KS, Mann-Whitney) run at DISTINCT-VALUE grain
  per group pair — the dictionary-grain rule (CLAUDE.md): the corpus
  collapses to per-(group, value) counts in one partial-aggregated
  shuffle before any window touches it. The per-pair cumulative window
  is bounded by merged value cardinality (metrics are quantized in
  practice); for genuinely unbounded continuous values the two-phase
  ``ranking.global_rank`` shape is the 100 TB path (same trade as
  ``lm_terciles``).
- Group-pair enumeration is a |groups|²-row nested-loop join over the
  per-group totals frame — model-sized (event types, corpus slices),
  the same license as the 1-row scalar cross-joins.
- Spearman joins 2x-scaled average ranks back at distinct-value grain;
  the pooled lag-1 autocorrelation is window-free of global sorts
  (per-series ``lag`` under a (user, type) partition, bounded state).
- CUSUM runs at HOUR-BUCKET grain: one partial-agg shuffle of raw
  events, then a per-type window over ≤ hours-per-year rows —
  independent of event volume (the ``timeseries.hourly_gapfill_locf``
  argument).

Int64 capacity bounds are stated per operator where a product of two
counts appears; each is cast through DECIMAL(38,0) so the bound is on
the OUTPUT column, not the accumulation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F

from ..plans.cache import tracked_persist

D38 = "decimal(38,0)"


def _pair_rank_table(
    df: DataFrame, group_col: str, value_col: Column
) -> DataFrame:
    """Shared cumulant frame for the two-sample tests: for every
    ordered group pair (g_a < g_b) and every value in the MERGED
    distinct-value set of the pair, the per-side counts (c_a, c_b),
    per-side cumulative counts (cum_a, cum_b — inclusive of the
    current value), and the side totals (n_a, n_b).

    Dictionary-grain: built from per-(group, value) counts, one
    partial-aggregated shuffle of the input. The pair spine is the
    |groups|²-row totals self-join (model-sized nested loop); merged
    value sets come from two EQUI-joins of the spine against the count
    frame (AQE broadcasts the spine), never a non-equi join at value
    grain.
    """
    vals = df.select(
        F.col(group_col).alias("_g"), value_col.alias("_v")
    ).filter(F.col("_v").isNotNull())
    cnt = tracked_persist(
        vals.groupBy("_g", "_v").agg(
            F.count(F.lit(1)).cast("bigint").alias("_c")
        )
    )
    tot = cnt.groupBy("_g").agg(F.sum("_c").cast("bigint").alias("_n"))
    # model-sized (|groups|² rows) non-equi self-join — the pairlist
    pairs = (
        tot.select(F.col("_g").alias("g_a"), F.col("_n").alias("n_a"))
        .join(
            tot.select(F.col("_g").alias("g_b"), F.col("_n").alias("n_b")),
            F.col("g_a") < F.col("g_b"),
        )
    )
    # merged value spine per pair: equi-join each side, union, distinct
    mv = (
        pairs.select("g_a", "g_b")
        .join(cnt.withColumnRenamed("_g", "g_a"), "g_a")
        .select("g_a", "g_b", "_v")
        .unionByName(
            pairs.select("g_a", "g_b")
            .join(cnt.withColumnRenamed("_g", "g_b"), "g_b")
            .select("g_a", "g_b", "_v")
        )
        .distinct()
    )
    m = (
        mv.join(
            cnt.select(
                F.col("_g").alias("g_a"), "_v", F.col("_c").alias("c_a")
            ),
            ["g_a", "_v"],
            "left",
        )
        .join(
            cnt.select(
                F.col("_g").alias("g_b"), "_v", F.col("_c").alias("c_b")
            ),
            ["g_b", "_v"],
            "left",
        )
        .fillna(0, ["c_a", "c_b"])
    )
    w = Window.partitionBy("g_a", "g_b").orderBy("_v")
    return (
        m.select(
            "g_a",
            "g_b",
            "_v",
            "c_a",
            "c_b",
            F.sum("c_a").over(w).alias("cum_a"),
            F.sum("c_b").over(w).alias("cum_b"),
        )
        .join(pairs, ["g_a", "g_b"])
    )


def ks_two_sample(
    df: DataFrame, group_col: str, value_col: Column
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov distance for every ordered
    group pair, in integer ppm.

    The KS supremum over the merged empirical CDFs is computed with
    CROSS-MULTIPLIED integer numerators — ``|cum_a·n_b − cum_b·n_a|``
    — so no float CDF ever exists:

        ks_ppm = (10⁶ · max_v |cum_a·n_b − cum_b·n_a|) DIV (n_a·n_b)

    Both products pass through DECIMAL(38,0); the OUTPUT columns
    (d_num, and the n_a·n_b divisor) are bigint-bounded for group
    sizes up to ~3·10⁹ rows each — beyond that, widen the output to
    decimal. Output: g_a, g_b, n_a, n_b, d_num, ks_ppm.
    """
    m = _pair_rank_table(df, group_col, value_col)
    d = (
        F.abs(
            F.col("cum_a").cast(D38) * F.col("n_b").cast(D38)
            - F.col("cum_b").cast(D38) * F.col("n_a").cast(D38)
        )
    )
    return (
        m.groupBy("g_a", "g_b", "n_a", "n_b")
        .agg(F.max(d).cast("bigint").alias("d_num"))
        .select(
            "g_a",
            "g_b",
            "n_a",
            "n_b",
            "d_num",
            F.expr("(1000000 * d_num) DIV (n_a * n_b)")
            .cast("bigint")
            .alias("ks_ppm"),
        )
    )


def mann_whitney_u(
    df: DataFrame, group_col: str, value_col: Column
) -> DataFrame:
    """Exact Mann-Whitney U for every ordered group pair, with
    average-rank tie handling, as 2x-SCALED integers (average ranks
    are half-integers; doubling keeps every quantity exact).

    For each merged distinct value with side counts (c_a, c_b),
    c = c_a + c_b and combined cumulative-before count ``cb``:
    the 2x average rank of the tie group is ``2·cb + c + 1``, so

        r_a_x2 = Σ_v c_a · (2·cb + c + 1)
        u_a_x2 = r_a_x2 − n_a·(n_a + 1)
        u_b_x2 = 2·n_a·n_b − u_a_x2   (the U₁+U₂ = n₁n₂ identity)

    Output: g_a, g_b, n_a, n_b, u_a_x2, u_b_x2 — all exact bigints
    (capacity: n_total·(2·n_total+1) per pair must fit int64, i.e.
    pairs up to ~2·10⁹ combined rows).
    """
    m = _pair_rank_table(df, group_col, value_col)
    w = Window.partitionBy("g_a", "g_b").orderBy("_v")
    c = F.col("c_a") + F.col("c_b")
    staged = m.select(
        "g_a",
        "g_b",
        "n_a",
        "n_b",
        "c_a",
        "c_b",
        (F.sum(c).over(w) - c).alias("_cb0"),
    )
    r_term = F.col("c_a").cast(D38) * (
        F.lit(2).cast(D38) * F.col("_cb0").cast(D38)
        + (F.col("c_a") + F.col("c_b")).cast(D38)
        + F.lit(1)
    )
    agg = staged.groupBy("g_a", "g_b", "n_a", "n_b").agg(
        F.sum(r_term).alias("_r_a_x2")
    )
    u_a = (
        F.col("_r_a_x2")
        - F.col("n_a").cast(D38) * (F.col("n_a").cast(D38) + F.lit(1))
    ).cast("bigint")
    return agg.select(
        "g_a",
        "g_b",
        "n_a",
        "n_b",
        u_a.alias("u_a_x2"),
        (
            F.lit(2).cast(D38)
            * F.col("n_a").cast(D38)
            * F.col("n_b").cast(D38)
            - u_a.cast(D38)
        )
        .cast("bigint")
        .alias("u_b_x2"),
    )


def _avg_rank2(df: DataFrame, group_col: str, col: str) -> DataFrame:
    """2x-scaled average (fractional) ranks of ``col`` within
    ``group_col``, joined back at distinct-value grain: for a tie
    group of size c starting after cb rows, every member's 2x rank is
    ``2·cb + c + 1`` (exact integer). The rank dictionary is
    per-(group, value) — one partial-agg shuffle + one equi-join back;
    the per-group window runs at distinct-value grain (the
    ``lm_terciles`` trade: two-phase ``global_rank`` at 100 TB)."""
    cnt = df.groupBy(group_col, col).agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    )
    w = Window.partitionBy(group_col).orderBy(col)
    ranks = cnt.select(
        group_col,
        col,
        (
            F.lit(2) * (F.sum("_c").over(w) - F.col("_c"))
            + F.col("_c")
            + F.lit(1)
        ).alias(f"_r2_{col}"),
    )
    return df.join(ranks, [group_col, col])


def spearman_by_group(
    df: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Spearman rank correlation per group with average-rank ties —
    Pearson over the 2x-scaled integer ranks, accumulated as exact
    DECIMAL(38,0) component sums, finished by ONE deterministic double
    expression rounded 6dp (the ``returnflag_qty_price_corr`` recipe —
    the float touches only the final scalar, never an accumulation).

    Inputs must already be integral columns. Output: group_col,
    n_items, rho_spearman. Rank capacity: Σr² ≤ 4n³ per group fits
    DECIMAL(38,0) to n ≈ 10¹¹ rows per group.
    """
    # the x-ranked frame is consumed twice inside the y-pass (the
    # distinct-value count AND the join back) — pin it or the x rank
    # join re-executes per consumer (the ≥2-consumers rule)
    ranked = _avg_rank2(
        tracked_persist(
            _avg_rank2(df.select(group_col, x_col, y_col), group_col, x_col)
        ),
        group_col,
        y_col,
    )
    x = F.col(f"_r2_{x_col}").cast(D38)
    y = F.col(f"_r2_{y_col}").cast(D38)
    agg = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * y).alias("_sxy"),
        F.sum(x * x).alias("_sx2"),
        F.sum(y * y).alias("_sy2"),
    )
    n = F.col("n_items").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sx2 = F.col("_sx2").cast("double")
    sy2 = F.col("_sy2").cast("double")
    den = (n * sx2 - sx * sx) * (n * sy2 - sy * sy)
    return agg.select(
        group_col,
        "n_items",
        F.round(
            F.when(den > 0, (n * sxy - sx * sy) / F.sqrt(den)),
            6,
        ).alias("rho_spearman"),
    )


def lag1_autocorr(
    df: DataFrame,
    series_cols: list[str],
    order_cols: list[str],
    value_col: Column,
    group_col: str,
) -> DataFrame:
    """Pooled lag-1 autocorrelation: consecutive (prev, cur) value
    pairs WITHIN each bounded series (e.g. one user's events of one
    type, time-ordered with a deterministic tie-break), pooled into a
    per-``group_col`` Pearson correlation.

    The per-series ``lag`` window is partitioned on the series key —
    bounded state, no global sort anywhere (contrast the rank tests).
    Exact DECIMAL(38,0) component sums; one double expression, 6dp.
    Output: group_col, n_pairs, lag1_corr (NULL when a side is
    constant — zero variance).
    """
    w = Window.partitionBy(*series_cols).orderBy(*order_cols)
    v = value_col.cast("bigint")
    pairs = (
        df.select(
            F.col(group_col), v.alias("_y"), F.lag(v).over(w).alias("_x")
        )
        .filter(F.col("_x").isNotNull())
    )
    x = F.col("_x").cast(D38)
    y = F.col("_y").cast(D38)
    agg = pairs.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * y).alias("_sxy"),
        F.sum(x * x).alias("_sx2"),
        F.sum(y * y).alias("_sy2"),
    )
    n = F.col("n_pairs").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sx2 = F.col("_sx2").cast("double")
    sy2 = F.col("_sy2").cast("double")
    den = (n * sx2 - sx * sx) * (n * sy2 - sy * sy)
    return agg.select(
        group_col,
        "n_pairs",
        F.round(
            F.when(den > 0, (n * sxy - sx * sy) / F.sqrt(den)),
            6,
        ).alias("lag1_corr"),
    )


def cusum_level_shift(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """CUSUM level-shift detection at HOUR-BUCKET grain: for each
    event type, the hour where the cumulative deviation from the
    series mean peaks — the classic single-changepoint locator
    (max_k |Σ_{i≤k}(s_i − μ)|), made exact by clearing the rational
    mean: with n buckets and total S,

        T_k = n·cum_k − k·S     (integers; |T| max ⇔ |CUSUM| max)

    Milli-unit values bound |T| ≤ n·S — int64-safe to ~10⁶ events/
    bucket-year at sf-scale values; the window runs over ≤ 8,760
    bucket rows per type regardless of event volume (the
    ``timeseries`` bucket-grain argument). Earliest-hour tie-break;
    row_number-then-filter keeps the WindowGroupLimit shape.
    Output: event_type, n_buckets, peak_hour, t_abs, shift_sign.
    """
    b = events.select(
        F.col(type_col).alias("event_type"),
        (F.floor(F.unix_timestamp(F.col(ts_col)) / 3600))
        .cast("bigint")
        .alias("epoch_hour"),
        F.round(F.col(value_col) * 1000).cast("bigint").alias("_v3"),
    )
    hb = b.groupBy("event_type", "epoch_hour").agg(
        F.sum("_v3").alias("_s3")
    )
    wo = Window.partitionBy("event_type").orderBy("epoch_hour")
    wall = Window.partitionBy("event_type")
    cur = hb.select(
        "event_type",
        "epoch_hour",
        F.row_number().over(wo).alias("_k"),
        F.sum("_s3").over(wo).alias("_cum"),
        F.count(F.lit(1)).over(wall).alias("n_buckets"),
        F.sum("_s3").over(wall).alias("_tot"),
    )
    t = cur.select(
        "event_type",
        "epoch_hour",
        "n_buckets",
        (
            F.col("n_buckets").cast(D38) * F.col("_cum").cast(D38)
            - F.col("_k").cast(D38) * F.col("_tot").cast(D38)
        ).alias("_t"),
    ).select(
        "event_type",
        "epoch_hour",
        "n_buckets",
        F.abs(F.col("_t")).cast("bigint").alias("t_abs"),
        F.signum(F.col("_t")).cast("int").alias("shift_sign"),
    )
    wp = Window.partitionBy("event_type").orderBy(
        F.col("t_abs").desc(), F.col("epoch_hour").asc()
    )
    return (
        t.withColumn("_rn", F.row_number().over(wp))
        .filter(F.col("_rn") == 1)
        .select(
            "event_type",
            "n_buckets",
            F.col("epoch_hour").alias("peak_hour"),
            "t_abs",
            "shift_sign",
        )
    )


def bootstrap_sum_ci(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    n_reps: int = 20,
    lo_idx: int = 1,
    hi_idx: int = 18,
) -> DataFrame:
    """Deterministic bootstrap confidence bounds per group — the
    resampling answer to "how stable is this group's total/mean":
    ``n_reps`` with-replacement resamples of each group's rows, the
    per-replicate totals sorted, and the ``lo_idx``/``hi_idx`` order
    statistics reported as the CI bounds (defaults ≈ the 5th/95th
    percentile of 20 replicates). Because every replicate of a group
    draws exactly n rows, comparing replicate SUMS is equivalent to
    comparing replicate means — so the bounds stay exact micro-unit
    integers and the whole artifact is hash-portable.

    Randomness is positional md5 (the engine-portable corpus RNG used
    across the sampling family, ``operators/sampling.py:8-27``): draw
    i of replicate b in group g picks source row
    ``conv(md5(g|b|i)[:15], 16, 10) % n`` — replayable bit-for-bit on
    any engine, no RNG state.

    Output: group, n_rows, n_reps, lo_sum_u6, hi_sum_u6 (order stats
    of the replicate totals; ties broken by replicate id).

    Scale shape: the draw table is ``n_reps ×`` the base (generated by
    a per-row explode of a bounded replicate array — never a
    single-row mega-sequence), resolved by ONE keyed join back to the
    base on (group, row_index) and ONE partial-aggregated (group, rep)
    groupBy; the order-statistic window runs on the n_reps-per-group
    replicate frame — model-sized. The base is persisted once for its
    three scans (count, draw fan-out, lookup).

    Beyond reference parity: the reference reports point aggregates
    only (src/batch_train.py vote counts); this attaches the standard
    uncertainty quantification a data pipeline needs before acting on
    a group difference.
    """
    w = Window.partitionBy("_g").orderBy("_id")
    base = tracked_persist(
        df.select(
            F.col(group_col).alias("_g"),
            F.col(id_col).alias("_id"),
            F.col(value_col).alias("_v"),
        ).withColumn("_rn", F.row_number().over(w) - F.lit(1))
    )  # three scans: group sizes, draw fan-out, drawn-row lookup
    cnt = base.groupBy("_g").agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    draws = (
        base.join(F.broadcast(cnt), "_g")
        .select(
            "_g",
            "_n",
            "_rn",
            F.explode(F.expr(f"sequence(0, {int(n_reps) - 1})")).alias("_b"),
        )
        .select(
            "_g",
            "_b",
            F.expr(
                "conv(substring(md5(concat(_g, '|', cast(_b as string), "
                "'|', cast(_rn as string))), 1, 15), 16, 10)"
            )
            .cast("bigint")
            .__mod__(F.col("_n"))
            .alias("_j"),
        )
    )
    resampled = draws.join(
        base.select("_g", F.col("_rn").alias("_j"), "_v"), ["_g", "_j"]
    )
    reps = resampled.groupBy("_g", "_b").agg(
        F.sum("_v").cast("bigint").alias("_s")
    )
    rw = Window.partitionBy("_g").orderBy("_s", "_b")
    ranked = reps.withColumn("_r", F.row_number().over(rw) - F.lit(1))
    out = (
        ranked.filter(F.col("_r").isin(int(lo_idx), int(hi_idx)))
        .groupBy("_g")
        .agg(
            F.max(F.when(F.col("_r") == int(lo_idx), F.col("_s")))
            .cast("bigint")
            .alias("lo_sum_u6"),
            F.max(F.when(F.col("_r") == int(hi_idx), F.col("_s")))
            .cast("bigint")
            .alias("hi_sum_u6"),
        )
    )
    return (
        out.join(F.broadcast(cnt), "_g")
        .select(
            F.col("_g").alias(group_col),
            F.col("_n").alias("n_rows"),
            F.lit(int(n_reps)).cast("bigint").alias("n_reps"),
            "lo_sum_u6",
            "hi_sum_u6",
        )
    )


def mann_kendall_trend(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    z2_ppm: int = 3_841_600,
) -> DataFrame:
    """Mann–Kendall monotonic-trend test (Mann 1945, Kendall 1975 —
    the rank-based sibling of :func:`cusum_level_shift`) at
    HOUR-BUCKET grain: for each event type,

        S = Σ_{i<j} sign(s_j − s_i)   over hourly milli-unit sums

    with the exact tie-corrected variance numerator (Var(S) =
    var_num / 18, var_num = n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)
    over tie groups of equal bucket sums). Significance at |z| ≥ 1.96
    without any sqrt/float: z² ≥ 3.8416 ⟺ 18·S²·10⁶ ≥ z2_ppm·var_num
    — ``z2_ppm`` is a FIXED ppm literal (1.96² · 10⁶) shared with the
    oracle (the order_benford_digits rule), every side DECIMAL(38,0)
    (18·S²·10⁶ passes int64 near n ≈ 2,000 buckets).

    Output: event_type, n_buckets, s_stat, var_num, trend
    (sign(S) ∈ {-1, 0, 1}), significant (0/1).

    Scale shape: the pair stage is a per-type self-join over BUCKET
    rows — bounded by the time window (≤ 8,760/year), NOT by event
    volume (the event_value_ks_pairs argument); everything upstream
    is one partial-agg shuffle to hour grain.
    """
    b = events.select(
        F.col(type_col).alias("event_type"),
        (F.floor(F.unix_timestamp(F.col(ts_col)) / 3600))
        .cast("bigint")
        .alias("_h"),
        F.round(F.col(value_col) * 1000).cast("bigint").alias("_v3"),
    )
    # hour-bucket frame feeds the pair join (twice), the bucket count
    # and the tie groups — four consumers, one tiny bucket-grain frame
    hb = tracked_persist(
        b.groupBy("event_type", "_h").agg(F.sum("_v3").alias("_s3"))
    )
    a = hb.select("event_type", F.col("_h").alias("_hi"), F.col("_s3").alias("_si"))
    c = hb.select("event_type", F.col("_h").alias("_hj"), F.col("_s3").alias("_sj"))
    s = (
        a.join(c, "event_type")
        .filter(F.col("_hi") < F.col("_hj"))
        .groupBy("event_type")
        .agg(
            F.sum(F.signum(F.col("_sj") - F.col("_si")).cast("bigint"))
            .cast("bigint")
            .alias("s_stat")
        )
    )
    n = hb.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets")
    )
    ties = (
        hb.groupBy("event_type", "_s3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("_t") * (F.col("_t") - 1) * (2 * F.col("_t") + 5)
            )
            .cast("bigint")
            .alias("_tie")
        )
    )
    dec = "CAST({} AS DECIMAL(38,0))"
    var_num = (
        f"{dec.format('n_buckets')} * (n_buckets - 1)"
        f" * (2 * n_buckets + 5) - {dec.format('_tie')}"
    )
    sig = (
        "CAST(CASE WHEN var_num = 0 THEN 0"
        f" WHEN 18 * {dec.format('s_stat')} * s_stat * 1000000"
        f" >= {z2_ppm} * {dec.format('var_num')}"
        " THEN 1 ELSE 0 END AS INT)"
    )
    return (
        s.join(n, "event_type")
        .join(ties, "event_type")
        .withColumn("var_num", F.expr(var_num).cast("bigint"))
        .select(
            "event_type",
            F.col("n_buckets").cast("int").alias("n_buckets"),
            "s_stat",
            "var_num",
            F.signum(F.col("s_stat")).cast("int").alias("trend"),
            F.expr(sig).alias("significant"),
        )
    )
