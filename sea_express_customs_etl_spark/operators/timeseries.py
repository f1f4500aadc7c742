"""Time-series bucket gap-fill + LOCF — the hypertable-rollup shape
(TimescaleDB's ``time_bucket_gapfill`` / ``locf``): hourly rollups
where EMPTY buckets are materialized as rows (a dashboard or
downstream join must see the hour existed and was quiet — a missing
row is indistinguishable from missing data) and the last observed
value carries forward across the gaps.

No reference-parity citation: the reference has no time-series layer;
this extends the events family (``plans/relational.py``) the same way
the dedup/ANN families extend the corpus ops.

Portability: buckets are EPOCH-HOUR INTEGERS (``floor(epoch/3600)``)
and values are micro-unit bigints, so the gap-filled frame —
including which buckets are null vs zero and every carried-forward
value — hash-matches the DuckDB oracle exactly.

Scale: the rollup is one partial-aggregated (type, hour) shuffle of
the raw events; the SPINE (types × hours) is bucket-grained —
hours-per-year × |types|, independent of event volume — so the
gap-fill join and the LOCF window run on the small frame. The LOCF
window funnels one partition per type, bounded by the hour count
(8,760 rows/type/year), never by events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

from ..plans.cache import tracked_persist

MICRO = 1_000_000


def hourly_gapfill_locf(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per-type hourly rollup over a GAPLESS hour spine spanning the
    observed range, with last-observation-carried-forward.

    Output: type_col, epoch_hour (bigint), n_events (int — 0 for
    empty buckets), sum_value_u6 (bigint — NULL for empty buckets:
    "no data" stays distinguishable from "sums to zero"),
    locf_value_u6 (bigint — the latest non-null sum at or before this
    bucket; NULL before a type's first observation).
    """
    ev = events.select(
        F.col(type_col),
        F.floor(F.unix_timestamp(F.col(ts_col)) / 3600)
        .cast("bigint")
        .alias("epoch_hour"),
        F.round(F.col(value_col) * MICRO).cast("bigint").alias("_v6"),
    )
    hourly = ev.groupBy(type_col, "epoch_hour").agg(
        F.count(F.lit(1)).cast("int").alias("n_events"),
        F.sum("_v6").alias("sum_value_u6"),
    )
    bounds = hourly.agg(
        F.min("epoch_hour").alias("_lo"), F.max("epoch_hour").alias("_hi")
    )
    spine = (
        hourly.select(type_col)
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            type_col,
            F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias(
                "epoch_hour"
            ),
        )
    )
    w = (
        Window.partitionBy(type_col)
        .orderBy("epoch_hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, [type_col, "epoch_hour"], "left")
        .select(
            type_col,
            "epoch_hour",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            "sum_value_u6",
            F.last("sum_value_u6", ignorenulls=True)
            .over(w)
            .alias("locf_value_u6"),
        )
    )


def ohlc_by_bucket(
    events: DataFrame,
    value_c_col: str = "value_c",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    bucket_us: int = 3_600_000_000,
) -> DataFrame:
    """OHLC (open / high / low / close) candlestick rollup per
    (type, time bucket) — the financial-rollup shape every hypertable
    engine ships (TimescaleDB ``candlestick_agg``, kdb bar queries),
    over integer epoch-microsecond buckets and pre-quantized integer
    values so the whole frame is hash-portable.

    Open/close are ORDER-dependent (first/last value under the
    (ts, id) total order — the id tie-break makes it total) but are
    computed WITHOUT a window sort: min/max over a packed struct whose
    comparison order is (ts, id, value) — the ``latest_by_key``
    max-struct CDC trick — so the whole rollup is ONE partial-
    aggregated shuffle; high/low/n/sum ride the same aggregate. The
    struct min/max merges associatively, which is exactly why this
    stays a map-side combine at 100 TB while ``first_value`` windows
    would sort every bucket. Output: type, bucket (epoch-bucket
    ordinal), open_c, high_c, low_c, close_c, n_events."""
    ts_u = F.expr(f"unix_micros({ts_col})")
    q = events.select(
        F.col(type_col).alias("type"),
        (ts_u - (ts_u % bucket_us)).cast("bigint").alias("bucket_us"),
        ts_u.alias("_tu"),
        F.col(id_col).alias("_id"),
        F.col(value_c_col).alias("_v"),
    )
    packed = F.struct(F.col("_tu"), F.col("_id"), F.col("_v"))
    return q.groupBy("type", "bucket_us").agg(
        F.min(packed)["_v"].alias("open_c"),
        F.max("_v").alias("high_c"),
        F.min("_v").alias("low_c"),
        F.max(packed)["_v"].alias("close_c"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )


def time_weighted_avg(
    events: DataFrame,
    key_col: str = "user_id",
    value_c_col: str = "value_c",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key time-weighted average (TWAP): each event's value holds
    until the key's next event, so the average weights every value by
    its holding duration —

        twap_c = Σ value_c · Δt_us  DIV  Σ Δt_us

    (last-observation-carried-forward weighting; the final event has
    no successor and contributes no segment — keys with a single
    event are dropped). The per-row product value·Δt reaches
    ~10⁴ · 3·10¹³ µs ≈ 3·10¹⁷ — near the int64 edge, so the sum
    accumulates in DECIMAL(38,0) (the sigma_outliers ADVICE rule:
    overflow must be impossible or loud, never a silent wrap). All
    quantities nonnegative (caller guarantees value_c ≥ 0) → Spark
    DIV ≡ DuckDB //. The lag window partitions BY KEY — bounded
    per-key state, distributed across keys. Output: key, n_segments,
    held_us, twap_c."""
    seg = (
        events.select(
            key_col,
            F.col(value_c_col).alias("_v"),
            F.expr(f"unix_micros({ts_col})").alias("_tu"),
            F.col(id_col).alias("_id"),
        )
        .withColumn("_nxt", F.lead("_tu").over(
            Window.partitionBy(key_col).orderBy("_tu", "_id")
        ))
        .filter(F.col("_nxt").isNotNull())
        .select(
            key_col,
            F.col("_v"),
            (F.col("_nxt") - F.col("_tu")).alias("_dt"),
        )
    )
    return (
        seg.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_segments"),
            F.sum("_dt").cast("bigint").alias("held_us"),
            # CASE guards the ANSI divide: a key whose timestamps all
            # tie (Σdt = 0) must not evaluate the DIV; such keys are
            # dropped by the filter below (no holding time → no TWAP)
            F.expr(
                "CASE WHEN sum(CAST(_dt AS DECIMAL(38,0))) = 0 THEN NULL "
                "ELSE CAST(sum(CAST(_v AS DECIMAL(38,0)) "
                "* CAST(_dt AS DECIMAL(38,0)))"
                " DIV sum(CAST(_dt AS DECIMAL(38,0))) AS BIGINT) END"
            ).alias("twap_c"),
        )
        .filter(F.col("held_us") > 0)
    )


def naive_forecast_mae(
    events: DataFrame,
    value_c_col: str = "value_c",
    type_col: str = "event_type",
    ts_col: str = "ts",
    bucket_us: int = 3_600_000_000,
    season: int = 24,
) -> DataFrame:
    """Forecast-baseline evaluation: per-type MAE of the two standard
    naive forecasters over the hourly rollup — persistence
    (``naive_1``: ŷ(t) = y(t−1)) and seasonal-naive (``seasonal_24``:
    ŷ(t) = y(t−24 h)), the baselines every forecasting deployment must
    beat before a model earns its keep (the M-competition floor).

    MAE in exact integers: ``mae_c = Σ|y − ŷ| DIV n`` with the sum
    accumulated in DECIMAL(38,0) (the sigma_outliers ADVICE rule);
    buckets with no forecast source (the first hour / first day) are
    excluded by the inner join — n_eval reports the evaluated count.
    Plan: ONE partial-aggregated hourly rollup (persisted — it is
    both the actual and, shifted, the forecast for two methods), two
    bucket-grain equi self-joins (bounded by hours·types, never
    events), one |types|·2-row output."""
    ts_u = F.expr(f"unix_micros({ts_col})")
    hourly = tracked_persist(
        events.select(
            F.col(type_col).alias("type"),
            (ts_u - (ts_u % bucket_us)).cast("bigint").alias("bucket_us"),
            F.col(value_c_col).alias("_v"),
        )
        .groupBy("type", "bucket_us")
        .agg(F.sum("_v").cast("bigint").alias("_y"))
    )
    out = None
    for method, lag in (("naive_1", 1), (f"seasonal_{season}", season)):
        fc = hourly.select(
            "type",
            (F.col("bucket_us") + lag * bucket_us).alias("bucket_us"),
            F.col("_y").alias("_yhat"),
        )
        m = (
            hourly.join(fc, ["type", "bucket_us"])
            .groupBy("type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_eval"),
                F.expr(
                    "CAST(sum(CAST(abs(_y - _yhat) AS DECIMAL(38,0)))"
                    " DIV CAST(count(1) AS DECIMAL(38,0)) AS BIGINT)"
                ).alias("mae_c"),
            )
            .select("type", F.lit(method).alias("method"), "n_eval", "mae_c")
        )
        out = m if out is None else out.unionByName(m)
    return out


def seasonal_hour_profile(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Hour-of-day seasonality profile per event type: for each
    (type, hour-of-day) cell, the event count, micro-unit value sum,
    and the SEASONAL INDEX — the cell's mean value relative to the
    type's overall mean, in exact integer ppm by cross-multiplication
    (no float mean ever exists):

        seasonal_ppm = (10⁶ · sum_hod · n_tot) DIV (n_hod · sum_tot)

    1,000,000 = "this hour behaves like the average hour"; the
    baseline a rate/anomaly monitor divides out before thresholding
    (the seasonal-adjustment prelude to ``event_rate_spikes``).
    Products run in DECIMAL(38,0) (10⁶·sum·n overflows int64 at
    ~10⁹ events/type); all quantities nonnegative, so Spark DIV ≡
    DuckDB ``//``. Output: event_type, hour_of_day, n_events,
    sum_value_u6, seasonal_ppm — |types|·24 rows from ONE
    partial-aggregated shuffle (the totals reaggregate the 24-row
    frame, not the corpus).
    """
    b = events.select(
        F.col(type_col).alias("event_type"),
        (F.floor(F.unix_timestamp(F.col(ts_col)) / 3600) % 24)
        .cast("int")
        .alias("hour_of_day"),
        F.round(F.col(value_col) * MICRO).cast("bigint").alias("_v6"),
    )
    g = b.groupBy("event_type", "hour_of_day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("_v6").alias("sum_value_u6"),
    )
    t = g.groupBy("event_type").agg(
        F.sum("n_events").alias("_n_tot"),
        F.sum("sum_value_u6").alias("_s_tot"),
    )
    seasonal = (
        "(CAST(1000000 AS DECIMAL(38,0)) * CAST(sum_value_u6 AS DECIMAL(38,0))"
        " * CAST(_n_tot AS DECIMAL(38,0)))"
        " DIV (CAST(n_events AS DECIMAL(38,0)) * CAST(_s_tot AS DECIMAL(38,0)))"
    )
    return g.join(t, "event_type").select(
        "event_type",
        "hour_of_day",
        "n_events",
        "sum_value_u6",
        F.expr(seasonal).cast("bigint").alias("seasonal_ppm"),
    )


def floored_running_balance(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[str],
    delta_col: Column,
) -> DataFrame:
    """Running balance FLOORED AT ZERO — the Lindley recursion
    (``b_k = max(0, b_{k-1} + x_k)``: queue depth, inventory on hand,
    prepaid credit), which looks un-distributable because each step
    depends on the clamped previous one, made window-parallel by the
    closed form of the recursion:

        b_k = S_k − min(0, min_{j≤k} S_j)

    (S = plain prefix sum; subtracting the most negative prefix is
    exactly the reflection at the zero boundary). Two standard
    cumulative windows per series — no recursion, no UDF, exact
    integers. Per-series window state is bounded by the series, the
    same license as every per-user window in the events family.

    Output: the input's partition/order columns plus ``delta``,
    ``balance`` (the clamped running value) and ``high_water`` (the
    running max of the clamped balance — max_k b_k is itself
    ``max(0, max_j (S_j − min(0, min_{i≤j} S_i)))``, computed as a
    third window over the derived column).
    """
    w = Window.partitionBy(*part_cols).orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, 0
    )
    staged = df.select(
        *part_cols,
        *order_cols,
        delta_col.alias("delta"),
    ).select(
        *part_cols,
        *order_cols,
        "delta",
        F.sum("delta").over(w).alias("_s"),
    )
    s = staged.select(
        *part_cols,
        *order_cols,
        "delta",
        "_s",
        F.min(F.least(F.col("_s"), F.lit(0))).over(w).alias("_floor"),
    )
    b = s.select(
        *part_cols,
        *order_cols,
        "delta",
        (F.col("_s") - F.col("_floor")).cast("bigint").alias("balance"),
    )
    return b.select(
        *part_cols,
        *order_cols,
        "delta",
        "balance",
        F.max("balance").over(w).cast("bigint").alias("high_water"),
    )


def above_mean_run_stats(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    user_col: str = "user_id",
) -> DataFrame:
    """Gaps-and-islands over value series: per event type, statistics
    of CONSECUTIVE RUNS of above-type-mean values within each user's
    series — anomaly PERSISTENCE (one hot reading is noise; five in a
    row is an incident), the run-length complement of the pointwise
    outlier screens (sigma/MAD).

    The above-mean predicate is cleared by cross-multiplication
    (value·n_type > Σ_type, micro-units — no float mean); islands use
    the classic row_number difference: rn(series) − rn(series ∩ above)
    is constant exactly within a maximal above-run. Both windows are
    per-(user, type) — bounded series state; the type totals join is a
    |types|-row equi-join. Output per type: n_runs, max_run_len,
    n_runs_ge3, longest-run tie broken by earliest (user, start id)
    implicitly via max aggregation (length only — positions stay
    distributed).
    """
    ev = events.select(
        F.col(type_col).alias("event_type"),
        F.col(user_col).alias("_u"),
        F.unix_micros(F.col(ts_col)).alias("_tu"),
        F.col(id_col).alias("_id"),
        F.round(F.col(value_col) * 1_000_000).cast("bigint").alias("_v6"),
    )
    tot = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum("_v6").alias("_s"),
    )
    d38 = "decimal(38,0)"
    flagged = ev.join(tot, "event_type").select(
        "event_type",
        "_u",
        "_tu",
        "_id",
        (
            F.col("_v6").cast(d38) * F.col("_n").cast(d38)
            > F.col("_s").cast(d38)
        ).alias("_above"),
    )
    w_all = Window.partitionBy("event_type", "_u").orderBy("_tu", "_id")
    w_above = Window.partitionBy("event_type", "_u", "_above").orderBy(
        "_tu", "_id"
    )
    runs = (
        flagged.select(
            "event_type",
            "_u",
            "_above",
            (F.row_number().over(w_all) - F.row_number().over(w_above)).alias(
                "_island"
            ),
        )
        .filter(F.col("_above"))
        .groupBy("event_type", "_u", "_island")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_len"))
    )
    return runs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_runs"),
        F.max("_len").alias("max_run_len"),
        F.sum(F.when(F.col("_len") >= 3, 1).otherwise(0))
        .cast("bigint")
        .alias("n_runs_ge3"),
    )


def peak_concurrency(
    events: DataFrame,
    duration_us: int,
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Maximum concurrent intervals per type — the classic sweep-line
    ("meeting rooms" / peak sessions) query: each event occupies
    [ts, ts + duration), and the peak of the +1/−1 boundary prefix sum
    is both the max concurrency and the minimum resource count that
    admits the schedule.

    The sweep's prefix sum is GLOBAL per type over 2·|events|
    boundaries — corpus-sized, so it runs through the two-phase
    ``ranking.global_cumsum`` (range shuffle + bounded windows +
    model-sized offsets), never a per-type single-partition window.
    Because every interval contributes a balanced (+1, −1) pair, each
    type's total delta is ZERO, so the cumsum under the composite
    (type, t, delta, id) total order needs no per-group offset
    correction — the group boundary always crosses at zero (asserted
    by the balanced-pair construction, not at runtime). Boundary
    ordering: ends sort before starts at the same instant (−1 < +1),
    so back-to-back intervals do not double-count; id breaks remaining
    ties. Output: event_type, peak_concurrency, peak_t_us (earliest
    instant attaining the peak).
    """
    from .ranking import global_cumsum

    ev = events.select(
        F.col(type_col).alias("event_type"),
        F.expr(f"unix_micros({ts_col})").alias("_t"),
        F.col(id_col).alias("_id"),
    )
    bnd = ev.select(
        "event_type", "_t", F.lit(1).alias("_delta"), "_id"
    ).unionByName(
        ev.select(
            "event_type",
            (F.col("_t") + F.lit(duration_us)).alias("_t"),
            F.lit(-1).alias("_delta"),
            "_id",
        )
    )
    cum = tracked_persist(
        global_cumsum(
            bnd,
            [
                F.col("event_type"),
                F.col("_t"),
                F.col("_delta"),
                F.col("_id"),
            ],
            "_delta",
            "cum",
        )
    )  # two consumers: the peak aggregate and the argmin filter join
    peak = cum.groupBy("event_type").agg(
        F.max("cum").cast("bigint").alias("peak_concurrency")
    )
    return (
        cum.join(peak, "event_type")
        .filter(F.col("cum") == F.col("peak_concurrency"))
        .groupBy("event_type", "peak_concurrency")
        .agg(F.min("_t").cast("bigint").alias("peak_t_us"))
    )


def interval_union_coverage(
    events: DataFrame,
    duration_us: int,
    ts_col: str = "ts",
    key_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key union-of-intervals coverage — "how much wall-clock was
    this user actually active": each event occupies [ts, ts + duration)
    and overlapping intervals must count ONCE (the naïve
    n_events × duration overstates whenever activity clusters). The
    classic merge-overlaps sweep, expressed as one window: order a
    key's intervals by start, carry the running max of interval ENDS
    over all PRECEDING rows, and each row contributes only the part of
    its interval past that high-water mark —
    ``greatest(0, end - greatest(start, prev_max_end))``. Summing the
    contributions gives the exact union length without materializing
    merged spans; rows whose start clears the high-water mark open a
    new span, so the same flag counts the merged-span total.

    All arithmetic is epoch-micros BIGINT (exact, oracle-portable).
    Output: one row per key — key, n_events, n_spans, covered_us.

    Scale shape: one hash shuffle on the key, one per-key window
    (running max — O(1) state per row), one partial-aggregated
    groupBy reusing the window's partitioning. Per-key window
    partitions are user-grained (bounded fan-in), never global.

    Beyond reference parity: the reference has no time-dimension ops;
    this completes the interval family (``peak_concurrency`` is the
    cross-key instantaneous view, this is the per-key integral view).
    """
    iv = events.select(
        F.col(key_col).alias("key"),
        F.expr(f"unix_micros({ts_col})").alias("_s"),
        (F.expr(f"unix_micros({ts_col})") + F.lit(duration_us)).alias("_e"),
        F.col(id_col).alias("_id"),
    )
    w = (
        Window.partitionBy("key")
        .orderBy("_s", "_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    contrib = iv.select(
        "key",
        "_s",
        "_e",
        F.max("_e").over(w).alias("_pm"),
    ).select(
        "key",
        F.when(
            F.col("_pm").isNull() | (F.col("_s") >= F.col("_pm")), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("_new_span"),
        F.greatest(
            F.lit(0),
            F.col("_e") - F.greatest(F.col("_s"), F.coalesce("_pm", "_s")),
        ).alias("_c"),
    )
    return contrib.groupBy(F.col("key").alias(key_col)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("_new_span").cast("bigint").alias("n_spans"),
        F.sum("_c").cast("bigint").alias("covered_us"),
    )


def ewma_hourly(
    events: DataFrame,
    lags: int = 16,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """EWMA (α = 1/2) smoothing of the hourly value series, exact
    integers: the smoothed value at bucket t over the ROW series of
    nonempty hours is

        ewma = (Σ_{k<lags} v_{t-k} · 2^(lags-1-k)) DIV (Σ 2^(lags-1-k))

    — the geometric-decay average truncated at ``lags`` terms (the
    tail beyond 16 halvings contributes < 2⁻¹⁶ of the head: below the
    u6 quantum for any bounded series), with the denominator summed
    over the lags that EXIST so the series head is an unbiased partial
    average rather than zero-padded. Truncation is what makes the
    float-free form possible: weights are integer powers of two, the
    numerator is one linear combination of ``lag()`` columns, and the
    whole artifact hash-checks (a recursive float EWMA never would).

    Gaps: the decay steps per OBSERVED bucket, not per wall-clock hour
    (documented; compose with ``hourly_gapfill_locf`` upstream for
    wall-clock decay). Bounds: num ≤ Σv·2^15 ≪ 2^63 for u6 hourly
    sums. Output: event_type, hour_id, sum_value_u6, ewma_u6.

    Scale shape: one partial-aggregated (type, hour) rollup of the raw
    events, then the lag window runs at BUCKET grain — hours·types,
    independent of event volume (the hourly_gapfill_locf license).
    """
    hourly = events.groupBy(
        F.col(type_col).alias("event_type"),
        F.expr(f"unix_micros({ts_col}) DIV 3600000000").alias("hour_id"),
    ).agg(
        F.sum(F.round(F.col(value_col) * 1_000_000).cast("bigint")).alias(
            "v"
        )
    )
    w = Window.partitionBy("event_type").orderBy("hour_id")
    num = None
    den = None
    for k in range(lags):
        wt = 1 << (lags - 1 - k)
        term = F.coalesce(F.lag("v", k).over(w), F.lit(0)) * F.lit(wt)
        dterm = (
            F.when(F.lag("v", k).over(w).isNull(), F.lit(0))
            .otherwise(F.lit(wt))
        )
        num = term if num is None else num + term
        den = dterm if den is None else den + dterm
    sm = hourly.select(
        "event_type",
        "hour_id",
        F.col("v").cast("bigint").alias("sum_value_u6"),
        num.alias("_num"),
        den.alias("_den"),
    )
    return sm.select(
        "event_type",
        "hour_id",
        "sum_value_u6",
        F.expr("_num DIV _den").cast("bigint").alias("ewma_u6"),
    )
