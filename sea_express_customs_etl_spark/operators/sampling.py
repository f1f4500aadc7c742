"""Deterministic hash sampling / dataset splitting.

A 100 TB training pipeline cannot use ``rand()`` for train/val/test
splits: re-runs, retries and repartitioning must all land every row in
the same bucket, and the assignment must be reproducible OUTSIDE Spark
(the eval harness is usually a different engine). So the sample
decision is a pure function of the row key: the first 8 hex chars of
``md5(salt || key)`` compared against a precomputed hex threshold —
md5 is bit-identical in every engine (the reason the oracle-parity
rules pin md5 as the only cross-engine hash), the comparison is
lexicographic on fixed-width lowercase hex, and the whole thing is one
map-side Catalyst expression: no shuffle, no state, no RNG.

Changing ``salt`` derives a fresh independent sample from the same
keys (the standard way to draw k disjoint eval sets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F

_BUCKETS = 16**8  # first 8 hex chars of the md5


def _hash_prefix(key: Column, salt: str) -> Column:
    return F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8)


def hex_threshold(fraction: float) -> str:
    """The 8-hex-char cutoff under which ~``fraction`` of md5 prefixes
    fall. Exposed so oracle SQL can embed the identical literal."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return f"{min(int(fraction * _BUCKETS), _BUCKETS - 1):08x}"


def hash_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen deterministically by key."""
    return df.filter(
        _hash_prefix(F.col(key_col), salt) < F.lit(hex_threshold(fraction))
    )


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split (~``weights``
    proportions, which must sum to 1). Adds ``split_col``; rows are
    never dropped or duplicated — the buckets partition the hash space.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    prefix = _hash_prefix(F.col(key_col), salt)
    expr: Column | None = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = prefix < F.lit(hex_threshold(acc))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def domain_mix(
    df: DataFrame,
    targets: dict[str, float],
    domain_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic mixture resampling: downsample each domain so the
    surviving corpus follows the ``targets`` proportions — the
    domain-weighting step every pretraining data recipe runs (e.g.
    balancing web/books/code sources before tokenization).

    The output budget is the largest achievable WITHOUT upsampling:
    ``B = floor(min_d(n_d / t_d))`` rows, so the scarcest domain
    relative to its target is kept whole and every other domain is
    hash-downsampled to ``rate_d = t_d · B / n_d``. Domains absent
    from ``targets`` are dropped. Rows are selected by the same
    engine-portable md5-prefix rule as :func:`hash_sample`, but against
    a DATA-DEPENDENT threshold (``rate_d`` comes from the observed
    counts), so the cutoff is computed numerically in-engine:
    ``conv(md5[:8], 16, 10) < floor(rate_d · 16^8)`` — IEEE double
    arithmetic on both sides of the oracle, hence bit-identical.

    Scale shape: ONE tiny aggregate on the domain column (partial-agg,
    |domains| rows), a 1-row budget reduction, then a broadcast join of
    per-domain thresholds back onto the corpus and a map-side filter —
    the corpus itself is never shuffled. Re-runs are idempotent:
    membership is a pure function of (salt, key, observed counts).
    """
    if not targets:
        raise ValueError("targets must be non-empty")
    tgt = df.sparkSession.createDataFrame(
        [(d, float(t)) for d, t in targets.items()],
        schema=f"{domain_col} string, _t double",
    )
    counted = (
        df.groupBy(domain_col)
        .agg(F.count(F.lit(1)).cast("double").alias("_n"))
        .join(F.broadcast(tgt), domain_col)
    )
    budget = counted.agg(F.floor(F.min(F.col("_n") / F.col("_t"))).alias("_b"))
    thresholds = counted.crossJoin(F.broadcast(budget)).select(
        F.col(domain_col),
        F.floor(F.col("_t") * F.col("_b") / F.col("_n") * F.lit(float(_BUCKETS)))
        .cast("bigint")
        .alias("_thr"),
    )
    h32 = F.conv(_hash_prefix(F.col(key_col), salt), 16, 10).cast("bigint")
    return (
        df.join(F.broadcast(thresholds), domain_col)
        .filter(h32 < F.col("_thr"))
        .drop("_thr")
    )


def stratified_exact(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    key_col: str = "doc_id",
    salt: str = "",
    two_phase: bool = True,
) -> DataFrame:
    """EXACTLY ``n_per_stratum`` rows from every stratum (fewer only
    when the stratum is smaller) — the balanced-eval-set draw that
    :func:`hash_sample` (which is only proportional in expectation)
    cannot guarantee.

    Rows are ranked inside each stratum by ``md5(salt || key)`` — a
    deterministic pseudo-random order, reproducible in any engine and
    independent of layout — and the first ``n`` kept.

    Hot-stratum safety (default ``two_phase=True``): a single window
    over the strata column funnels each ENTIRE stratum through one
    task — fatal when a stratum is corpus-scale at 100 TB. The
    two-phase draw first ranks within ``(input partition, stratum)``
    (the shuffle key carries the partition id, so a hot stratum
    spreads over as many tasks as it has source partitions and
    per-task state stays ≤ n) and keeps each group's top-n; the global
    top-n per stratum is provably inside that union, so phase two
    ranks only ≤ n·num_partitions CANDIDATE rows per stratum — a
    graph-sized second shuffle, no funnel. Which candidates phase one
    forwards depends on the physical layout, but the phase-two result
    is the exact global top-n either way — the output is bit-identical
    to the single-window form under every layout (property-tested).
    ``two_phase=False`` keeps the single-shuffle plan for small inputs.
    """
    h = _hash_prefix(F.col(key_col), salt)
    if two_phase:
        pre_w = Window.partitionBy("_pid", strata_col).orderBy(
            h, F.col(key_col)
        )
        df = (
            df.withColumn("_pid", F.spark_partition_id())
            .withColumn("_prk", F.row_number().over(pre_w))
            .filter(F.col("_prk") <= n_per_stratum)
            .drop("_pid", "_prk")
        )
    w = Window.partitionBy(strata_col).orderBy(h, F.col(key_col))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def pps_systematic_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic probability-proportional-to-size (PPS) SYSTEMATIC
    sampling — the survey-statistics workhorse for "sample k documents
    proportional to length/quality-mass": lay items end-to-end in
    cumulative INTEGER weight space under the (md5(id), id) order (a
    reproducible pseudo-random shuffle, decorrelated from ingest
    order), then take k picks at the centered rational positions
    ``p_j = (2j+1)·T / (2k)``. An item is picked once per position
    inside its [C−w, C) span, so ``Σ n_picks = k`` EXACTLY and an item
    heavier than T/k is picked multiple times — textbook systematic
    PPS, with zero floating point: the position test
    ``2k(C−w) ≤ (2j+1)T < 2kC`` is counted in closed form,

        g(x) = #{j < k : (2j+1)·T < x} = 0                if x ≤ T
             = (x − 1 − T) div 2T + 1                     otherwise
        n_picks = g(2kC) − g(2k(C−w))

    (both arguments nonnegative, so truncating and floor division
    agree across engines). Output: id, weight, n_picks (> 0 rows
    only).

    Scale: one :func:`...ranking.global_cumsum` (range shuffle +
    bounded windows + model-sized offset collect), then MAP-ONLY
    arithmetic with a 1-row total broadcast — no position join at all,
    where the naive form range-joins k pick rows against the corpus.
    """
    from sea_express_customs_etl_spark.operators.ranking import global_cumsum

    base = df.select(F.col(id_col), F.col(weight_col).cast("bigint").alias("_w"))
    cum = global_cumsum(
        base,
        [F.md5(F.col(id_col).cast("string")), F.col(id_col)],
        "_w",
        out_col="_c",
        num_partitions=num_partitions,
    )
    total = base.agg(F.sum("_w").alias("_t"))  # 1-row scalar broadcast

    two_k = F.lit(2 * k).cast("bigint")

    # #{j < k : (2j+1)·T < x} via INTEGRAL division (x, T nonnegative so
    # DIV == floor): exact bigint arithmetic end to end — no 2^53
    # floor-of-double caveat, and bit-identical to the oracle's `//`
    _g = (
        "CASE WHEN {x} <= _t THEN CAST(0 AS BIGINT) "
        "ELSE ({x} - 1 - _t) DIV (2 * _t) + 1 END"
    )

    picked = (
        cum.join(F.broadcast(total))
        .withColumn("_x_hi", two_k * F.col("_c"))
        .withColumn("_x_lo", two_k * (F.col("_c") - F.col("_w")))
        .withColumn(
            "n_picks",
            F.expr(
                f"({_g.format(x='_x_hi')}) - ({_g.format(x='_x_lo')})"
            ).cast("bigint"),
        )
        .filter(F.col("n_picks") > 0)
        .select(
            F.col(id_col),
            F.col("_w").alias(weight_col),
            "n_picks",
        )
    )
    return picked


def edge_negative_samples(
    edges: DataFrame,
    catalog: DataFrame,
    k: int = 2,
    item_col: str = "item",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training
    (word2vec/SGNS, Mikolov et al. 2013; the graph-embedding loader's
    negative branch): for every positive edge and slot i ∈ [0, k), draw
    a pseudo-random catalog item via positional md5 —
    ``md5(src|dst|slot) mod |catalog|`` resolved against a two-phase
    global rank of the catalog — then REJECT draws that are accidental
    positives (the drawn item equals an endpoint or is adjacent to the
    source), the standard rejection step. Output: src, dst, slot,
    neg_id; rejected slots are absent (re-draw policy is the trainer's
    loop, kept out of the operator so the emitted set is a pure
    function of its inputs).

    Replayable bit-for-bit across engines/retries/partitionings — the
    ``word_dropout`` discipline applied to the sampling side of
    training: an interrupted epoch resumes with IDENTICAL negatives.

    Scale shape: slots explode map-side (k rows per edge); the draw
    resolves through ONE equi-join against the ranked catalog (hash
    join on the rank value — never a range/BNLJ); rejection is one
    canonical-edge anti-join. The catalog rank rides the two-phase
    ``global_rank`` (|partitions|-row offsets); the catalog size joins
    in as a pinned 1-row broadcast.
    """
    from .ranking import global_rank

    e = edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).filter(F.col("a") != F.col("b")).distinct()
    cat = global_rank(
        catalog.select(F.col(item_col).alias("_item")).distinct(),
        [F.col("_item")],
        rank_col="_r",
    ).select((F.col("_r") - 1).alias("_r"), "_item")
    n = cat.agg(F.count(F.lit(1)).alias("_n"))
    slots = e.select(
        F.col("a").alias("src"),
        F.col("b").alias("dst"),
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("slot"),
    )
    drawn = (
        slots.join(F.broadcast(n))
        .withColumn(
            "_r",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.col("src").cast("string"),
                            F.col("dst").cast("string"),
                            F.col("slot").cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % F.col("_n"),
        )
        .join(cat, "_r")
        .select("src", "dst", "slot", F.col("_item").alias("neg_id"))
        .filter(
            (F.col("neg_id") != F.col("src")) & (F.col("neg_id") != F.col("dst"))
        )
    )
    # equi-keyed hash anti-join (canonicalize the probe pair first —
    # an expression-on-both-sides condition would plan as a BNLJ)
    probe = drawn.withColumn("_pa", F.least("src", "neg_id")).withColumn(
        "_pb", F.greatest("src", "neg_id")
    )
    adj = e.select(F.col("a").alias("_pa"), F.col("b").alias("_pb"))
    return probe.join(adj, ["_pa", "_pb"], "left_anti").select(
        "src", "dst", "slot", "neg_id"
    )


def temperature_allocation(
    df: DataFrame,
    group_col: str,
    budget: int,
    num_denom: tuple[int, int] = (1, 2),
) -> DataFrame:
    """Temperature-based mixture allocation — the multilingual/
    multi-source rebalancing rule (XLM-R / mT5 style): sampling weight
    ∝ count^α flattens the head so low-resource slices are not drowned,
    then a fixed sample budget is apportioned by LARGEST REMAINDER
    (Hamilton's method) so the integer allocations sum EXACTLY to the
    budget.

    α = num/denom is rational and the weight is computed in exact
    integer arithmetic: w = floor(count^(num/denom)) via an integer
    Newton-corrected root — for the default α = 1/2, isqrt(count):
    one float sqrt seed plus a ±1 correction CASE, exact for counts
    < 2^52 (the double-sqrt error is < 1 there, so one step lands).
    Allocation: base = (budget·w) DIV W, then the slices with the
    largest scaled remainders (budget·w − base·W) each get +1 —
    remainder ties break by group name, so the whole table is
    reproducible. Output: group_col, n_rows, weight, alloc
    (Σ alloc = budget whenever budget ≥ 0 and W > 0).

    Scale: one partial-agg count shuffle; everything after runs on the
    |groups|-row frame (model-sized — the 1-row-scalar license for the
    totals cross-join).
    """
    if num_denom != (1, 2):
        raise NotImplementedError(
            "only α = 1/2 (isqrt) has the exact integer root path"
        )
    cnt = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    s0 = F.floor(F.sqrt(F.col("n_rows").cast("double"))).cast("bigint")
    w = (
        F.when((s0 + 1) * (s0 + 1) <= F.col("n_rows"), s0 + 1)
        .when(s0 * s0 > F.col("n_rows"), s0 - 1)
        .otherwise(s0)
    )
    weighted = cnt.select(group_col, "n_rows", w.alias("weight"))
    tot = weighted.agg(F.sum("weight").cast("bigint").alias("_w_total"))
    base = weighted.crossJoin(F.broadcast(tot)).select(
        group_col,
        "n_rows",
        "weight",
        "_w_total",
        F.expr(f"({budget} * weight) DIV _w_total").alias("_base"),
        (
            F.lit(budget) * F.col("weight")
            - F.expr(f"({budget} * weight) DIV _w_total")
            * F.col("_w_total")
        ).alias("_rem"),
    )
    wrank = Window.orderBy(F.col("_rem").desc(), F.col(group_col).asc())
    leftover = F.lit(budget) - F.sum("_base").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        base.withColumn("_rk", F.row_number().over(wrank))
        .withColumn("_extra", (F.col("_rk") <= leftover).cast("int"))
        .select(
            group_col,
            "n_rows",
            "weight",
            (F.col("_base") + F.col("_extra")).cast("bigint").alias("alloc"),
        )
    )


def group_reservoir_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 10,
    salt: str = "res|",
) -> DataFrame:
    """Uniform deterministic k-sample per group — the distributed
    reservoir: rank each group's keys by ``md5(salt || key)`` and keep
    the k smallest. Min-hash order IS a uniform random permutation of
    the keys (md5 is the family RNG — replayable, engine-portable),
    so this is reservoir sampling without reservoir STATE: the
    row_number-then-filter shape rides WindowGroupLimit, each map task
    forwards at most k rows per group, and two samples of the same
    group at different k are NESTED (k=5 ⊂ k=10 — the property
    streaming reservoirs lose). Output: group, key, sample_rank.

    Distinct from ``hash_sample`` (fixed RATE, unbounded count) and
    ``pps_systematic_sample`` (size-weighted): this is fixed COUNT,
    equal weight — the per-segment eyeball sample a data card embeds.
    """
    h = _hash_prefix(F.col(key_col), salt)
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.select(group_col, key_col)
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= int(k))
        .select(
            group_col,
            key_col,
            F.col("sample_rank").cast("bigint").alias("sample_rank"),
        )
    )


def unimax_alloc(
    df: DataFrame,
    group_col: str,
    budget: int,
    max_epochs: int = 2,
) -> DataFrame:
    """UniMax mixture allocation (Chung et al., ICLR 2023): apportion a
    token/row ``budget`` across domains as UNIFORMLY as possible,
    subject to a per-domain repeat cap of ``max_epochs`` passes — the
    principled successor to temperature sampling (``
    temperature_allocation``): no tuned α, bounded duplication for
    low-resource domains, everything-else-uniform.

    Waterfill, smallest domain first (count ASC, name ASC): domain i
    is CAPPED while the remaining budget could still hand every
    not-yet-processed domain at least this domain's cap —

        cap_i · (n − i + 1) ≤ B − Σ_{j<i} cap_j

    (a prefix property: caps ascend, so the first failure ends the
    capped region — computed as a running AND, no sequential state).
    The uncapped suffix of m domains splits the remainder R exactly by
    largest-remainder integer apportionment: R DIV m each, the first
    R mod m (in sort order) get +1 — so Σ alloc = budget EXACTLY
    whenever the budget fits under Σ caps, and alloc = cap for every
    domain otherwise. Pure bigint arithmetic end to end; ties and
    remainders are name-deterministic (the temperature_allocation
    discipline).

    Output: group_col, n_rows, cap, alloc, epochs_ppm
    (= 10⁶·alloc DIV n_rows — the realized duplication factor,
    ≤ 10⁶·max_epochs by construction).

    Scale: one partial-agg count shuffle; every window after runs on
    the |domains|-row frame (model-sized — the same global-window
    license as temperature_allocation's remainder rank).
    """
    cnt = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    capped = cnt.select(
        group_col,
        "n_rows",
        (F.lit(int(max_epochs)) * F.col("n_rows")).alias("cap"),
    )
    order = Window.orderBy(F.col("n_rows").asc(), F.col(group_col).asc())
    full = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    b = F.lit(int(budget))
    staged = (
        capped.withColumn("_i", F.row_number().over(order))
        .withColumn("_n", F.count(F.lit(1)).over(full))
        .withColumn(
            "_cum_prev",
            F.coalesce(
                F.sum("cap").over(
                    order.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn(
            "_cond",
            (
                F.col("cap") * (F.col("_n") - F.col("_i") + 1)
                <= b - F.col("_cum_prev")
            ).cast("int"),
        )
        .withColumn(
            "_capped",
            F.min("_cond").over(
                order.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    totals = (
        staged.withColumn("_t", F.sum("_capped").over(full))
        .withColumn(
            "_cap_sum", F.sum(F.col("_capped") * F.col("cap")).over(full)
        )
        .withColumn("_m", F.col("_n") - F.col("_t"))
        .withColumn("_r", b - F.col("_cap_sum"))
    )
    alloc = (
        F.when(F.col("_capped") == 1, F.col("cap"))
        .when(F.col("_m") <= 0, F.col("cap"))
        .otherwise(
            F.expr("_r DIV _m")
            + (
                (F.col("_i") - F.col("_t")) <= F.col("_r") % F.col("_m")
            ).cast("bigint")
        )
    )
    return totals.select(
        group_col,
        "n_rows",
        "cap",
        alloc.cast("bigint").alias("alloc"),
    ).withColumn(
        "epochs_ppm", F.expr("(1000000 * alloc) DIV n_rows")
    )


def _isqrt_exact(v: Column) -> Column:
    """Exact integer sqrt of a non-negative BIGINT column: one double
    ``sqrt`` seeds the answer, two integer CASE corrections make it
    exact (the seed is within ±1 of floor(sqrt(v)) for v < 2^53, since
    the double value of v is exact and sqrt is correctly rounded) —
    the comparisons are pure int64 arithmetic, so the result is
    engine-portable unlike a bare floor(sqrt(x))."""
    s0 = F.floor(F.sqrt(v.cast("double"))).cast("bigint")
    s1 = s0 + ((s0 + 1) * (s0 + 1) <= v).cast("bigint")
    return s1 - (s1 * s1 > v).cast("bigint")


def neyman_allocation_sample(
    df: DataFrame,
    strata_col: str,
    cents_col: Column,
    key_col: str,
    divisor: int = 30,
) -> DataFrame:
    """Neyman-optimal stratified sample with an exact-integer
    allocation: stratum h of size N_h and value spread sd_h receives
    n_h proportional to N_h * sd_h (Neyman 1934 — minimum-variance
    allocation of a fixed budget across strata), with the budget
    n = ceil(N / divisor) derived FROM the data (never a pasted
    literal, per the scaling-scalar rule) and rounded to integers by
    largest remainder (tie-break: stratum name) so the allocations
    sum exactly to the budget.

    Exactness: values enter as cents (caller passes the
    ``round(x*100)::BIGINT`` parity cast); the population-variance
    numerator N_h*S_yy - S_y^2 runs in DECIMAL(38,0) (ols overflow
    rule), the DIV by N_h^2 lands an int64 cents^2 variance, and
    ``_isqrt_exact`` takes the exact integer sd. The draw itself is
    ``stratified_exact``'s two-phase (partition, stratum) rank by
    md5(key) with the PER-STRATUM cap joined in — no corpus-sized
    single-stratum funnel.

    Output (stratum grain): ``stratum``, ``big_n``, ``sd_cents``,
    ``alloc_n``, ``picked_n``, ``key_sum``, ``cents_sum`` — the
    checksum columns pin the exact membership of the draw, not just
    its size.
    """
    dec = "decimal(38,0)"
    base = df.select(
        F.col(strata_col).alias("stratum"),
        F.col(key_col).alias("_key"),
        cents_col.cast("bigint").alias("_y"),
    )
    stats = base.groupBy("stratum").agg(
        F.count(F.lit(1)).cast("bigint").alias("big_n"),
        F.sum(F.col("_y").cast(dec)).alias("_sy"),
        F.sum(F.col("_y").cast(dec) * F.col("_y").cast(dec)).alias("_syy"),
    )
    v = F.expr(
        "(CAST(big_n AS decimal(38,0)) * _syy - _sy * _sy)"
        " DIV (CAST(big_n AS decimal(38,0)) * CAST(big_n AS decimal(38,0)))"
    ).cast("bigint")
    weighted = stats.withColumn("sd_cents", _isqrt_exact(v)).withColumn(
        "_w", F.col("big_n") * F.col("sd_cents")
    )
    # budget + weight total: 1-row scalars cross-joined back (the
    # chi2/burstiness license — model-sized at any corpus scale)
    scalars = weighted.agg(
        F.expr(f"(sum(big_n) + {divisor - 1}) DIV {divisor}").alias(
            "_budget"
        ),
        F.sum(F.col("_w").cast(dec)).alias("_wsum"),
    )
    planned = weighted.crossJoin(F.broadcast(scalars)).select(
        "stratum",
        "big_n",
        "sd_cents",
        F.expr(
            "CAST((CAST(_budget AS decimal(38,0))"
            " * CAST(_w AS decimal(38,0))) DIV _wsum AS BIGINT)"
        ).alias("_base"),
        F.expr(
            "CAST(CAST(_budget AS decimal(38,0))"
            " * CAST(_w AS decimal(38,0))"
            " - (CAST(_budget AS decimal(38,0))"
            "    * CAST(_w AS decimal(38,0)) DIV _wsum)"
            " * _wsum AS decimal(38,0))"
        ).alias("_rem"),
        F.col("_budget"),
    )
    # largest-remainder top-up on the |strata|-row frame (model-sized
    # window license); cap at stratum size, no redistribution.
    full = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    rw = Window.partitionBy(F.lit(1)).orderBy(
        F.col("_rem").desc(), F.col("stratum").asc()
    )
    alloc = (
        planned.withColumn("_bsum", F.sum("_base").over(full))
        .withColumn("_rk", F.row_number().over(rw))
        .withColumn(
            "alloc_n",
            F.least(
                F.col("_base")
                + (
                    F.col("_rk") <= (F.col("_budget") - F.col("_bsum"))
                ).cast("bigint"),
                F.col("big_n"),
            ),
        )
        .select("stratum", "big_n", "sd_cents", "alloc_n")
    )
    # two-phase variable-cap draw (stratified_exact's hot-stratum
    # shape with the per-stratum cap joined in, broadcast |strata|-row)
    capped = base.join(
        F.broadcast(alloc.select("stratum", "alloc_n")), "stratum"
    )
    h = _hash_prefix(F.col("_key"), "neyman")
    pre_w = Window.partitionBy("_pid", "stratum").orderBy(h, F.col("_key"))
    fin_w = Window.partitionBy("stratum").orderBy(h, F.col("_key"))
    picked = (
        capped.withColumn("_pid", F.spark_partition_id())
        .withColumn("_prk", F.row_number().over(pre_w))
        .filter(F.col("_prk") <= F.col("alloc_n"))
        .withColumn("_rk", F.row_number().over(fin_w))
        .filter(F.col("_rk") <= F.col("alloc_n"))
    )
    sums = picked.groupBy("stratum").agg(
        F.count(F.lit(1)).cast("bigint").alias("picked_n"),
        F.sum("_key").cast("bigint").alias("key_sum"),
        F.sum("_y").cast("bigint").alias("cents_sum"),
    )
    return alloc.join(sums, "stratum", "left").select(
        "stratum",
        "big_n",
        "sd_cents",
        "alloc_n",
        F.coalesce(F.col("picked_n"), F.lit(0)).alias("picked_n"),
        F.coalesce(F.col("key_sum"), F.lit(0)).alias("key_sum"),
        F.coalesce(F.col("cents_sum"), F.lit(0)).alias("cents_sum"),
    )


def group_kfold(
    labels: DataFrame,
    k: int = 5,
    cluster_col: str = "cluster_id",
    id_col: str = "doc_id",
    salt: str = "gkf",
) -> DataFrame:
    """Leakage-safe k-fold cross-validation assignment (GroupKFold
    with near-dup clusters as groups): every member of a cluster
    lands in the SAME fold — fold = md5(salt || cluster) mod k, the
    deterministic engine-portable assignment, so no near-duplicate
    pair ever straddles a train/validation boundary (the k-fold
    sibling of the cluster_safe_split hash-split).

    Output (``k`` rows): ``fold``, ``n_docs``, ``n_clusters``,
    ``key_sum`` — the checksum pins exact membership. One fold-grain
    partial-agg shuffle with an exact distinct-count (two-phase).
    """
    fold = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(salt), F.col(cluster_col).cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % k
    ).cast("int")
    return (
        labels.withColumn("fold", fold)
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct(cluster_col).cast("bigint").alias("n_clusters"),
            F.sum(id_col).cast("bigint").alias("key_sum"),
        )
    )


def split_srm_check(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    key_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Sample-ratio-mismatch (SRM) audit of a hash split — the check
    every experimentation platform runs before trusting a comparison
    (Fabijan et al. 2019, "Diagnosing Sample Ratio Mismatch"): a
    chi-square of observed split counts against the INTENDED ratios.
    A large statistic means the assignment itself is broken
    (filtering bias, key collisions, a bad salt) and downstream
    comparisons are invalid.

    Exactness: with d = n_obs*1e6 - N*p_ppm, each split's term is
    d^2 DIV (N * p_ppm) — chi-square in micro-units, numerator lifted
    to DECIMAL(38,0) (d^2 overflows int64 at corpus scale), every DIV
    positive. Output (one row per split): ``split``, ``n_obs``,
    ``expected_ppm``, ``chi2_term_u6``; sum the terms and compare
    against the chi-square critical value at |splits|-1 df.

    Scale: one map-side split assignment (pure md5 expression), one
    split-grain partial-agg count, a |splits|-row literal frame and a
    1-row total cross-joined back (model-sized license).
    """
    if weights is None:
        weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    spark = df.sparkSession
    assigned = hash_split(df, weights, key_col=key_col, salt=salt)
    counts = assigned.groupBy("split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs")
    )
    wf = spark.createDataFrame(
        [(name, int(round(frac * 1_000_000))) for name, frac in weights.items()],
        "split string, expected_ppm long",
    )
    total = df.agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    dec = "decimal(38,0)"
    d = (
        F.coalesce(F.col("n_obs"), F.lit(0)).cast(dec) * F.lit(1_000_000)
        - F.col("_n").cast(dec) * F.col("expected_ppm").cast(dec)
    )
    # no pin on the weights side: Spark cannot build the PRESERVED
    # side of an outer join, so a broadcast hint there is dead (AQE
    # still broadcasts the 3-row count side at runtime)
    return (
        wf.join(counts, "split", "left")
        .crossJoin(F.broadcast(total))
        .withColumn("_d", d)
        .select(
            "split",
            F.coalesce(F.col("n_obs"), F.lit(0))
            .cast("bigint")
            .alias("n_obs"),
            F.col("expected_ppm").cast("bigint").alias("expected_ppm"),
            F.expr(
                "CAST((_d * _d) DIV"
                " (CAST(_n AS decimal(38,0))"
                "  * CAST(expected_ppm AS decimal(38,0)))"
                " AS BIGINT)"
            ).alias("chi2_term_u6"),
        )
    )
