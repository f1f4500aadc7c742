"""Corpus-dispersion statistics for training-data curation: per-doc
token entropy, per-token burstiness, and the corpus Zipf exponent.

Beyond-parity operators (no counterpart in the reference's pandas core
at ``/root/reference`` — the closest surface is its per-doc token
counting, cf. ``batch_train.py``'s frequency tables): the diagnostics
a pretraining pipeline runs to detect boilerplate (low-entropy
documents), to separate stopword-like from bursty content terms
(Church & Gale 1995, "Poisson mixtures"), and to watch corpus
naturalness drift (the Zipf slope; Zipf 1949, Piantadosi 2014).

Oracle stability (the lm.py discipline): every libm call is a single
correctly-rounded ``ln`` of an EXACT INTEGER argument, scaled to
micro-units and rounded BEFORE any aggregation — integer sums are
aggregation-order-exact, float sums are not. Burstiness needs no libm
at all: one integer rational per token. The Zipf OLS moments follow
the ols_by_group overflow rule (DECIMAL(38,0) products, each DIV
result re-cast).

Scale shape: everything here is one token-grain partial-agg shuffle
(explode -> groupBy) over map-side-combinable integer states; the only
window is a row_number over an already-LIMITed <=``top_r``-row frame
(TakeOrderedAndProject does the distributed top-k first), and the only
cross join is against a broadcast 1-row corpus-size scalar.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F

MICRO = 1_000_000


def _toks_lower(text_col: str) -> Column:
    """Lowercased whitespace tokens, empties dropped (the lm.py
    tokenization, so entropy/burstiness compose with the LM family)."""
    return F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
        lambda x: x != "",
    )


def _ln_u6(c: Column) -> Column:
    """round(ln(c) * 1e6) as BIGINT — one correctly-rounded libm call
    on an exact integer argument; everything downstream is integer."""
    return F.round(F.log(c.cast("double")) * MICRO).cast("bigint")


def token_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document unigram (token) Shannon entropy in micro-nats:

        H = ln(n) - (1/n) * sum_tok c * ln(c)

    computed as ``(n * r(n) - sum_tok c * r(c)) DIV n`` with
    ``r(x) = round(ln(x) * 1e6)`` — the numerator is non-negative
    (r is monotone, c <= n), so integer DIV is convention-safe.

    Low entropy flags boilerplate/repetitive documents (the
    information-theoretic complement of the Gopher repetition ratios
    in :func:`textstats.repetition_stats`).

    Output: id, n_tokens (bigint), n_distinct (int), entropy_u6
    (bigint). Empty documents keep a zero row — auditable, not
    dropped.

    Scale: one token-grain partial-agg shuffle, then a doc-grain
    partial-agg shuffle; both map-side combinable, no windows.
    """
    toks = df.select(
        F.col(id_col), F.explode(_toks_lower(text_col)).alias("_tok")
    )
    cnt = toks.groupBy(id_col, "_tok").agg(
        F.count(F.lit(1)).alias("_c")
    )
    per = cnt.groupBy(id_col).agg(
        F.sum("_c").alias("_n"),
        F.count(F.lit(1)).cast("int").alias("n_distinct"),
        F.sum(F.col("_c") * _ln_u6(F.col("_c"))).alias("_s"),
    )
    scored = per.select(
        F.col(id_col),
        F.col("_n").cast("bigint").alias("n_tokens"),
        F.col("n_distinct"),
        F.expr("(_n * CAST(round(ln(CAST(_n AS double)) * 1000000) AS bigint) - _s) div _n")
        .cast("bigint")
        .alias("entropy_u6"),
    )
    return (
        df.select(F.col(id_col))
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
            F.coalesce("n_distinct", F.lit(0)).cast("int").alias("n_distinct"),
            F.coalesce("entropy_u6", F.lit(0)).cast("bigint").alias("entropy_u6"),
        )
    )


def token_burstiness(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
) -> DataFrame:
    """Per-token burstiness as the variance-to-mean ratio (VMR) of its
    per-document count, zeros included (Church & Gale 1995): VMR ~= 1
    is Poisson scatter (function words), VMR >> 1 is bursty content
    vocabulary — the classic stopword-vs-topical split without any
    stopword list.

    With N documents, per-token occurrence total T = sum_d c_d and
    square-sum Q = sum_d c_d^2 (zero documents contribute 0 to both):

        VMR = s^2 / mean = (N*Q - T^2) / ((N-1) * T)

    ONE integer rational — no libm anywhere; numerator non-negative by
    the power-mean inequality, so DIV is convention-safe. Products go
    through DECIMAL(38,0) (the ols_by_group rule: N*Q overflows int64
    at corpus scale).

    Output: token, doc_freq (int), total_tf (bigint), vmr_u6 (bigint).

    Scale: token-grain partial-agg shuffle; the corpus size N is a
    broadcast 1-row scalar (the chi2_features license).
    """
    n_docs = df.select(F.count(F.lit(1)).alias("_nd"))
    cnt = (
        df.select(
            F.col(id_col), F.explode(_toks_lower(text_col)).alias("token")
        )
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    per = (
        cnt.groupBy("token")
        .agg(
            F.count(F.lit(1)).cast("int").alias("doc_freq"),
            F.sum("_c").alias("_t"),
            F.sum(F.col("_c") * F.col("_c")).alias("_q"),
        )
        .filter(F.col("doc_freq") >= min_df)
        .crossJoin(F.broadcast(n_docs))
    )
    dec = "CAST({} AS DECIMAL(38,0))"
    num = (
        f"({dec.format('_nd')} * {dec.format('_q')}"
        f" - {dec.format('_t')} * {dec.format('_t')}) * 1000000"
    )
    den = f"({dec.format('_nd')} - 1) * {dec.format('_t')}"
    return per.select(
        "token",
        "doc_freq",
        F.col("_t").cast("bigint").alias("total_tf"),
        F.expr(f"({num}) div ({den})").cast("bigint").alias("vmr_u6"),
    )


def zipf_alpha(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_r: int = 500,
) -> DataFrame:
    """Corpus Zipf exponent: OLS slope of ln(frequency) on ln(rank)
    over the top ``top_r`` vocabulary ranks (rank ties broken by token
    ASC on both sides). Natural text sits near alpha ~= 1; a drifting
    alpha is a cheap whole-corpus health dial (template floods flatten
    it, near-dup floods steepen it).

        alpha_u6 = (Sx*Sy - n*Sxy) * 1e6 DIV (n*Sxx - Sx^2)

    with x = round(ln(rank)*1e6), y = round(ln(count)*1e6) — the
    slope is negative, so the numerator is written negated-first (the
    lm_slice_report signed-DIV rule); every moment product is
    DECIMAL(38,0) (n*Sxy exceeds int64 past ~400 ranks).

    Output: ONE row (n_ranks int, alpha_u6 bigint).

    Scale: counts are a token-grain partial agg; the top-``top_r``
    selection is orderBy+limit (TakeOrderedAndProject — distributed
    map-side top-k, NO global window); the row_number that assigns
    ranks runs on the already-limited <=``top_r``-row frame, where a
    single-partition window is model-sized by construction.
    """
    counts = (
        df.select(F.explode(_toks_lower(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    top = counts.orderBy(F.col("_cnt").desc(), "token").limit(top_r)
    ranked = top.select(
        F.row_number()
        .over(Window.orderBy(F.col("_cnt").desc(), "token"))
        .alias("_rank"),
        "_cnt",
    ).select(
        _ln_u6(F.col("_rank")).alias("_x"),
        _ln_u6(F.col("_cnt")).alias("_y"),
    )
    dec = "CAST({} AS DECIMAL(38,0))"
    mom = ranked.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
    )
    num = (
        f"({dec.format('_sx')} * {dec.format('_sy')}"
        f" - {dec.format('_n')} * {dec.format('_sxy')}) * 1000000"
    )
    den = (
        f"{dec.format('_n')} * {dec.format('_sxx')}"
        f" - {dec.format('_sx')} * {dec.format('_sx')}"
    )
    return mom.select(
        F.col("_n").cast("int").alias("n_ranks"),
        F.expr(f"({num}) div ({den})").cast("bigint").alias("alpha_u6"),
    )


def heaps_law_fit(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heaps/Herdan vocabulary-growth exponent: V(N) ≈ K·N^β over the
    deterministic corpus stream order (md5(id), id) — the
    corpus-SCALING dial next to :func:`zipf_alpha`'s frequency dial
    (β ≈ 0.4-0.6 for natural text; a β drifting toward 0 means the
    stream has stopped contributing new vocabulary — saturation or
    template floods; toward 1, vocabulary churn/noise).

        β_u6 = (n·Σxy − Σx·Σy) · 10⁶ DIV (n·Σxx − Σx²)

    with one (x, y) = (round(ln(cum_tokens)·1e6),
    round(ln(cum_vocab)·1e6)) point per document boundary.

    Determinism: the stream order is the positional-md5 convention
    (replayable on both engines); "new vocabulary" is exact — a
    token's first-appearance document is the (md5, id)-minimum over
    its occurrences, so cum_vocab is the true distinct count at every
    boundary, not a sketch.

    Scale shape: token explode → two partial-agg shuffles (per-doc
    totals; per-TOKEN first-appearance argmin, vocabulary-grained) →
    ONE two-phase global cumulative sum (the ``global_cumsum``
    range-shuffle + model-sized offsets shape — never a
    single-partition window over the corpus) carrying both measures →
    moment sums as DECIMAL(38,0) (exact, order-independent, no int64
    cliff at 10¹⁰ documents). Output: ONE row (n_points int,
    beta_u6 bigint).
    """
    h = F.md5(F.col(id_col).cast("string"))
    toks = df.select(
        F.col(id_col), h.alias("_h"),
        F.explode(_toks_lower(text_col)).alias("token"),
    )
    docstats = toks.groupBy(id_col, "_h").agg(
        F.count(F.lit(1)).cast("bigint").alias("_nt")
    )
    first = (
        toks.groupBy("token")
        .agg(
            F.min(
                F.struct(F.col("_h").alias("h"), F.col(id_col).alias("i"))
            ).alias("_f")
        )
        .select(F.col("_f.i").alias(id_col))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("_nn"))
    )
    per_doc = docstats.join(first, id_col, "left").select(
        id_col,
        "_h",
        "_nt",
        F.coalesce("_nn", F.lit(0)).cast("bigint").alias("_nn"),
    )
    # two-phase global cumsum (global_cumsum's shape, both measures in
    # one range shuffle; same model-sized-offsets window license)
    from sea_express_customs_etl_spark.plans.cache import tracked_persist

    n_parts = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    order = [F.col("_h"), F.col(id_col)]
    ranged = tracked_persist(
        per_doc.repartitionByRange(n_parts, *order)
        .withColumn("_pid", F.spark_partition_id())
    )
    off_w = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        ranged.groupBy("_pid")
        .agg(F.sum("_nt").alias("_pt"), F.sum("_nn").alias("_pn"))
        .select(
            "_pid",
            F.sum("_pt").over(off_w).alias("_ot"),
            F.sum("_pn").over(off_w).alias("_on"),
        )
        .fillna(0, subset=["_ot", "_on"])
    )
    in_w = (
        Window.partitionBy("_pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pts = (
        ranged.withColumn("_ct", F.sum("_nt").over(in_w))
        .withColumn("_cv", F.sum("_nn").over(in_w))
        .join(F.broadcast(offsets), "_pid")
        .select(
            _ln_u6(F.col("_ot") + F.col("_ct")).alias("_x"),
            _ln_u6(F.col("_on") + F.col("_cv")).alias("_y"),
        )
    )
    dec = "CAST({} AS DECIMAL(38,0))"
    mom = pts.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("_x").cast("decimal(38,0)")).alias("_sx"),
        F.sum(F.col("_y").cast("decimal(38,0)")).alias("_sy"),
        F.sum(
            F.col("_x").cast("decimal(38,0)") * F.col("_y")
        ).alias("_sxy"),
        F.sum(
            F.col("_x").cast("decimal(38,0)") * F.col("_x")
        ).alias("_sxx"),
    )
    num = (
        f"({dec.format('_n')} * {dec.format('_sxy')}"
        f" - {dec.format('_sx')} * {dec.format('_sy')}) * 1000000"
    )
    den = (
        f"{dec.format('_n')} * {dec.format('_sxx')}"
        f" - {dec.format('_sx')} * {dec.format('_sx')}"
    )
    return mom.select(
        F.col("_n").cast("int").alias("n_points"),
        F.expr(f"({num}) div ({den})").cast("bigint").alias("beta_u6"),
    )


def corpus_balance(df: DataFrame, group_col: str = "source") -> DataFrame:
    """One-row corpus-concentration datacard: Herfindahl index of the
    per-group share (the antitrust concentration measure applied to
    mixture balance), its inverse — the EFFECTIVE number of groups
    (Simpson/inverse-participation diversity) — and the max share.
    A pipeline alarms when effective_sources collapses toward 1 while
    n_sources stays flat (one domain silently swallowed the mix).

    Exact integer rationals: hhi_u6 = 1e6*Σc² DIV N², effective =
    1e6*N² DIV Σc², products in DECIMAL(38,0) (ols rule). One
    group-grain partial agg + a 1-row rollup — no corpus shuffle."""
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_c"))
    dec = "decimal(38,0)"
    t = counts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sources"),
        F.sum("_c").cast("bigint").alias("n_docs"),
        F.sum(F.col("_c").cast(dec) * F.col("_c").cast(dec)).alias("_c2"),
        F.max("_c").cast("bigint").alias("_cmax"),
    )
    return t.select(
        "n_sources",
        "n_docs",
        F.expr(
            "CAST((1000000 * _c2) DIV"
            " (CAST(n_docs AS decimal(38,0))"
            "  * CAST(n_docs AS decimal(38,0))) AS BIGINT)"
        ).alias("hhi_u6"),
        F.expr(
            "CAST((1000000 * CAST(n_docs AS decimal(38,0))"
            " * CAST(n_docs AS decimal(38,0))) DIV _c2 AS BIGINT)"
        ).alias("effective_sources_u6"),
        F.expr(
            "CAST((1000000 * _cmax) DIV n_docs AS BIGINT)"
        ).alias("max_share_ppm"),
    )
