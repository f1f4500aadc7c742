"""Adaptive domain-mixture reweighting by multiplicative weights.

Beyond-parity operator (no counterpart in the reference's pandas core
at ``/root/reference``; its nearest surface is the per-key frequency
table in ``batch_train.py``): the ADAPTIVE sibling of
``sampling.domain_mix`` / ``sampling.unimax_alloc`` — instead of a
static recipe, the mixture is LEARNED from per-domain model loss, the
DoReMi idea (Xie et al. 2023) with the proxy-model inner loop replaced
by the linearized multiplicative-weights update (Arora, Hazan & Kale
2012): domains with above-average loss are upweighted round over
round,

    w'_d  ~  w_d * max(K + (L_d - Lbar_w), 1),     Lbar_w = weighted
                                                   mean loss under w,

then renormalized to exactly one million ppm by largest remainder.
K = 20e6 sets the effective learning rate (eta = 1/K per micro-nat of
excess loss) and keeps the multiplier positive for any realistic
corpus loss.

Exactness: the per-domain loss is the corpus-unigram surprisal in
micro-nats — each token occurrence contributes r(N) - r(c_tok) with
r(x) = round(ln(x)*1e6) (the token_entropy single-libm license; the
numerator is non-negative since c <= N, so the mean's DIV is
convention-safe). Rounds are pure integer arithmetic on the
domain-grain frame; the weighted mean uses one positive-operand DIV
and the round-over-round coupling (each round's floor/largest-
remainder depends on the previous round's integer weights) makes the
output a genuine TRAJECTORY hash — the oracle must thread every round
through MATERIALIZED CTEs, never paste intermediate weights.

Scale shape: ONE corpus pass (explode -> token-grain partial agg ->
domain-grain partial agg) produces the |domains|-row loss frame; it is
tracked-persisted (each unrolled round references it twice — agg +
cross-join — so an unpersisted plan doubles per round). All T rounds
then run at |domains| grain: windows and 1-row cross-joins on a
model-sized frame (chi2 license), constant cost in corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

from sea_express_customs_etl_spark.plans.cache import tracked_persist

MICRO = 1_000_000
K_MULT = 20 * MICRO


def _ln_u6(c: F.Column) -> F.Column:
    return F.round(F.log(c.cast("double")) * MICRO).cast("bigint")


def domain_unigram_loss(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """|domains|-row frame: ``domain``, ``n_tok``, ``loss_u6`` — mean
    corpus-unigram surprisal per token occurrence, in micro-nats."""
    toks = docs.select(
        F.col(group_col).alias("domain"),
        F.explode(
            F.filter(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
                lambda x: x != "",
            )
        ).alias("tok"),
    )
    counts = toks.groupBy("domain", "tok").agg(
        F.count(F.lit(1)).alias("_c")
    )
    vocab = counts.groupBy("tok").agg(F.sum("_c").alias("_ct"))
    total = vocab.agg(F.sum("_ct").alias("_n"))
    scored = (
        counts.join(vocab, "tok")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "_s",
            F.col("_c")
            * (_ln_u6(F.col("_n")) - _ln_u6(F.col("_ct"))),
        )
    )
    return scored.groupBy("domain").agg(
        F.sum("_c").cast("bigint").alias("n_tok"),
        # surprisal sums lift to DECIMAL(38,0): c * r() products reach
        # ~N * 30e6 and overflow int64 at corpus scale (ols rule)
        F.expr(
            "CAST(sum(CAST(_s AS decimal(38,0))) DIV sum(_c) AS BIGINT)"
        ).alias("loss_u6"),
    )


def _mw_round(weighted: DataFrame) -> DataFrame:
    """One multiplicative-weights round on the domain-grain frame
    (columns: domain, n_tok, loss_u6, w_ppm) -> same schema with the
    updated largest-remainder-normalized w_ppm."""
    dec = "decimal(38,0)"
    scal = weighted.agg(
        F.expr(
            "CAST(sum(CAST(w_ppm AS decimal(38,0)) * loss_u6)"
            " DIV sum(w_ppm) AS BIGINT)"
        ).alias("_lbar")
    )
    raw = weighted.crossJoin(F.broadcast(scal)).withColumn(
        "_p",
        F.col("w_ppm").cast(dec)
        * F.greatest(
            F.lit(K_MULT) + F.col("loss_u6") - F.col("_lbar"), F.lit(1)
        ).cast(dec),
    )
    full = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    rw = Window.partitionBy(F.lit(1)).orderBy(
        F.col("_rem").desc(), F.col("domain").asc()
    )
    staged = (
        raw.withColumn("_s", F.sum("_p").over(full))
        .withColumn(
            "_base",
            F.expr(f"CAST(({MICRO} * _p) DIV _s AS BIGINT)"),
        )
        .withColumn(
            "_rem",
            F.expr(f"{MICRO} * _p - (({MICRO} * _p) DIV _s) * _s"),
        )
        .withColumn("_bsum", F.sum("_base").over(full))
        .withColumn("_rk", F.row_number().over(rw))
    )
    return staged.select(
        "domain",
        "n_tok",
        "loss_u6",
        (
            F.col("_base")
            + (F.col("_rk") <= (F.lit(MICRO) - F.col("_bsum"))).cast(
                "bigint"
            )
        ).alias("w_ppm"),
    )


def domain_reweight_mw(
    docs: DataFrame,
    rounds: int = 5,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """T multiplicative-weights rounds from the uniform start (itself
    largest-remainder-rounded so round 0 already sums to 1e6 ppm).
    Output (|domains| rows): ``domain``, ``n_tok``, ``loss_u6``,
    ``w_ppm`` — the learned mixture in exact ppm."""
    loss = tracked_persist(domain_unigram_loss(docs, text_col, group_col))
    nd = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    rw = Window.partitionBy(F.lit(1)).orderBy(F.col("domain").asc())
    w = (
        loss.withColumn("_d", F.count(F.lit(1)).over(nd))
        .withColumn("_rk", F.row_number().over(rw))
        .select(
            "domain",
            "n_tok",
            "loss_u6",
            (
                F.expr(f"{MICRO} DIV _d")
                + (F.col("_rk") <= F.expr(f"{MICRO} % _d")).cast("bigint")
            ).alias("w_ppm"),
        )
    )
    # per-round lineage CUT (the mmr/coreset lesson): each round
    # references the previous round's frame twice (Lbar agg +
    # cross-join), so persisted-only state doubles the logical plan
    # per round — 2^T copies of the loss lineage at the planner even
    # though execution is bounded. The frame is |domains| rows
    # (model-sized), so an eager localCheckpoint per round is free.
    w = w.localCheckpoint()
    for _ in range(rounds):
        w = _mw_round(w).localCheckpoint()
    return w
