"""Corpus n-gram language-model scoring — the CCNet-recipe quality
signal: score every document by the average log-probability its word
bigrams get under a model trained on the corpus itself (boilerplate
and word salad score low, fluent text scores high), then filter or
bucket on the score.

Scale shape: TWO corpus passes build the model (unigram and bigram
count tables — language-bounded vocabulary sizes, the same
model-vs-data separation as BPE training), the count tables join back
onto the corpus's exploded bigrams (broadcast while they fit; plain
equi-joins beyond that), and one bounded-state shuffle on the doc id
aggregates per-document sums.

Oracle stability: per-bigram log-probs are scaled to MICRO-UNIT
integers (``round(ln(p)·10⁶)``) before the per-document sum, so the
aggregation is exact bigint arithmetic — independent of partitioning
and summation order, hash-identical across engines. (A float
``avg(ln p)`` would drift by merge order of partial aggregates.)

Model: add-one-smoothed bigram conditional
``p(b | a) = (c(a,b) + 1) / (c(a) + V)`` with V = |vocabulary|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

MICRO = 1_000_000


def _doc_bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, wi, a, b): adjacent lowercased word pairs per document."""
    toked = df.select(
        F.col(id_col),
        F.filter(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
            lambda x: x != "",
        ).alias("_tk"),
    )
    adj = F.when(
        F.size("_tk") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("_tk") - 1),
            lambda i: F.struct(
                F.element_at(F.col("_tk"), i).alias("a"),
                F.element_at(F.col("_tk"), i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    return toked.select(F.col(id_col), F.explode(adj).alias("_p")).select(
        id_col, F.col("_p.a").alias("a"), F.col("_p.b").alias("b")
    )


def lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_model: bool = False,
) -> DataFrame:
    """Score every document under the corpus bigram LM. Output: id,
    n_bigrams (int), logprob_u6 (bigint — sum of per-bigram
    ``round(ln p · 10⁶)``; divide by ``n_bigrams·10⁶`` for the average
    log-prob / negated perplexity exponent). Documents with fewer than
    two words keep a row with n_bigrams=0 and logprob_u6=0 —
    auditable, not dropped.

    ``broadcast_model`` pins a broadcast hint on the unigram/bigram
    count tables. Default ``False``: the count tables are
    corpus-VOCABULARY-sized (the distinct-bigram table reaches
    billions of rows at 100 TB), so the join must be allowed to
    degrade to a shuffled equi-join — AQE still broadcasts them at
    runtime whenever the measured size fits under
    ``spark.sql.autoBroadcastJoinThreshold``, which is the size-based
    switch the docstring above promises. Only the 1-row ``_v``
    vocabulary scalar keeps an unconditional hint."""
    bigrams = _doc_bigrams(df, text_col, id_col)
    uni = (
        bigrams.groupBy(F.col("a"))
        .agg(F.count(F.lit(1)).alias("_ca"))
    )
    # history counts c(a) = how often `a` opens a bigram (= token count
    # minus one per document tail); V over the same event space
    big = bigrams.groupBy("a", "b").agg(F.count(F.lit(1)).alias("_cab"))
    vdf = bigrams.select(
        F.countDistinct(F.col("a")).alias("_v")
    )
    if broadcast_model:
        big, uni = F.broadcast(big), F.broadcast(uni)
    scored = (
        bigrams.join(big, ["a", "b"])
        .join(uni, "a")
        .crossJoin(F.broadcast(vdf))
        .select(
            id_col,
            F.round(
                F.log((F.col("_cab") + 1.0) / (F.col("_ca") + F.col("_v")))
                * MICRO
            )
            .cast("bigint")
            .alias("_lp"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_bigrams"),
            F.sum("_lp").alias("logprob_u6"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("logprob_u6", F.lit(0)).cast("bigint").alias("logprob_u6"),
        )
    )
