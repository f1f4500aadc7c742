"""Token-vote text classifier — a Naive-Bayes-shaped discriminative
scorer with NO floating log-likelihoods: each vocabulary token votes
for the class where its RATE is higher, and a document's class is the
majority of its tokens' votes.

The rate comparison is cleared by cross-multiplication (the engine's
standard trick for rationals): token t votes for class A iff

    cnt_A(t) · T_B  >  cnt_B(t) · T_A        (T_c = Σ_t cnt_c(t))

— exact integers, so the trained artifact (the vote dictionary) and
every prediction are hash-portable. This is what multinomial NB
degrades to when per-token log-odds are quantized to their sign — the
right baseline when the question is "does the engine train and apply
a text classifier deterministically?" (the calibrated sibling is
``textstats.hashed_logit_score`` / the perceptron family).

Scale: one (label, token) partial-agg shuffle builds the count table
at DICTIONARY grain; the totals are a pinned 1-row scalar (the
chi2_features license); scoring is one equi-join of the corpus's
(doc, token) pairs against the vote dictionary + one per-doc
partial-agg — no window, no iteration.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F


def token_vote_confusion(
    df: DataFrame,
    label_col: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train the vote dictionary on the full frame and report the
    resubstitution confusion matrix (train ≡ eval — the capacity
    check; split with ``sampling.hash_split`` for generalization).
    Output: pred_pos (int 0/1), actual_pos (int 0/1), n_docs.
    Tie votes predict negative (deterministic)."""
    toks = df.select(
        F.col(id_col),
        label_col.cast("int").alias("_y"),
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("tok"),
    ).filter(F.col("tok") != "")
    cnt = toks.groupBy("tok").agg(
        F.sum("_y").cast("bigint").alias("_ca"),
        F.sum(F.lit(1) - F.col("_y")).cast("bigint").alias("_cb"),
    )
    tot = cnt.agg(
        F.sum("_ca").cast("bigint").alias("_ta"),
        F.sum("_cb").cast("bigint").alias("_tb"),
    )
    d38 = "decimal(38,0)"
    lhs = F.col("_ca").cast(d38) * F.col("_tb").cast(d38)
    rhs = F.col("_cb").cast(d38) * F.col("_ta").cast(d38)
    votes = cnt.crossJoin(F.broadcast(tot)).select(
        "tok",
        F.when(lhs > rhs, F.lit(1))
        .when(lhs < rhs, F.lit(-1))
        .otherwise(F.lit(0))
        .alias("_v"),
    )
    scored = (
        toks.join(votes, "tok")
        .groupBy(id_col, "_y")
        .agg(
            F.sum(F.when(F.col("_v") == 1, 1).otherwise(0)).alias("_va"),
            F.sum(F.when(F.col("_v") == -1, 1).otherwise(0)).alias("_vb"),
        )
    )
    return (
        scored.select(
            (F.col("_va") > F.col("_vb")).cast("int").alias("pred_pos"),
            F.col("_y").alias("actual_pos"),
        )
        .groupBy("pred_pos", "actual_pos")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
