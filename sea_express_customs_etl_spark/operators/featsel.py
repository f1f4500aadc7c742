"""Feature selection for the hashed-feature classifier family: rank
token buckets by the χ² independence statistic against a document
label — the classic filter-method screen (Yang & Pedersen, ICML 1997)
run before training, here over the same 64 md5 buckets the integer
perceptron (:mod:`.perceptron`) trains on, so "which buckets carry the
label signal" is answerable in-engine.

χ² for a 2×2 presence/label contingency table is fully RATIONAL —
χ² = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d)) — so unlike mutual
information (which needs logs) it is exact-integer computable and
hash-portable: micro-unit output via ``(10⁶·num) DIV den`` in
DECIMAL(38,0)/HUGEINT, zero marginals defined as 0.

Scale shape: presence is one distinct over (doc, bucket) — bounded by
|docs|·B rows; the contingency counts are ONE partial-aggregated
B-row groupBy; corpus totals join in as a pinned 1-row broadcast. The
statistic's magnitude grows with N (χ² is N-scaled by definition), so
at extreme corpus sizes the DECIMAL(38,0) numerator ``10⁶·N·(ad−bc)²``
needs N·(ad−bc)² < 10³² — compute over a fixed-size sample or drop the
micro-unit scale when N approaches 10¹⁰ (the documented dial; feature
RANKING is scale-free, only the reported units change).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from .dsir import token_buckets


def chi2_feature_scores(
    df: DataFrame,
    label: Column,
    buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-bucket χ² of (bucket presence in doc) × (label) in exact
    micro-units. Output: bucket, n_pos (label docs containing it),
    n_docs (all docs containing it), chi2_micro (bigint; 0 when any
    marginal is empty). One row per OCCURRING bucket; the full table
    is the deliverable (order-free), ranking is the caller's
    ``orderBy``.
    """
    pres = token_buckets(
        df, text_col=text_col, id_col=id_col, buckets=buckets
    ).distinct()
    lab = df.select(F.col(id_col), label.cast("int").alias("_y"))
    counts = (
        pres.join(lab, id_col)
        .groupBy("bucket")
        .agg(
            F.sum("_y").cast("bigint").alias("_a"),
            (F.count(F.lit(1)) - F.sum("_y")).cast("bigint").alias("_b"),
        )
    )
    tot = lab.agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum("_y").cast("bigint").alias("_np"),
    )
    dec = "decimal(38,0)"
    a, b = F.col("_a").cast(dec), F.col("_b").cast(dec)
    c = (F.col("_np") - F.col("_a")).cast(dec)
    d = (F.col("_n") - F.col("_np") - F.col("_b")).cast(dec)
    det = a * d - b * c
    w = (
        counts.join(F.broadcast(tot))
        .withColumn(
            "_num", F.lit(10**6).cast(dec) * F.col("_n").cast(dec) * det * det
        )
        .withColumn("_den", (a + b) * (c + d) * (a + c) * (b + d))
    )
    return w.select(
        "bucket",
        F.col("_a").alias("n_pos"),
        (F.col("_a") + F.col("_b")).alias("n_docs"),
        F.when(F.col("_den") == 0, F.lit(0).cast("bigint"))
        .otherwise(F.expr("CAST(_num DIV _den AS BIGINT)"))
        .alias("chi2_micro"),
    )


def categorical_lift(
    df: DataFrame,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Categorical affinity (lift) matrix between two dimensions —
    "which market segments over-index on which order priorities":

        lift_ppm(a, b) = (10⁶ · n(a,b) · N) DIV (n(a)·n(b))

    — observed over expected-under-independence, in exact integer ppm
    (the cross product runs in DECIMAL(38,0): n(a)·n(b) reaches 10²⁴
    on a 10¹²-row table). 10⁶ = independent; above = affinity; below
    = avoidance. The categorical sibling of :func:`chi2_feature_scores`
    (which tests ONE binary label; this maps the full A×B surface) and
    of basket_rules' item-grain lift.

    Plan: one (a, b) partial-agg count; the two marginal frames are
    |A|- and |B|-sized, joined back hint-free; the 1-row total rides a
    pinned broadcast (the allowed scalar class). Output:
    a, b, n, lift_ppm."""
    pairs = df.groupBy(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ma = pairs.groupBy("a").agg(F.sum("n").alias("_na"))
    mb = pairs.groupBy("b").agg(F.sum("n").alias("_nb"))
    tot = pairs.agg(F.sum("n").alias("_nn"))
    return (
        pairs.join(ma, "a")
        .join(mb, "b")
        .join(F.broadcast(tot))
        .select(
            "a",
            "b",
            "n",
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) "
                "* CAST(n AS DECIMAL(38,0)) * CAST(_nn AS DECIMAL(38,0)))"
                " DIV (CAST(_na AS DECIMAL(38,0)) "
                "* CAST(_nb AS DECIMAL(38,0))) AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )
