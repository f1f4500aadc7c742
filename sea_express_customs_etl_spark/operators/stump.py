"""Decision-stump training — the best single Gini split, found exactly
in one pass: the unit every tree ensemble (CART, GBDT, RF) repeats per
node, expressed as a distributed plan over DISTINCT-VALUE cumulants
instead of a per-executor sort (the XGBoost/LightGBM histogram trick,
taken to its exact limit: candidate thresholds ARE the distinct
feature values).

No float impurity ever exists (the ``kmeans_fit_q`` discipline for
trained artifacts): with left counts (n_l, p_l) and right counts
(n_r, p_r), Gini impurity of a side times n² is the INTEGER
``n² − p² − (n−p)²``, and the weighted split score

    score = (n_l·gini_l + n_r·gini_r) / N
          = (g_l·n_r + g_r·n_l) / (n_l·n_r·N),   g = n² − p² − (n−p)²

is an exact rational; it is emitted as ``score_u6 = (10⁶·num) DIV
den`` (products through DECIMAL(38,0)) and the argmin breaks ties on
the smaller threshold — fully deterministic, so the TRAINED ARTIFACT
(the chosen split) is hash-checkable, the same discipline as the
integer k-means / PQ / perceptron trainers.

Scale: one partial-agg shuffle to per-value (count, positives); the
cumulative window runs at distinct-value grain (feature dictionaries
are bounded in practice — histogram bins at the limit; the two-phase
``ranking.global_rank`` shape is the unbounded-value path); the argmin
is ``orderBy().limit(1)`` — TakeOrderedAndProject, never a global
window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F

D38 = "decimal(38,0)"


def best_stump_split(
    df: DataFrame, feature_col: Column, label_col: Column
) -> DataFrame:
    """One-row result: the threshold t minimizing weighted Gini for
    the split ``feature ≤ t`` (right side must be non-empty), with
    ``n_left``, ``n_right`` and ``score_u6``. ``label_col`` must
    evaluate to 0/1."""
    base = df.select(
        feature_col.alias("_x"), label_col.cast("bigint").alias("_y")
    )
    cnt = base.groupBy("_x").agg(
        F.count(F.lit(1)).cast("bigint").alias("_c"),
        F.sum("_y").alias("_p"),
    )
    wo = Window.orderBy("_x").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # dictionary-grain frame: |distinct feature values| rows — the
    # single-partition windows here are the documented model-sized
    # license (the WindowExec warning class traced in VERDICT r5 #4)
    cum = cnt.select(
        "_x",
        F.sum("_c").over(wo).alias("n_l"),
        F.sum("_p").over(wo).alias("p_l"),
        F.sum("_c").over(wall).alias("_nn"),
        F.sum("_p").over(wall).alias("_pp"),
    )
    n_l = F.col("n_l").cast(D38)
    p_l = F.col("p_l").cast(D38)
    n_r = (F.col("_nn") - F.col("n_l")).cast(D38)
    p_r = (F.col("_pp") - F.col("p_l")).cast(D38)
    g_l = n_l * n_l - p_l * p_l - (n_l - p_l) * (n_l - p_l)
    g_r = n_r * n_r - p_r * p_r - (n_r - p_r) * (n_r - p_r)
    staged = (
        cum.filter(F.col("_nn") - F.col("n_l") > 0)
        .select(
            F.col("_x").alias("split_value"),
            F.col("n_l").alias("n_left"),
            (F.col("_nn") - F.col("n_l")).cast("bigint").alias("n_right"),
            (F.lit(1_000_000).cast(D38) * (g_l * n_r + g_r * n_l)).alias(
                "_num"
            ),
            (n_l * n_r * F.col("_nn").cast(D38)).alias("_den"),
        )
    )
    return (
        staged.select(
            "split_value",
            "n_left",
            "n_right",
            F.expr("_num DIV _den").cast("bigint").alias("score_u6"),
        )
        .orderBy(F.col("score_u6").asc(), F.col("split_value").asc())
        .limit(1)
    )
