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


def best_split_by_node(base: DataFrame) -> DataFrame:
    """Best Gini split PER NODE over a ``(_node, _x, _y)`` frame —
    the grouped form of :func:`best_stump_split`: identical integer
    impurity algebra, cumulants windowed per node, winner picked by
    the row_number-rank-1 shape (WindowGroupLimit — map-side partial
    top-1, never a global sort). Nodes whose feature is constant
    (no non-empty right side) emit no row, the CART "leaf" case."""
    cnt = base.groupBy("_node", "_x").agg(
        F.count(F.lit(1)).cast("bigint").alias("_c"),
        F.sum("_y").alias("_p"),
    )
    wo = (
        Window.partitionBy("_node")
        .orderBy("_x")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("_node")
    cum = cnt.select(
        "_node",
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
    staged = cum.filter(F.col("_nn") - F.col("n_l") > 0).select(
        "_node",
        F.col("_x").alias("split_value"),
        F.col("n_l").alias("n_left"),
        (F.col("_nn") - F.col("n_l")).cast("bigint").alias("n_right"),
        (F.lit(1_000_000).cast(D38) * (g_l * n_r + g_r * n_l)).alias("_num"),
        (n_l * n_r * F.col("_nn").cast(D38)).alias("_den"),
    )
    scored = staged.select(
        "_node",
        "split_value",
        "n_left",
        "n_right",
        F.expr("_num DIV _den").cast("bigint").alias("score_u6"),
    )
    wpick = Window.partitionBy("_node").orderBy(
        F.col("score_u6").asc(), F.col("split_value").asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(wpick))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


def tree_depth2(
    df: DataFrame, feature_col: Column, label_col: Column
) -> DataFrame:
    """Depth-2 CART on one numeric feature: the exact Gini root split,
    then the exact best split INSIDE each child — the first real tree,
    trained fully in-engine with the same hash-checkable integer
    discipline as the stump (the oracle threads the data-dependent
    root winner through CTEs, never pasted literals). Output: one row
    per node ('root', 'left', 'right') — node, split_value, n_left,
    n_right, score_u6; a pure child (constant feature) emits no row.

    Scale shape: the base (feature, label) projection is persisted for
    its two passes (root pick, child pass); each pass is one
    partial-agg shuffle to (node, value) cumulants at dictionary grain
    plus a WindowGroupLimit argmin; the root winner reaches the child
    pass as a pinned 1-row broadcast. Depth d costs d passes — the
    standard level-synchronous histogram-tree schedule (XGBoost's
    per-level plan), not a per-node recursion.
    """
    from ..plans.cache import tracked_persist

    base = tracked_persist(
        df.select(
            feature_col.alias("_x"), label_col.cast("bigint").alias("_y")
        )
    )  # two passes: root pick + child split
    root = best_split_by_node(base.withColumn("_node", F.lit("root")))
    sides = base.crossJoin(
        F.broadcast(root.select(F.col("split_value").alias("_s0")))
    ).select(
        F.when(F.col("_x") <= F.col("_s0"), F.lit("left"))
        .otherwise(F.lit("right"))
        .alias("_node"),
        "_x",
        "_y",
    )
    children = best_split_by_node(sides)
    return root.unionByName(children).select(
        F.col("_node").alias("node"),
        "split_value",
        "n_left",
        "n_right",
        "score_u6",
    )
