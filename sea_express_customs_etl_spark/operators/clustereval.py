"""Clustering-vs-labels agreement: the Adjusted Rand Index (Hubert &
Arabie 1985) between the integer k-means assignment and the class
labels — chance-corrected pair-counting agreement, EXACT in integers
(no libm, unlike NMI): with contingency counts n_ij, row margins a_i,
column margins b_j, N pairs C = N(N−1)/2, and pair sums
Sij = Σ C(n_ij,2), Sa = Σ C(a_i,2), Sb = Σ C(b_j,2),

    ARI = ( C·Sij − Sa·Sb ) / ( C·(Sa+Sb)/2 − Sa·Sb )

multiplied through by 2 so the half never truncates:

    ari_u6 = sdiv( 2·(C·Sij − Sa·Sb)·10⁶ , C·(Sa+Sb) − 2·Sa·Sb )

— numerator signed (worse-than-chance clusterings are negative), so
the division is negate-first; all products DECIMAL(38,0) (C ~ N²/2
passes int64 near N = 4·10⁹).

The assignment is the repo's bit-portable integer Lloyd's
(``kmeans_fit_q``) argmin — the same model the checked
``kmeans_q_centroids``/``kmeans_ivf_topk`` train — so the whole
train → assign → agree chain sits under one oracle hash.

Scale shape: broadcast-argmin assignment (map-only + one contingency
partial agg at (cluster, label) grain — k·L rows), then model-sized
arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

D38 = "decimal(38,0)"


def _c2(col: str) -> str:
    return f"(CAST({col} AS DECIMAL(38,0)) * ({col} - 1)) div 2"


def kmeans_label_ari(
    df: DataFrame,
    k: int = 4,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Output: ONE row (n bigint, k_clusters int, n_labels int,
    s_ij / s_a / s_b bigint, ari_u6 bigint)."""
    from sea_express_customs_etl_spark.operators.similarity import (
        _d2_q,
        kmeans_fit_q,
        quantize_u6,
    )

    cents = kmeans_fit_q(df, k=k, iters=iters, vec_col=vec_col,
                         id_col=id_col)
    cen = (
        cents.groupBy("cluster")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "c_u6"))
            ).alias("_s")
        )
        .select(
            "cluster", F.transform("_s", lambda s: s["c_u6"]).alias("cv")
        )
    )
    assigned = (
        quantize_u6(df, vec_col, id_col)
        .join(F.broadcast(cen))
        .select(
            id_col,
            F.struct(
                _d2_q(F.col("v"), F.col("cv")).alias("d"),
                F.col("cluster").alias("c"),
            ).alias("_dc"),
        )
        .groupBy(id_col)
        .agg(F.min("_dc").alias("_b"))
        .select(id_col, F.col("_b.c").alias("_cl"))
    )
    from sea_express_customs_etl_spark.plans.cache import tracked_persist

    # the (k·L)-row contingency frame feeds THREE aggregations — pin
    # it or each re-executes the corpus assignment (≥2-consumer rule)
    cont = tracked_persist(
        assigned.join(
            df.select(id_col, F.col(label_col).alias("_lb")), id_col
        )
        .groupBy("_cl", "_lb")
        .agg(F.count(F.lit(1)).alias("_nij"))
    )
    # pair sums: Sij at cell grain; margins re-aggregated from the
    # (k·L)-row contingency frame — model-sized arithmetic from here
    sij = cont.agg(
        F.sum(F.expr(_c2("_nij"))).alias("s_ij"),
        F.sum("_nij").cast(D38).alias("_n"),
        F.count(F.lit(1)).cast("int").alias("_cells"),
    )
    sa = (
        cont.groupBy("_cl")
        .agg(F.sum("_nij").alias("_ai"))
        .agg(
            F.sum(F.expr(_c2("_ai"))).alias("s_a"),
            F.count(F.lit(1)).cast("int").alias("k_clusters"),
        )
    )
    sb = (
        cont.groupBy("_lb")
        .agg(F.sum("_nij").alias("_bj"))
        .agg(
            F.sum(F.expr(_c2("_bj"))).alias("s_b"),
            F.count(F.lit(1)).cast("int").alias("n_labels"),
        )
    )
    c_pairs = "CAST((_n * (_n - 1)) div 2 AS DECIMAL(38,0))"
    ari_num = (
        f"2 * (({c_pairs} * s_ij) - s_a * s_b) * 1000000"
    )
    ari_den = f"({c_pairs} * (s_a + s_b)) - 2 * s_a * s_b"
    ari = (
        f"CAST(CASE WHEN ({ari_den}) = 0 THEN 0"
        f" WHEN ({ari_num}) >= 0 THEN ({ari_num}) div ({ari_den})"
        f" ELSE -((-({ari_num})) div ({ari_den})) END AS BIGINT)"
    )
    return (
        sij.crossJoin(F.broadcast(sa))
        .crossJoin(F.broadcast(sb))
        .select(
            F.col("_n").cast("bigint").alias("n"),
            "k_clusters",
            "n_labels",
            F.col("s_ij").cast("bigint").alias("s_ij"),
            F.col("s_a").cast("bigint").alias("s_a"),
            F.col("s_b").cast("bigint").alias("s_b"),
            F.expr(ari).alias("ari_u6"),
        )
    )
