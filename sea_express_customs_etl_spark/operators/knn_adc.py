"""Holdout kNN label classification over the COMPRESSED code store —
the 100 TB sibling of ``operators/knn.py:knn_label_vote`` and the
follow-through on SCALE.md's knn probe note: classify from the PQ
store's ADC distances (8 LUT lookups per candidate) instead of exact
64-dim integer folds, the ``mmr_ann_rerank`` recipe applied to
classification.

The search is ``streaming/ann_store.py:store_adc_topk`` with ONE
addition: a candidate-scope predicate applied to the committed codes
BEFORE ranking (here: even vec_ids only — the train half; the same
hook scopes a store to a tenant or a time window). The frozen
quantizer (centroids + codebook) comes from the session's shared
store — codebook training is label-free compression, so including
odd vectors in the TRAINING SAMPLE leaks no labels into the
classifier; the candidate scope is what enforces train/test
separation.

Scale: per-candidate cost collapses from a 64-dim interpreted fold to
an m=8-row LUT sum (the ADC win); candidate COUNT still follows the
probed-cell populations, so the nlist ∝ √N dial documented in
SCALE.md applies to the coarse quantizer exactly as it does to the
exact-search variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F


def store_adc_topk_scoped(
    spark: SparkSession,
    table_prefix: str,
    centroids: DataFrame,
    codebook: DataFrame,
    queries: DataFrame,
    neighbor_pred,
    k: int = 5,
    m: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nprobe: int = 2,
) -> DataFrame:
    """``store_adc_topk`` with the committed codes filtered by
    ``neighbor_pred`` (a Column over ``neighbor_id``) before the
    per-query top-k — candidate scoping at the STORE side, the same
    mechanism the tombstone views use for deletes."""
    from sea_express_customs_etl_spark.operators.pq import _l2sq_micro
    from sea_express_customs_etl_spark.operators.similarity import _as_double
    from sea_express_customs_etl_spark.streaming.ann_store import (
        MICRO,
        committed_codes,
    )

    d = dim // m
    codes = (
        committed_codes(spark, table_prefix, id_col)
        .withColumnRenamed(id_col, "neighbor_id")
        .filter(neighbor_pred)
    )
    cen = centroids.select(
        F.col(id_col).alias("_cid"), _as_double(F.col(vec_col)).alias("_cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("_qv"),
    )
    pw = Window.partitionBy("query_id").orderBy(
        F.col("_d").asc(), F.col("_cid").asc()
    )
    probes = (
        q.join(F.broadcast(cen))
        .select(
            "query_id",
            "_qv",
            "_cid",
            "_cv",
            _l2sq_micro(F.col("_qv"), F.col("_cv")).alias("_d"),
        )
        .withColumn("_pr", F.row_number().over(pw))
        .filter(F.col("_pr") <= nprobe)
        .select(
            "query_id",
            F.col("_cid").alias("_qc"),
            F.zip_with(
                F.col("_qv"),
                F.col("_cv"),
                lambda x, y: F.round((x - y) * MICRO).cast("bigint"),
            ).alias("_r"),
        )
    )
    qsv = probes.select(
        "query_id",
        "_qc",
        F.posexplode(
            F.array(*[F.slice(F.col("_r"), j * d + 1, d) for j in range(m)])
        ).alias("subspace", "subvec"),
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("subvec"), F.col("cw_u6"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    lut = qsv.join(F.broadcast(codebook), "subspace").select(
        "query_id",
        "_qc",
        F.col("subspace").alias("_ls"),
        F.col("code").alias("_lc"),
        d2.alias("_d"),
    )
    sims = (
        codes.join(
            F.broadcast(lut),
            (F.col("cluster") == F.col("_qc"))
            & (F.col("subspace") == F.col("_ls"))
            & (F.col("code") == F.col("_lc")),
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id", "cluster")
        .agg(F.sum("_d").alias("dist_u12"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist_u12").asc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def knn_adc_vote(
    spark: SparkSession,
    emb: DataFrame,
    table_prefix: str,
    centroids: DataFrame,
    codebook: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Classify every odd-id vector by majority label of its ``k``
    nearest EVEN neighbors under ADC distances from the code store
    (vote ties → lowest label). Output: id, pred_label, true_label,
    correct — the same per-prediction grain as ``knn_label_vote``, so
    the two classifiers' quality is directly comparable under the
    gate."""
    test = emb.filter(F.col(id_col) % 2 == 1)
    nn = store_adc_topk_scoped(
        spark,
        table_prefix,
        centroids,
        codebook,
        test,
        neighbor_pred=F.col("neighbor_id") % 2 == 0,
        k=k,
        nprobe=nprobe,
        id_col=id_col,
    )
    votes = (
        nn.join(
            emb.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(label_col).alias("_nl"),
            ),
            "neighbor_id",
        )
        .groupBy("query_id", "_nl")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_c").desc(), F.col("_nl").asc()
    )
    pred = (
        votes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("query_id", F.col("_nl").alias("pred_label"))
    )
    return (
        pred.join(
            emb.select(
                F.col(id_col).alias("query_id"),
                F.col(label_col).alias("true_label"),
            ),
            "query_id",
        )
        .select(
            F.col("query_id").alias(id_col),
            "pred_label",
            "true_label",
            (F.col("pred_label") == F.col("true_label"))
            .cast("int")
            .alias("correct"),
        )
    )
