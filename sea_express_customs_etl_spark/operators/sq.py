"""SQ8 scalar quantization of embedding columns (FAISS ``SQ8``-style).

Completes the compressed-index family next to PQ/IVFPQ
(``operators/pq.py``): where PQ spends 8 bits per SUBSPACE, SQ8 spends
8 bits per DIMENSION — 4x the memory of PQ at far lower distortion, the
standard middle rung between flat float vectors and PQ codes. The
reference keeps its analytics single-node and float
(/root/reference/src/batch_train.py:82-131 holds whole tables in
pandas); this module is the distributed, compressed re-expression of
"search the corpus without reading full-precision vectors".

Everything is exact integer or IEEE-double arithmetic on micro-unit
integers (the ``kmeans_fit_q`` rule), so codes AND search results
hash-match a DuckDB oracle bit-for-bit:

* train: per-dimension ``(lo, span)`` over a training frame —
  ``lo = min(round(x*1e6))``, ``span = max(...) - lo`` (floored at 1);
  one posexplode + one partial-aggregated 64-group shuffle, packed into
  a ONE-ROW frame of two arrays (model-sized: 2·dim bigints).
* encode: ``code = clamp(floor((x_u6 - lo) * 255 / span), 0, 255)`` —
  map-only over the corpus; the stats row rides along as a pinned
  broadcast (model-sized by construction, the centroid/codebook rule in
  CLAUDE.md).
* search (asymmetric, ADC-style): reconstruct
  ``r = lo + floor(code * span / 255)`` and rank by exact integer
  squared-L2 against the UNquantized query — queries are few, so they
  stay full-precision (FAISS's asymmetric distance convention).

Scale shape: train on a bounded deterministic sample (``train_df``) at
100 TB — stats are 2·dim numbers regardless of corpus size; encode and
search are one corpus scan each with only the per-query top-k shuffle.
All divisions are IEEE double with integer operands < 2^53, then
floored — bit-identical in any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F

from sea_express_customs_etl_spark.operators.similarity import quantize_u6


def sq8_stats(
    train: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """ONE-ROW frame (lo_arr, span_arr: array<bigint>, dim-indexed) —
    the trained quantizer. ``span`` is floored at 1 so constant
    dimensions encode to 0 instead of dividing by zero."""
    per_dim = (
        quantize_u6(train, vec_col, id_col)
        .select(F.posexplode("v").alias("dim", "x"))
        .groupBy("dim")
        .agg(
            F.min("x").alias("lo"),
            F.greatest(F.max("x") - F.min("x"), F.lit(1).cast("bigint")).alias(
                "span"
            ),
        )
    )
    packed = per_dim.groupBy().agg(
        F.array_sort(F.collect_list(F.struct("dim", "lo", "span"))).alias("_s")
    )
    return packed.select(
        F.transform("_s", lambda s: s["lo"]).alias("lo_arr"),
        F.transform("_s", lambda s: s["span"]).alias("span_arr"),
    )


def _encoded(
    df: DataFrame,
    stats: DataFrame,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """(id, codes array<int>, lo_arr, span_arr) — map-only encode with
    the one-row stats frame as a pinned (model-sized) broadcast."""
    q = quantize_u6(df, vec_col, id_col)
    shifted = F.zip_with("v", "lo_arr", lambda x, lo: x - lo)
    codes = F.zip_with(
        shifted,
        "span_arr",
        lambda d, s: F.least(
            F.lit(255),
            F.greatest(F.lit(0), F.floor(d * 255 / s).cast("int")),
        ),
    )
    return q.crossJoin(F.broadcast(stats)).select(
        id_col, codes.alias("codes"), "lo_arr", "span_arr"
    )


def sq8_encode(
    df: DataFrame,
    train_df: DataFrame | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SQ8 codes, exploded to (id, dim, code) — one row per dimension,
    the same uniform shape as ``pq_encode``'s (id, subspace, code).

    ``train_df`` defaults to ``df`` itself (exact corpus min/max); at
    scale pass a bounded deterministic sample — the stats stay 2·dim
    numbers either way.
    """
    train = train_df if train_df is not None else df
    enc = _encoded(df, sq8_stats(train, vec_col, id_col), vec_col, id_col)
    return enc.select(
        id_col, F.posexplode("codes").alias("dim", "code")
    )


def sq8_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    train_df: DataFrame | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric top-k over SQ8 codes: exact micro-unit queries vs
    reconstructed corpus vectors, ranked by integer squared L2
    (ascending, ties -> lowest neighbor id). Output: query_id,
    neighbor_id, d2_u (bigint, squared distance in micro-units^2).

    Plan: corpus encode is map-only; the query frame (quantized
    full-precision) is a pinned broadcast (query sets are model-sized
    by definition); the only shuffle is the per-query top-k window.
    """
    stats = sq8_stats(train_df if train_df is not None else df, vec_col, id_col)
    enc = _encoded(df, stats, vec_col, id_col)
    recon = F.zip_with(
        F.zip_with(
            "codes", "span_arr", lambda c, s: F.floor(c * s / 255).cast("bigint")
        ),
        "lo_arr",
        lambda r, lo: r + lo,
    )
    corpus = enc.select(
        F.col(id_col).alias("neighbor_id"), recon.alias("_rv")
    )
    q = quantize_u6(queries, vec_col, id_col).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("_qv")
    )
    d2 = F.aggregate(
        F.zip_with("_qv", "_rv", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    sims = (
        corpus.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", d2.alias("d2_u"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("d2_u").asc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
