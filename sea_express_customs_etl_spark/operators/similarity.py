"""Similarity search over embedding columns (array<float>).

Two paths, both pure DataFrame ops:

* brute-force cosine top-k — the correctness baseline: broadcast the
  (small) query set against the full corpus, fold the dot product
  inside a single Catalyst expression (``zip_with`` + ``aggregate``,
  deterministic left-to-right summation — bit-stable across engines,
  unlike a shuffled ``sum``).
* IVF (inverted-file) top-k — the scale path: assign every vector to
  its nearest centroid (argmin over a broadcast centroid set), then
  search only within the probe cluster. At 100 TB the assignment is a
  map-only pass and the search join shuffles on ``cluster`` instead of
  exploding a full cross product.

All similarity values are rounded (6dp) before ranking so top-k
ordering is reproducible; ranking ties break by neighbor id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def with_norm(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Project to (id, double vector, L2 norm)."""
    dv = _as_double(F.col(vec_col))
    return df.select(F.col(id_col), dv.alias("_v"), _norm(dv).alias("_n"))


def cosine(v_a: Column, n_a: Column, v_b: Column, n_b: Column, scale: int = 6) -> Column:
    return F.round(_dot(v_a, v_b) / (n_a * n_b), scale)


def brute_force_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: every query vs every other vector.

    Output: query_id, neighbor_id, cosine. The query side is broadcast
    (query sets are small by definition); the corpus is scanned once
    with no shuffle before the per-query top-k.
    """
    c = with_norm(df, vec_col, id_col).withColumnRenamed(id_col, "neighbor_id")
    q = (
        with_norm(queries, vec_col, id_col)
        .withColumnRenamed(id_col, "query_id")
        .withColumnRenamed("_v", "_qv")
        .withColumnRenamed("_n", "_qn")
    )
    sims = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("_qv"), F.col("_qn"), F.col("_v"), F.col("_n")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """Assign each vector to its nearest centroid by cosine (ties →
    lowest centroid id). Output: id, _v, _n, cluster.

    The centroid set is broadcast; assignment is map-only (argmin via
    min(struct(-sim, centroid_id)) — no window, partial-aggregatable).
    """
    c = with_norm(df, vec_col, id_col)
    cen = (
        with_norm(centroids.withColumnRenamed(id_col, centroid_id_col), vec_col, centroid_id_col)
        .withColumnRenamed("_v", "_cv")
        .withColumnRenamed("_n", "_cn")
    )
    sims = c.join(F.broadcast(cen)).select(
        id_col,
        "_v",
        "_n",
        F.col(centroid_id_col),
        cosine(F.col("_v"), F.col("_n"), F.col("_cv"), F.col("_cn")).alias("_sim"),
    )
    best = sims.groupBy(id_col, "_v", "_n").agg(
        F.min(F.struct((-F.col("_sim")).alias("_ns"), F.col(centroid_id_col).alias("c"))).alias(
            "_b"
        )
    )
    return best.select(id_col, "_v", "_n", F.col("_b.c").alias("cluster"))


def ivf_topk(
    df: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: search the query's ``nprobe`` nearest
    clusters. Output: query_id, neighbor_id, cosine, cluster.

    ``nprobe=1`` searches only the query's own cluster (fastest,
    lowest recall); raising it widens the probed set — the standard
    IVF recall/latency dial. Corpus-side work stays one shuffle on
    ``cluster``; the probe table (|queries| × nprobe rows) is
    broadcast, so recall is bought without a second corpus pass.
    """
    assigned = ivf_assign(df, centroids, vec_col, id_col)
    q = assigned.join(queries.select(F.col(id_col)), id_col, "left_semi").select(
        F.col(id_col).alias("query_id"),
        F.col("_v").alias("_qv"),
        F.col("_n").alias("_qn"),
    )
    cen = (
        with_norm(
            centroids.withColumnRenamed(id_col, "centroid_id"),
            vec_col,
            "centroid_id",
        )
        .withColumnRenamed("_v", "_cv")
        .withColumnRenamed("_n", "_cn")
    )
    # rank each query's centroids: same (sim DESC, centroid_id ASC)
    # order as the assignment argmin, so nprobe=1 ≡ own cluster
    pw = Window.partitionBy("query_id").orderBy(
        F.col("_sim").desc(), F.col("centroid_id").asc()
    )
    probes = (
        q.join(F.broadcast(cen))
        .select(
            "query_id",
            "_qv",
            "_qn",
            F.col("centroid_id"),
            cosine(F.col("_qv"), F.col("_qn"), F.col("_cv"), F.col("_cn")).alias(
                "_sim"
            ),
        )
        .withColumn("_pr", F.row_number().over(pw))
        .filter(F.col("_pr") <= nprobe)
        .select("query_id", "_qv", "_qn", F.col("centroid_id").alias("cluster"))
    )
    sims = (
        assigned.withColumnRenamed(id_col, "neighbor_id")
        .join(F.broadcast(probes), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            "cluster",
            cosine(F.col("_qv"), F.col("_qn"), F.col("_v"), F.col("_n")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def refine_exact_topk(
    df: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The REFINE stage of a compressed ANN index (VERDICT r5 #2): a
    compressed scan (IVFPQ/SQ8 ADC) proposes top-R candidates per
    query, then the ORIGINAL vectors of those candidates — and only
    those — are fetched and re-ranked by the exact rounded cosine of
    :func:`brute_force_topk` (ties → lowest neighbor id). This is the
    standard production recipe (every FAISS IVFPQ deployment re-ranks
    ADC output): recall recovered to candidate-coverage level at PQ
    memory cost, since the exact distance runs on |queries|·R rows,
    never the corpus.

    ``candidates``: (query_id, neighbor_id) — model-sized. The CALLER
    should persist it when it feeds this function (it is consumed
    twice below) and anything else — the CLAUDE.md ≥2-consumers rule.
    Output: query_id, neighbor_id, cosine — the exact top-k within
    the candidate set.

    Scale: two corpus scans, each the only corpus-touching step of its
    branch — one broadcast semi-join fetches the |queries| query
    vectors, one streams the corpus against the broadcast candidate
    list (with the query vectors already attached), so the exact
    distance runs map-side in that single pass; min/max row-group
    stats prune both scans.
    """
    cand = candidates.select("query_id", "neighbor_id")
    c = with_norm(df, vec_col, id_col)
    qv = c.join(
        F.broadcast(cand.select(F.col("query_id").alias(id_col)).distinct()),
        id_col,
        "left_semi",
    ).select(
        F.col(id_col).alias("query_id"),
        F.col("_v").alias("_qv"),
        F.col("_n").alias("_qn"),
    )
    candq = cand.join(F.broadcast(qv), "query_id")
    sims = (
        c.withColumnRenamed(id_col, "neighbor_id")
        .join(F.broadcast(candq), "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(
                F.col("_qv"), F.col("_qn"), F.col("_v"), F.col("_n")
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def quantize_u6(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(id, v) with the vector quantized to micro-unit integers
    (``round(x·10⁶)`` per dim, array<bigint>) — the representation that
    makes every downstream sum/distance exact and engine-portable."""
    return df.select(
        F.col(id_col),
        F.transform(
            _as_double(F.col(vec_col)),
            lambda x: F.round(x * 1_000_000).cast("bigint"),
        ).alias("v"),
    )


def kmeans_fit_q(
    df: DataFrame,
    k: int = 4,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Lloyd's k-means over MICRO-UNIT INTEGER vectors — bit-portable
    training: unlike :func:`kmeans_fit` (float means, reproducible only
    to tolerance), every step here is exact integer arithmetic or a
    floor, so the trained centroids hash-match a SQL oracle.

    * vectors quantized via :func:`quantize_u6`;
    * init: the ``k`` vectors with the lowest ``(md5(id), id)`` — a
      deterministic pseudo-random spread computable in any engine (no
      xxhash dependency);
    * assignment: integer squared-L2 argmin (exact bigint sums), ties →
      lowest cluster index;
    * update: per-dim ``floor(sum / count)``; empty clusters keep their
      previous centroid; EXACTLY ``iters`` iterations (no data-dependent
      early stop — the oracle unrolls the same count);
    * output: (cluster, dim, c_u6) — k·dim rows.

    Scale: same shape as :func:`kmeans_fit` (broadcast-argmin assignment,
    partial-aggregated per-dim sums, O(k·dim) driver state). Exactness
    bound: per-(cluster,dim) sums stay below 2^53 (double-division
    floor) up to ~10⁸ training rows at |x|≤10 — train on a bounded
    deterministic sample beyond that, which is standard practice anyway.
    """
    spark = df.sparkSession
    base = quantize_u6(df, vec_col, id_col).persist()
    init = (
        base.withColumn("_h", F.md5(F.col(id_col).cast("string")))
        .orderBy("_h", F.col(id_col))
        .limit(k)
        .collect()
    )
    # cluster ids 0..k-1 in (md5, id) order
    cents: list[list[int]] = [list(r["v"]) for r in init]
    dim = len(cents[0])

    for _ in range(iters):
        cen_df = spark.createDataFrame(
            [(c, v) for c, v in enumerate(cents)],
            schema="cluster int, cv array<bigint>",
        )
        d2 = F.aggregate(
            F.zip_with(F.col("v"), F.col("cv"), lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        assigned = (
            base.join(F.broadcast(cen_df))
            .select(
                id_col,
                "v",
                F.struct(d2.alias("d"), F.col("cluster").alias("c")).alias("_dc"),
            )
            .groupBy(id_col)
            # v is constant within the group (rows differ only by
            # candidate cluster), so first() is value-deterministic
            .agg(F.min("_dc").alias("_b"), F.first("v").alias("v"))
            .select("v", F.col("_b.c").alias("cluster"))
        )
        sums = (
            assigned.select("cluster", F.posexplode("v").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(
                F.floor(F.sum("x") / F.count(F.lit(1))).cast("bigint").alias("m")
            )
            .collect()  # k·dim rows — model-sized, like kmeans_fit
        )
        new_cents = [list(c) for c in cents]  # empty clusters keep position
        for r in sums:
            new_cents[r["cluster"]][r["dim"]] = r["m"]
        cents = new_cents
    base.unpersist()
    return spark.createDataFrame(
        [(c, d, cents[c][d]) for c in range(k) for d in range(dim)],
        schema="cluster int, dim int, c_u6 bigint",
    )


def _d2_q(a: Column, b: Column) -> Column:
    """Exact integer squared-L2 between micro-unit vectors (bigint
    fold — associative, so bit-identical under any evaluation order).
    Bound: 64 dims of |x| ≤ 2·10⁷ micro-units sum to < 2.6·10¹⁶ ≪ 2⁶³."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def ivf_topk_q(
    df: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF search over TRAINED integer centroids — the search stage
    that makes the whole train→index→query pipeline hash-checkable
    (VERDICT r5 #1): :func:`kmeans_fit_q` trains bit-portable
    centroids, and every distance here is an exact bigint squared-L2
    over micro-unit vectors, so assignment, probe ranking AND the
    final top-k are engine-portable (ties → lowest cluster / lowest
    neighbor id, the family's deterministic tie-break).

    ``centroids`` is ``kmeans_fit_q`` output — long format
    ``(cluster, dim, c_u6)``; reassembled to arrays here (k·dim rows,
    model-sized).

    Output: query_id, neighbor_id, cluster, d2_u12 (squared L2 in
    units of 10⁻¹² — ascending = most similar).

    Scale shape identical to :func:`ivf_topk`: broadcast-argmin
    assignment (map-only + one partial-aggregated shuffle), probe
    table |queries|·nprobe rows broadcast, search join shuffles on
    ``cluster`` — never a corpus cross product.
    """
    cen = (
        centroids.groupBy("cluster")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "c_u6"))).alias("_s"))
        .select(
            "cluster", F.transform("_s", lambda s: s["c_u6"]).alias("cv")
        )
    )
    base = quantize_u6(df, vec_col, id_col)
    assigned = (
        base.join(F.broadcast(cen))
        .select(
            id_col,
            "v",
            F.struct(
                _d2_q(F.col("v"), F.col("cv")).alias("d"),
                F.col("cluster").alias("c"),
            ).alias("_dc"),
        )
        .groupBy(id_col)
        # v is constant within the group — first() is value-deterministic
        .agg(F.min("_dc").alias("_b"), F.first("v").alias("v"))
        .select(id_col, "v", F.col("_b.c").alias("cluster"))
    )
    q = base.join(queries.select(F.col(id_col)), id_col, "left_semi").select(
        F.col(id_col).alias("query_id"), F.col("v").alias("_qv")
    )
    pw = Window.partitionBy("query_id").orderBy(
        F.col("_d").asc(), F.col("cluster").asc()
    )
    probes = (
        q.join(F.broadcast(cen))
        .select(
            "query_id", "_qv", "cluster", _d2_q(F.col("_qv"), F.col("cv")).alias("_d")
        )
        .withColumn("_pr", F.row_number().over(pw))
        .filter(F.col("_pr") <= nprobe)
        .select("query_id", "_qv", "cluster")
    )
    sims = (
        assigned.withColumnRenamed(id_col, "neighbor_id")
        .join(F.broadcast(probes), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            "cluster",
            _d2_q(F.col("_qv"), F.col("v")).alias("d2_u12"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("d2_u12").asc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    max_iter: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Distributed Lloyd's k-means over an embedding column → the
    centroid table :func:`ivf_topk`/:func:`ivf_assign` consume
    (columns: ``vec_id`` = centroid id, ``embedding`` array<double>).

    Scale shape: per iteration, ONE broadcast-join assignment pass
    (map-only argmin, no window) and ONE partial-aggregatable
    ``posexplode → avg`` for the new means — two shuffles bounded by
    k·dim output rows. Driver state is O(k·dim) (the centroids
    themselves, collected each iteration exactly like MLlib's
    implementation), never O(corpus).

    Deterministic init, no RNG: the k corpus vectors with the lowest
    ``xxhash64(id)`` (a fixed pseudo-random spread — same seeds on
    every run and any partitioning). Empty clusters keep their
    previous centroid. Distributed float-mean summation order is not
    bit-stable across partitionings, so trained centroids are
    reproducible to float tolerance, not bitwise — the reason the
    k-means query is property-tested (recall floor) rather than
    hash-matched against a SQL oracle.
    """
    # the training set is re-scanned once per iteration (assignment) —
    # persist it so iterations read the materialized vectors, not the
    # upstream plan (at cluster scale this is the cached training frame
    # every iterative fitter holds; MEMORY_AND_DISK spills, not evicts)
    base = df.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("_v")
    ).persist()
    init = (
        base.withColumn("_h", F.xxhash64(F.col(id_col)))
        .orderBy("_h", F.col(id_col))
        .limit(k)
        .collect()
    )
    cents: list[list[float]] = [list(r["_v"]) for r in init]

    spark = df.sparkSession
    for _ in range(max_iter):
        cen_df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(cents)],
            schema=f"{id_col} long, {vec_col} array<double>",
        )
        assigned = ivf_assign(base.withColumnRenamed("_v", vec_col), cen_df,
                              vec_col, id_col)
        means = (
            assigned.select("cluster", F.posexplode("_v").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()  # k·dim rows — bounded by model size, not data
        )
        new_cents = list(cents)  # empty clusters keep previous position
        by_cluster: dict[int, dict[int, float]] = {}
        for r in means:
            by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["m"]
        for c, dims in by_cluster.items():
            new_cents[c] = [dims[p] for p in range(len(dims))]
        if new_cents == cents:
            break
        cents = new_cents
    base.unpersist()
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(cents)],
        schema=f"{id_col} long, {vec_col} array<double>",
    )


def pool_embeddings_q(
    df: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Mean-pool embeddings per group in micro-unit integers — the
    chunk→document aggregation of a two-tier embedding pipeline (embed
    fixed-size chunks, pool to one document vector before indexing /
    near-dup detection). Quantize-then-sum makes the pooled vector
    aggregation-order-exact: integer sums commute, and the mean is a
    floor division — bit-identical in any engine, unlike a float mean
    whose partial-merge order leaks into the low bits (the same rule
    as ``kmeans_fit_q``).

    Output: one row per (group, dim) — group_col, dim (0-based),
    n_vecs, mean_u6 (floor(Σ round(x·10⁶) / n)). Exploded rather than
    an array column so downstream joins/oracles treat dims uniformly.
    Scale shape: map-only quantize + posexplode (corpus × dim rows),
    ONE partial-aggregated (group, dim) shuffle; group state is a
    single (sum, count) pair.
    """
    q = df.select(
        F.col(group_col),
        F.transform(
            _as_double(F.col(vec_col)),
            lambda x: F.round(x * 1_000_000).cast("bigint"),
        ).alias("_v"),
    )
    return (
        q.select(group_col, F.posexplode("_v").alias("dim", "_x"))
        .groupBy(group_col, "dim")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_vecs"),
            F.floor(F.sum("_x") / F.count(F.lit(1)))
            .cast("bigint")
            .alias("mean_u6"),
        )
    )


def ivf_knn_q(
    corpus: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """:func:`ivf_topk_q` with a query set DISJOINT from the searched
    corpus — the holdout-kNN shape (train/test separation): queries
    quantize from their OWN frame instead of semi-joining the corpus,
    so a test vector can never appear among its own candidates.
    Everything else is the exact-integer IVF search unchanged:
    bigint squared-L2, ties → lowest cluster / lowest neighbor id.

    Output: query_id, neighbor_id, cluster, d2_u12.

    Scale shape: identical to :func:`ivf_topk_q` — broadcast-argmin
    assignment, |queries|·nprobe probe table broadcast, search join
    shuffled on ``cluster``, per-query top-k via the
    row_number-then-filter WindowGroupLimit shape.
    """
    cen = (
        centroids.groupBy("cluster")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "c_u6"))).alias("_s"))
        .select(
            "cluster", F.transform("_s", lambda s: s["c_u6"]).alias("cv")
        )
    )
    assigned = (
        quantize_u6(corpus, vec_col, id_col)
        .join(F.broadcast(cen))
        .select(
            id_col,
            "v",
            F.struct(
                _d2_q(F.col("v"), F.col("cv")).alias("d"),
                F.col("cluster").alias("c"),
            ).alias("_dc"),
        )
        .groupBy(id_col)
        .agg(F.min("_dc").alias("_b"), F.first("v").alias("v"))
        .select(id_col, "v", F.col("_b.c").alias("cluster"))
    )
    q = quantize_u6(queries, vec_col, id_col).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("_qv")
    )
    pw = Window.partitionBy("query_id").orderBy(
        F.col("_d").asc(), F.col("cluster").asc()
    )
    probes = (
        q.join(F.broadcast(cen))
        .select(
            "query_id",
            "_qv",
            "cluster",
            _d2_q(F.col("_qv"), F.col("cv")).alias("_d"),
        )
        .withColumn("_pr", F.row_number().over(pw))
        .filter(F.col("_pr") <= nprobe)
        .select("query_id", "_qv", "cluster")
    )
    sims = (
        assigned.withColumnRenamed(id_col, "neighbor_id")
        .join(F.broadcast(probes), "cluster")
        .select(
            "query_id",
            "neighbor_id",
            "cluster",
            _d2_q(F.col("_qv"), F.col("v")).alias("d2_u12"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("d2_u12").asc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
