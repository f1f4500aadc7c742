"""Power-iteration top principal component over the embedding table,
held EXACTLY in integer micro-units — the linear-algebra member of the
trained-artifact family (kmeans centroids, PQ codebooks, perceptron
weights, BPE merges).

Beyond-parity operator (the reference's pandas core has no spectral
surface): the top principal direction of an embedding corpus is the
standard first step of whitening, anisotropy correction ("All-but-
the-top", Mu & Viswanath 2018) and drift monitoring; power iteration
(von Mises & Pollaczek-Geiringer 1929) is its scale-safe form — each
round is two matvecs, i.e. two partial-agg shuffles, never a dim×dim
Gram materialization per executor and never an all-pairs anything.

Exactness protocol: embeddings are quantized ONCE (x_u6 =
round(x·10⁶), float32 widened to double identically by Spark and
DuckDB before the round), then every subsequent operation is integer:
centering subtracts the signed-DIV mean; the per-row dot d_i is an
exact int sum rescaled by a SIGNED div (negate-first — trunc-vs-floor
divergence); the component update w_j = Σ_i xc_ij·d_i is summed as
DECIMAL(38,0) (int64 overflows past ~10⁶ rows at these magnitudes);
max-norm renormalization keeps every v component in ±10⁶ with one
signed div. The driver collects only model-sized artifacts per round
(64 w values — the kmeans/bpe license); the ORACLE re-derives the
whole trajectory through chained CTEs, so the gate hash-checks every
round, not a replayed answer.

Starting vector: all-ones u6 — deterministic, and not orthogonal to
the top component except on a measure-zero corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

MICRO = 1_000_000


def _sdiv(num: int, den: int) -> int:
    """Signed integer division, negate-first (truncation semantics on
    positives — the convention both engines share)."""
    return -((-num) // den) if num < 0 else num // den


def _quantized(
    df: DataFrame, vec_col: str, id_col: str
) -> DataFrame:
    """(i, j, x): exploded micro-unit integer components, j 1-based."""
    return df.select(
        F.col(id_col).alias("_i"),
        F.posexplode(vec_col).alias("_j0", "_e"),
    ).select(
        "_i",
        (F.col("_j0") + 1).alias("_j"),
        F.round(F.col("_e").cast("double") * MICRO)
        .cast("bigint")
        .alias("_x"),
    )


def pca_power_train(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    rounds: int = 5,
) -> tuple[list[int], list[int]]:
    """Run ``rounds`` integer power-iteration steps on the CENTERED
    quantized embedding matrix; return ``(v, mu)`` — the final
    component (u6, max-abs component = ±10⁶) and the per-dimension
    integer mean, both 1-based-dim-ordered Python lists (model-sized
    collects, the kmeans/bpe license).

    Per round, with xc_ij = x_ij − mu_j:

        d_i = sdiv(Σ_j xc_ij · v_j, 10⁶)         (map-only row dot)
        w_j = Σ_i xc_ij · d_i                     (DECIMAL(38,0) sum)
        v'_j = sdiv(w_j · 10⁶, max_j |w_j|)       (max-norm rescale)

    Each round is ONE Spark job: the 64-row w vector is collected and
    the rescale happens driver-side in exact Python ints; v re-enters
    the next round as literals (the trajectory is still fully
    hash-checked — the oracle re-derives every round from the data,
    so any divergence in any round's aggregation flips the final
    hash).
    """
    xq = _quantized(df, vec_col, id_col)
    mu_rows = (
        xq.groupBy("_j")
        .agg(F.sum("_x").alias("_s"), F.count(F.lit(1)).alias("_n"))
        .collect()
    )
    dims = sorted(r._j for r in mu_rows)
    mu = {r._j: _sdiv(int(r._s), int(r._n)) for r in mu_rows}
    # the centered matrix feeds two consumers per round across all
    # rounds — eager persist + unpersist in this function (the pq/bpe
    # trainer license; model training is consumed before return)
    xc = xq.select(
        "_i",
        "_j",
        (
            F.col("_x")
            - F.create_map(
                *[F.lit(v) for kv in mu.items() for v in kv]
            )[F.col("_j")]
        ).alias("_xc"),
    ).persist()
    v = {j: MICRO for j in dims}
    for _ in range(rounds):
        vmap = F.create_map(*[F.lit(t) for kv in v.items() for t in kv])
        d = (
            xc.select(
                "_i", "_j", "_xc", vmap[F.col("_j")].alias("_v")
            )
            .groupBy("_i")
            .agg(F.sum(F.col("_xc") * F.col("_v")).alias("_dot"))
            .select(
                "_i",
                F.expr(
                    "CASE WHEN _dot >= 0 THEN _dot div 1000000"
                    " ELSE -((-_dot) div 1000000) END"
                ).alias("_d"),
            )
        )
        w_rows = (
            xc.join(d, "_i")
            .groupBy("_j")
            .agg(
                F.sum(
                    F.col("_xc").cast("decimal(38,0)") * F.col("_d")
                ).alias("_w")
            )
            .collect()
        )
        w = {r._j: int(r._w) for r in w_rows}
        m = max(abs(x) for x in w.values())
        v = {j: _sdiv(w[j] * MICRO, m) for j in dims}
    xc.unpersist()
    return [v[j] for j in dims], [mu[j] for j in dims]


def pca_component_df(
    spark: SparkSession, v: list[int], mu: list[int]
) -> DataFrame:
    """The trained component as a checkable frame: (dim, v_u6, mu_u6),
    dim 1-based."""
    return spark.createDataFrame(
        [(j + 1, v[j], mu[j]) for j in range(len(v))],
        "dim int, v_u6 bigint, mu_u6 bigint",
    )


def pca_project(
    df: DataFrame,
    v: list[int],
    mu: list[int],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-vector projection onto the trained component:
    p_i = sdiv(Σ_j (x_ij − mu_j)·v_j, 10⁶) — the 1-D PCA score used
    for anisotropy removal and embedding-drift histograms. Map-only
    (the component enters as literals; no join, no shuffle)."""
    varr = F.array(*[F.lit(x) for x in v])
    muarr = F.array(*[F.lit(x) for x in mu])
    xq = df.select(
        F.col(id_col),
        F.transform(
            F.col(vec_col),
            lambda e: F.round(e.cast("double") * MICRO).cast("bigint"),
        ).alias("_xu"),
    )
    dot = F.aggregate(
        F.zip_with(
            F.zip_with(F.col("_xu"), muarr, lambda a, b: a - b),
            varr,
            lambda a, b: a * b,
        ),
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + t,
    )
    return (
        xq.select(id_col, dot.alias("_dot"))
        .select(
            id_col,
            F.expr(
                "CASE WHEN _dot >= 0 THEN _dot div 1000000"
                " ELSE -((-_dot) div 1000000) END"
            ).alias("proj_u6"),
        )
    )


def pca_label_anova(
    df: DataFrame,
    v: list[int],
    mu: list[int],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """One-way ANOVA of the 1-D PCA projection by class label — "does
    the top component separate the classes?", the linear-probe-lite
    eval a representation pipeline runs before training anything.
    All integer (truncated-mean spec, identical on both engines):

        mean_g = sdiv(Σ_g p, n_g);   gmean = sdiv(Σ_all p, N)
        SSW = Σ_i (p_i − mean_{g(i)})²
        SSB = Σ_g n_g · (mean_g − gmean)²
        F_u6 = SSB·(N−k)·10⁶ DIV ((k−1)·SSW)    (DECIMAL(38,0) products)

    Output: ONE row (k int, n bigint, ssb bigint, ssw bigint,
    f_u6 bigint). Scale: projection is map-only; the label join is
    id-grain; per-label and grand moments are partial aggs; the final
    arithmetic is a broadcast 1-row × 10-row cross — model-sized.
    """
    from sea_express_customs_etl_spark.plans.cache import tracked_persist

    proj = tracked_persist(
        pca_project(df, v, mu, vec_col, id_col).join(
            df.select(id_col, label_col), id_col
        )
    )
    sd = (
        "CASE WHEN {s} >= 0 THEN {s} div {n}"
        " ELSE -((-{s}) div {n}) END"
    )
    lbl = (
        proj.groupBy(label_col)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("proj_u6").alias("_s"),
        )
        .select(
            label_col,
            "_n",
            F.expr(sd.format(s="_s", n="_n")).alias("_mean"),
        )
    )
    grand = proj.agg(
        F.count(F.lit(1)).alias("_nn"), F.sum("proj_u6").alias("_ss")
    ).select(
        "_nn", F.expr(sd.format(s="_ss", n="_nn")).alias("_gmean")
    )
    ssw = (
        proj.join(lbl.select(label_col, "_mean"), label_col)
        .select(
            ((F.col("proj_u6") - F.col("_mean"))
             * (F.col("proj_u6") - F.col("_mean"))).alias("_d2")
        )
        .agg(F.sum("_d2").cast("bigint").alias("ssw"))
    )
    ssb = (
        lbl.crossJoin(F.broadcast(grand))
        .select(
            F.lit(1).alias("_one"),
            (F.col("_n")
             * (F.col("_mean") - F.col("_gmean"))
             * (F.col("_mean") - F.col("_gmean"))).alias("_b"),
            "_n",
        )
        .groupBy("_one")
        .agg(
            F.count(F.lit(1)).cast("int").alias("k"),
            F.sum("_n").cast("bigint").alias("n"),
            F.sum("_b").cast("bigint").alias("ssb"),
        )
        .drop("_one")
    )
    dec = "CAST({} AS DECIMAL(38,0))"
    f_expr = (
        f"CAST(({dec.format('ssb')} * ({dec.format('n')} - k) * 1000000)"
        f" div (CAST(k - 1 AS DECIMAL(38,0)) * {dec.format('ssw')})"
        " AS BIGINT)"
    )
    return (
        ssb.crossJoin(F.broadcast(ssw))
        .select("k", "n", "ssb", "ssw", F.expr(f_expr).alias("f_u6"))
    )
