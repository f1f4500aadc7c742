"""MMR (Maximal Marginal Relevance, Carbonell & Goldstein SIGIR'98)
diversified re-ranking — the retrieval-diversity stage between ANN
recall and the consumer: from each query's top-k candidates, greedily
select results that are relevant to the query AND dissimilar to what
is already selected. Dense retrieval returns near-duplicate
neighbors (this corpus's embedding space is literally one near-dup
family — see SCALE.md); a RAG context window wants coverage, not five
copies of the same passage.

MMR picks, at each step,

    argmax_c  λ·rel(q, c) − (1 − λ)·max_{s ∈ S} sim(c, s)

With λ = 1/2 the argmax is invariant under the ×2 rescale to
``rel − maxsim``, and with cosines held as micro-unit INTEGERS
(``round(1e6·cos)`` — the repo's float-through-arithmetic rule) every
step's score, argmax, and tie-break (score DESC, neighbor id ASC) is
exact — so the greedy SELECTION TRAJECTORY is hash-checkable against
an oracle that unrolls the k selection steps into chained CTEs
(the kmeans/bpe/unigram trained-artifact discipline applied to a
ranking policy).

Scale shape: relevance is the brute-force top-k (or any ANN front
end) — one candidate-generation pass; the pairwise-similarity table
is |queries|·k² rows (MODEL-sized: k is the context budget, not the
corpus), and each of the k_out selection steps is a join + partial
max + one WindowGroupLimit pick at that grain. Nothing touches the
corpus after candidate generation; nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

from ..plans.cache import tracked_persist
from .similarity import _dot, with_norm


def _cos_u6(va, na, vb, nb):
    return F.round(F.lit(1_000_000) * _dot(va, vb) / (na * nb)).cast(
        "bigint"
    )


def mmr_rerank(
    df: DataFrame,
    queries: DataFrame,
    k_cand: int = 10,
    k_out: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Greedy MMR (λ = 1/2) over each query's exact top-``k_cand``
    cosine candidates. Output: (query_id, neighbor_id, mmr_rank,
    rel_u6, score_u6) — ``score_u6 = rel_u6`` for the first pick,
    ``rel_u6 − max sim to already-selected`` after."""
    base = tracked_persist(with_norm(df, vec_col, id_col))
    q = with_norm(queries, vec_col, id_col).select(
        F.col(id_col).alias("query_id"),
        F.col("_v").alias("_qv"),
        F.col("_n").alias("_qn"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rel_u6").desc(), F.col("neighbor_id").asc()
    )
    cand = tracked_persist(
        q.join(base, F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            _cos_u6(
                F.col("_qv"), F.col("_qn"), F.col("_v"), F.col("_n")
            ).alias("rel_u6"),
            F.col("_v").alias("_cv"),
            F.col("_n").alias("_cn"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k_cand)
        .drop("_rn")
    )
    return _greedy_select(cand, k_out)


def mmr_rerank_from_candidates(
    df: DataFrame,
    candidates: DataFrame,
    k_out: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Greedy MMR over a PRE-COMPUTED candidate set — the 100 TB
    composition (r7 VERDICT #5): an ANN front end (incremental code
    store's ADC top-R → exact refine) proposes each query's top-k
    candidates, and only the greedy selection runs here, at
    |queries|·k² model grain. ``candidates``: (query_id, neighbor_id,
    rel_u6) with rel_u6 the integer micro-unit relevance (the refine
    stage's rounded cosine ×1e6 — bit-identical to :func:`_cos_u6` on
    the same pair). Candidate and query vectors are fetched from the
    corpus via one broadcast-semi-join scan each; the corpus is never
    scanned again after candidate generation upstream."""
    base = with_norm(df, vec_col, id_col)
    keys = candidates.select(
        F.col("neighbor_id").alias(id_col)
    ).distinct()
    vecs = base.join(F.broadcast(keys), id_col, "left_semi").select(
        F.col(id_col).alias("neighbor_id"),
        F.col("_v").alias("_cv"),
        F.col("_n").alias("_cn"),
    )
    cand = tracked_persist(
        candidates.select("query_id", "neighbor_id", "rel_u6").join(
            F.broadcast(vecs), "neighbor_id"
        )
    )
    return _greedy_select(cand, k_out)


def _greedy_select(cand: DataFrame, k_out: int) -> DataFrame:
    """The k_out greedy picks over a persisted candidate frame
    (query_id, neighbor_id, rel_u6, _cv, _cn) — shared by the
    brute-force and ANN-fed entry points; every step integer-exact."""
    a = cand.select(
        "query_id",
        F.col("neighbor_id").alias("_ca"),
        F.col("_cv").alias("_av"),
        F.col("_cn").alias("_an"),
    )
    b = cand.select(
        "query_id",
        F.col("neighbor_id").alias("_cb"),
        F.col("_cv").alias("_bv"),
        F.col("_cn").alias("_bn"),
    )
    psim = tracked_persist(
        a.join(b, "query_id")
        .filter(F.col("_ca") != F.col("_cb"))
        .select(
            "query_id",
            "_ca",
            "_cb",
            _cos_u6(
                F.col("_av"), F.col("_an"), F.col("_bv"), F.col("_bn")
            ).alias("sim_u6"),
        )
    )
    rel = cand.select("query_id", "neighbor_id", "rel_u6")
    pick_w = Window.partitionBy("query_id").orderBy(
        F.col("score_u6").desc(), F.col("neighbor_id").asc()
    )
    # Each greedy round references the running ``selected`` frame
    # twice (anti-join + selected-set join) and unions the pick back
    # on — persisted-only state therefore NESTS the whole prior round
    # inside every reference and the logical plan grows geometrically
    # (918 Exchange nodes / 2 MB explain text for k_out = 5 at sf0.1;
    # Catalyst re-analysis dominated the runtime). ``selected`` is
    # MODEL-sized (≤ |queries|·k_out rows — the context budget), so a
    # per-round eager localCheckpoint is the documented lineage CUT
    # (the mmr_ann_rerank lesson applied inside the loop): plan size
    # stays constant per round, values untouched.
    selected = (
        rel.withColumn("score_u6", F.col("rel_u6"))
        .withColumn("_rn", F.row_number().over(pick_w))
        .filter(F.col("_rn") == 1)
        .select(
            "query_id",
            "neighbor_id",
            F.lit(1).alias("mmr_rank"),
            "rel_u6",
            "score_u6",
        )
        .localCheckpoint()
    )
    for i in range(2, k_out + 1):
        sel_keys = selected.select("query_id", "neighbor_id")
        scored = (
            rel.join(sel_keys, ["query_id", "neighbor_id"], "left_anti")
            .join(
                psim.withColumnRenamed("_ca", "neighbor_id"),
                ["query_id", "neighbor_id"],
            )
            .join(
                sel_keys.withColumnRenamed("neighbor_id", "_cb"),
                ["query_id", "_cb"],
            )
            .groupBy("query_id", "neighbor_id", "rel_u6")
            .agg((F.col("rel_u6") - F.max("sim_u6")).alias("score_u6"))
        )
        pick = (
            scored.withColumn("_rn", F.row_number().over(pick_w))
            .filter(F.col("_rn") == 1)
            .select(
                "query_id",
                "neighbor_id",
                F.lit(i).alias("mmr_rank"),
                "rel_u6",
                "score_u6",
            )
        )
        selected = selected.unionByName(pick).localCheckpoint()
    return selected
