"""Reciprocal-rank fusion — the hybrid-search combiner (Cormack,
Clarke, Büttcher, SIGIR 2009) every production retrieval stack runs
to merge rankings from heterogeneous scorers (lexical BM25 + a second
signal, or lexical + vector) WITHOUT score calibration:

    RRF(d) = Σ_rankers 1 / (C + rank_r(d))      (C = 60, the paper's)

Ranks are comparable where raw scores are not — that is the whole
trick, and it is exactly what makes the method hash-portable here:
the fused score in micro-units, ``Σ (10⁶ DIV (C + rank))``, is pure
integer arithmetic on 1-based ranks (nonnegative → Spark DIV ≡
DuckDB //).

Reference parity anchor: the reference has no retrieval layer at all
(``/root/reference/src/batch_train.py:95-117`` is key-equality
linking); this completes the engine's retrieval family — bm25_topk
and term_coverage_ranked produce the input rankings, this fuses them.

Scale shape: inputs are ALREADY top-k-per-query frames
(|queries|·k rows — model-sized by construction), so the union +
partial-agg sum + per-query WindowGroupLimit all run on ranking-sized
data; the corpus was left behind in the rankers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    c: int = 60,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Fuse per-query rankings (each: query, id, 1-based rank) into a
    top-``k`` by integer RRF. A document missing from one ranker
    simply contributes nothing for it (the standard convention).
    Output: query, id, rrf_u6; ties broken by id."""
    unioned = rankings[0].select(query_col, id_col, rank_col)
    for r in rankings[1:]:
        unioned = unioned.unionByName(r.select(query_col, id_col, rank_col))
    fused = unioned.groupBy(query_col, id_col).agg(
        F.sum(F.expr(f"1000000 DIV ({c} + {rank_col})"))
        .cast("bigint")
        .alias("rrf_u6")
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col("rrf_u6").desc(), F.col(id_col)
    )
    return (
        fused.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(query_col, id_col, "rrf_u6")
    )
