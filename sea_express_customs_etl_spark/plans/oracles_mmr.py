"""DuckDB oracle for MMR diversified re-ranking (``operators/mmr.py``)
— the greedy selection TRAJECTORY unrolled: candidate top-k by integer
micro-unit cosine, the |queries|·k² pairwise-sim table, then one CTE
pair (score+pick, running selection) per selection step. λ = 1/2 via
the exact ×2 rescale (score = rel − maxsim), ties (score DESC, id
ASC) — everything integer after the one rounded division, identical
on both engines.
"""

from __future__ import annotations

from sea_express_customs_etl_spark.plans.oracles_ext import _NRM

_COS_U6 = (
    "CAST(round(1000000 * list_inner_product({a}.v, {b}.v)"
    " / ({a}.n * {b}.n)) AS BIGINT)"
)


def mmr_rerank_sql(
    k_cand: int = 10,
    k_out: int = 5,
    rel_cte: str | None = None,
    prelude: str = "",
) -> str:
    """``rel_cte`` overrides the candidate-generation CTE (must define
    ``rel(query_id, neighbor_id, rel_u6)``); default is the exact
    brute-force top-``k_cand``. ``prelude`` injects CTEs before
    ``nrm`` (the ANN-fed variant's trained-index candidate set)."""
    steps = []
    for i in range(2, k_out + 1):
        p = i - 1
        steps.append(
            f""",
c{i} AS MATERIALIZED (
  SELECT r.query_id, r.neighbor_id, r.rel_u6,
         r.rel_u6 - max(p.sim_u6) AS score_u6
  FROM rel r
  JOIN psim p ON p.query_id = r.query_id AND p.ca = r.neighbor_id
  JOIN sel{p} s ON s.query_id = p.query_id AND s.neighbor_id = p.cb
  WHERE NOT EXISTS (SELECT 1 FROM sel{p} x
                    WHERE x.query_id = r.query_id
                      AND x.neighbor_id = r.neighbor_id)
  GROUP BY 1, 2, 3),
s{i} AS MATERIALIZED (
  SELECT query_id, neighbor_id, CAST({i} AS INTEGER) AS mmr_rank,
         rel_u6, score_u6
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY score_u6 DESC, neighbor_id) AS rn FROM c{i})
  WHERE rn = 1),
sel{i} AS MATERIALIZED (
  SELECT query_id, neighbor_id, mmr_rank, rel_u6, score_u6 FROM sel{p}
  UNION ALL
  SELECT query_id, neighbor_id, mmr_rank, rel_u6, score_u6 FROM s{i})"""
        )
    if rel_cte is None:
        rel_cte = f"""q AS (SELECT * FROM nrm WHERE vec_id < 10),
rel AS MATERIALIZED (
  SELECT query_id, neighbor_id, rel_u6 FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           {_COS_U6.format(a='q', b='c')} AS rel_u6,
           row_number() OVER (PARTITION BY q.vec_id
               ORDER BY {_COS_U6.format(a='q', b='c')} DESC, c.vec_id)
               AS rn
    FROM q JOIN nrm c ON c.vec_id <> q.vec_id)
  WHERE rn <= {k_cand})"""
    return (
        f"""
WITH {prelude}{_NRM},
{rel_cte},
psim AS MATERIALIZED (
  SELECT a.query_id, a.neighbor_id AS ca, b.neighbor_id AS cb,
         {_COS_U6.format(a='na', b='nb')} AS sim_u6
  FROM rel a
  JOIN rel b ON b.query_id = a.query_id
            AND b.neighbor_id <> a.neighbor_id
  JOIN nrm na ON na.vec_id = a.neighbor_id
  JOIN nrm nb ON nb.vec_id = b.neighbor_id),
sel1 AS MATERIALIZED (
  SELECT query_id, neighbor_id, CAST(1 AS INTEGER) AS mmr_rank,
         rel_u6, rel_u6 AS score_u6
  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY rel_u6 DESC, neighbor_id) AS rn FROM rel)
  WHERE rn = 1)"""
        + "".join(steps)
        + f"""
SELECT query_id, neighbor_id, mmr_rank, rel_u6, score_u6
FROM sel{k_out}
"""
    )


MMR_RERANK_SQL = mmr_rerank_sql(10, 5)


def mmr_ann_rerank_sql(k_ref: int = 10, k_out: int = 5) -> str:
    """MMR over the TRAINED-ANN candidate path (r7 VERDICT #5): the
    incremental code store's ADC top-200 (≡ the one-shot
    ``_IVFPQ_TRAINED_TMPL`` by the store's per-row-encode invariant)
    → exact-cosine refine to top-``k_ref`` → the same unrolled greedy
    selection. The whole three-stage 100 TB diversity path is one
    hash-checked statement — candidate generation, refine ordering,
    and selection trajectory all pinned."""
    from sea_express_customs_etl_spark.plans.oracles_ext import (
        _IVFPQ_TRAINED_TMPL,
    )

    prelude = (
        "cand AS (\n  SELECT query_id, neighbor_id FROM ("
        + _IVFPQ_TRAINED_TMPL.replace("__TOPK__", "200", 1)
        + ")),"
    )
    rel_cte = f"""rel AS MATERIALIZED (
  SELECT query_id, neighbor_id, rel_u6 FROM (
    SELECT c.query_id, c.neighbor_id,
           {_COS_U6.format(a='nq', b='nb')} AS rel_u6,
           row_number() OVER (PARTITION BY c.query_id
               ORDER BY {_COS_U6.format(a='nq', b='nb')} DESC,
                        c.neighbor_id) AS rn
    FROM cand c
    JOIN nrm nb ON nb.vec_id = c.neighbor_id
    JOIN nrm nq ON nq.vec_id = c.query_id)
  WHERE rn <= {k_ref})"""
    return mmr_rerank_sql(k_ref, k_out, rel_cte=rel_cte, prelude=prelude)


MMR_ANN_RERANK_SQL = mmr_ann_rerank_sql(10, 5)
