"""DuckDB oracle for facility-location greedy coreset selection
(``operators/coreset.py``) — the k greedy steps unrolled into chained
gain/winner/cover CTEs. Similarities are micro-unit integers clamped
at ≥ 0, so every marginal-gain sum, argmax, and (gain DESC, id ASC)
tie-break is exact on both engines.
"""

from __future__ import annotations


def facility_select_sql(
    pool_max_id: int = 32,
    k: int = 4,
    prelude: str = "",
    sims_block: str | None = None,
) -> str:
    """``sims_block`` overrides the candidate/fl_sims/fl_cov0 CTE trio (must
    define ``fl_sims(_p, _c, _s)`` and ``fl_cov0(_p, _cov)``); default is the
    exact corpus × pool cross product. ``prelude`` injects CTEs before
    ``nrm`` (the ANN-fed variant's trained-index candidate set — the
    mmr_rerank_sql composition pattern)."""
    parts = []
    for i in range(1, k + 1):
        if i == 1:
            prev_excl = ""
        else:
            uni = " UNION ALL ".join(
                f"SELECT _c FROM fl_w{x}" for x in range(1, i)
            )
            prev_excl = f"\n  WHERE s._c NOT IN ({uni})"
        parts.append(
            f""",
fl_g{i} AS MATERIALIZED (
  SELECT s._c, CAST(sum(greatest(0, s._s - c._cov)) AS BIGINT)
             AS gain_u6
  FROM fl_sims s JOIN fl_cov{i - 1} c ON c._p = s._p{prev_excl}
  GROUP BY 1),
fl_w{i} AS MATERIALIZED (
  SELECT CAST({i} AS INTEGER) AS sel_rank, _c, gain_u6
  FROM (SELECT *, row_number() OVER (ORDER BY gain_u6 DESC, _c) AS rn
        FROM fl_g{i})
  WHERE rn = 1),
fl_cov{i} AS MATERIALIZED (
  SELECT c._p,
         greatest(c._cov, coalesce(s._s, 0)) AS _cov
  FROM fl_cov{i - 1} c
  LEFT JOIN (SELECT _p, _s FROM fl_sims JOIN fl_w{i} USING (_c)) s
    ON s._p = c._p)"""
        )
    final_union = "\n  UNION ALL ".join(
        f"SELECT sel_rank, _c, gain_u6 FROM fl_w{i}" for i in range(1, k + 1)
    )
    if sims_block is None:
        sims_block = f"""cands AS (SELECT vec_id AS _c, v AS cv, n AS cn FROM nrm
          WHERE vec_id < {pool_max_id}),
fl_sims AS MATERIALIZED (
  SELECT p.vec_id AS _p, c._c,
         greatest(0, CAST(round(1000000 * list_inner_product(p.v, c.cv)
                                / (p.n * c.cn)) AS BIGINT)) AS _s
  FROM nrm p, cands c),
fl_cov0 AS MATERIALIZED (
  SELECT vec_id AS _p, CAST(0 AS BIGINT) AS _cov FROM nrm)"""
    return (
        f"""
WITH {prelude}nrm AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                 CAST(embedding AS DOUBLE[]))) AS n
  FROM embeddings),
{sims_block}"""
        + "".join(parts)
        + f"""
SELECT sel_rank, _c AS vec_id, gain_u6 FROM ({final_union})
"""
    )


FACILITY_CORESET_SQL = facility_select_sql(32, 4)


def facility_ann_select_sql(
    pool_max_id: int = 32, k: int = 4, n_cand: int = 200
) -> str:
    """ANN-fed facility location (VERDICT r8 #6): the candidate pool's
    pool × corpus similarities come from the trained store's ADC
    top-``n_cand`` per pool member (≡ the one-shot trained index by
    the store's per-row-encode invariant — the mmr_ann_rerank
    composition), exact-refined to clamped micro-unit cosine on the
    TOUCHED pairs only; untouched pairs contribute 0 coverage. The
    greedy trajectory then unrolls over the sparse table with cover
    state restricted to touched points. Self-pairs are excluded by the
    index (the documented store-search convention)."""
    from sea_express_customs_etl_spark.plans.oracles_ext import (
        _IVFPQ_TRAINED_TMPL,
    )

    q_cte = "q AS (SELECT vec_id AS query_id, v FROM base WHERE vec_id < 10)"
    assert q_cte in _IVFPQ_TRAINED_TMPL, "IVFPQ template drifted"
    tmpl = _IVFPQ_TRAINED_TMPL.replace("__TOPK__", str(n_cand), 1).replace(
        q_cte,
        "q AS (SELECT vec_id AS query_id, v FROM base"
        f" WHERE vec_id < {pool_max_id})",
        1,
    )
    prelude = (
        "cand AS (\n  SELECT query_id, neighbor_id FROM ("
        + tmpl
        + ")),\n"
    )
    sims_block = """fl_sims AS MATERIALIZED (
  SELECT c.neighbor_id AS _p, c.query_id AS _c,
         greatest(0, CAST(round(1000000 * list_inner_product(p.v, q.v)
                                / (p.n * q.n)) AS BIGINT)) AS _s
  FROM cand c
  JOIN nrm p ON p.vec_id = c.neighbor_id
  JOIN nrm q ON q.vec_id = c.query_id),
fl_cov0 AS MATERIALIZED (
  SELECT DISTINCT neighbor_id AS _p, CAST(0 AS BIGINT) AS _cov
  FROM cand)"""
    return facility_select_sql(
        pool_max_id, k, prelude=prelude, sims_block=sims_block
    )


FACILITY_ANN_CORESET_SQL = facility_ann_select_sql(32, 4, 200)
