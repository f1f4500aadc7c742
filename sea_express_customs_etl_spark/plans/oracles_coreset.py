"""DuckDB oracle for facility-location greedy coreset selection
(``operators/coreset.py``) — the k greedy steps unrolled into chained
gain/winner/cover CTEs. Similarities are micro-unit integers clamped
at ≥ 0, so every marginal-gain sum, argmax, and (gain DESC, id ASC)
tie-break is exact on both engines.
"""

from __future__ import annotations


def facility_select_sql(pool_max_id: int = 32, k: int = 4) -> str:
    parts = []
    for i in range(1, k + 1):
        if i == 1:
            prev_excl = ""
        else:
            uni = " UNION ALL ".join(
                f"SELECT _c FROM w{x}" for x in range(1, i)
            )
            prev_excl = f"\n  WHERE s._c NOT IN ({uni})"
        parts.append(
            f""",
g{i} AS MATERIALIZED (
  SELECT s._c, CAST(sum(greatest(0, s._s - c._cov)) AS BIGINT)
             AS gain_u6
  FROM sims s JOIN cov{i - 1} c ON c._p = s._p{prev_excl}
  GROUP BY 1),
w{i} AS MATERIALIZED (
  SELECT CAST({i} AS INTEGER) AS sel_rank, _c, gain_u6
  FROM (SELECT *, row_number() OVER (ORDER BY gain_u6 DESC, _c) AS rn
        FROM g{i})
  WHERE rn = 1),
cov{i} AS MATERIALIZED (
  SELECT c._p,
         greatest(c._cov, coalesce(s._s, 0)) AS _cov
  FROM cov{i - 1} c
  LEFT JOIN (SELECT _p, _s FROM sims JOIN w{i} USING (_c)) s
    ON s._p = c._p)"""
        )
    final_union = "\n  UNION ALL ".join(
        f"SELECT sel_rank, _c, gain_u6 FROM w{i}" for i in range(1, k + 1)
    )
    return (
        f"""
WITH nrm AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                 CAST(embedding AS DOUBLE[]))) AS n
  FROM embeddings),
cands AS (SELECT vec_id AS _c, v AS cv, n AS cn FROM nrm
          WHERE vec_id < {pool_max_id}),
sims AS MATERIALIZED (
  SELECT p.vec_id AS _p, c._c,
         greatest(0, CAST(round(1000000 * list_inner_product(p.v, c.cv)
                                / (p.n * c.cn)) AS BIGINT)) AS _s
  FROM nrm p, cands c),
cov0 AS MATERIALIZED (
  SELECT vec_id AS _p, CAST(0 AS BIGINT) AS _cov FROM nrm)"""
        + "".join(parts)
        + f"""
SELECT sel_rank, _c AS vec_id, gain_u6 FROM ({final_union})
"""
    )


FACILITY_CORESET_SQL = facility_select_sql(32, 4)
