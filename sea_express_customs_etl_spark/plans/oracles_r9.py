"""Round-9 DuckDB oracles: sketch-store takedown rebuild, retrieval
ranking eval (nDCG), and the ANN-fed coreset sibling.

Conventions (CLAUDE.md): md5-derived hashes only, integer/ppm outputs,
deterministic tie-breaks, no float aggregation in hash-checked
columns.
"""

from __future__ import annotations

# first 48 bits of md5(v) as a non-negative BIGINT — bit-identical to
# operators/sketches._h48 (the HLL_TOKENS_SQL literal)
_H48 = "('0x' || substring(md5({v}), 1, 12))::BIGINT"

# Sketch-store takedown (VERDICT r8 #3): the oracle is a FRESH BUILD
# over the survivors — exactly the claim rebuild_sketch_store makes
# (max-merge is not invertible, so delete = rebuild; the rebuilt
# store's merged read must equal a from-scratch pass with the deleted
# users never present). HLL register derivation mirrors
# operators/sketches.hll_registers; histogram bins mirror
# operators/quantiles.value_histogram (centi-unit floor).
SKETCH_REBUILD_SURVIVORS_SQL = f"""
WITH surv AS (
  SELECT user_id, event_type, value
  FROM events WHERE user_id % 13 <> 5),
h AS (SELECT {_H48.format(v='CAST(user_id AS VARCHAR)')} AS h48
      FROM surv),
r AS (SELECT (h48 % 256)::INTEGER AS bucket, h48 // 256 AS w FROM h),
hll AS (
  SELECT 'hll' AS kind,
         CAST(NULL AS VARCHAR) AS event_type,
         CAST(bucket AS BIGINT) AS reg_or_bin,
         CAST(max(CASE WHEN w = 0 THEN 41
                       ELSE 41 - length(ltrim(bin(w), '0')) END)
              AS BIGINT) AS state_val
  FROM r GROUP BY bucket),
hist AS (
  SELECT 'hist' AS kind, event_type,
         CAST(floor(value * 100) AS BIGINT) AS reg_or_bin,
         CAST(count(*) AS BIGINT) AS state_val
  FROM surv GROUP BY 1, 2, 3)
SELECT * FROM hll UNION ALL SELECT * FROM hist
"""


def retrieval_ndcg_sql(
    queries: tuple[tuple[str, tuple[str, ...]], ...],
    disc_ppm: tuple[int, ...],
    k: int = 10,
    per_ranker_k: int = 20,
    c: int = 60,
) -> str:
    """nDCG@k oracle (operators/retrieval_eval.py): both system
    rankings restated from the shared BM25 CTE body (bm25 top-k and
    the RRF fusion exactly as bm25_sql/rrf_sql state them), graded
    truth = 2^(distinct query terms) − 1, discount table = the SAME
    fixed ppm literals the Spark plan embeds. All-new CTE names are
    n-prefixed (the wordpiece shared-fragment collision rule)."""
    from sea_express_customs_etl_spark.plans.oracles_ext import (
        _bm25_cte_body,
    )

    disc_vals = ", ".join(
        f"({i + 1}, {d})" for i, d in enumerate(disc_ppm)
    )
    return f"""
WITH {_bm25_cte_body(queries)},
ndisc(rank, ppm) AS (SELECT * FROM (VALUES {disc_vals})),
ncov AS (
  SELECT qt.query_id, tf.doc_id, count(DISTINCT tf.term)::BIGINT AS nq
  FROM tf JOIN qt USING (term) GROUP BY 1, 2),
ngr AS (
  SELECT query_id, doc_id, ((1 << nq) - 1)::BIGINT AS gain FROM ncov),
nsys1 AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
             ORDER BY score_u6 DESC, doc_id) AS rank
  FROM sc QUALIFY rank <= {k}),
nr1 AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
             ORDER BY score_u6 DESC, doc_id) AS rank
  FROM sc QUALIFY rank <= {per_ranker_k}),
nr2 AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
             ORDER BY nq DESC, doc_id) AS rank
  FROM ncov QUALIFY rank <= {per_ranker_k}),
nu AS (SELECT * FROM nr1 UNION ALL SELECT * FROM nr2),
nf AS (
  SELECT query_id, doc_id,
         sum(1000000 // ({c} + rank))::BIGINT AS rrf_u6
  FROM nu GROUP BY 1, 2),
nsys2 AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
             ORDER BY rrf_u6 DESC, doc_id) AS rank
  FROM nf QUALIFY rank <= {k}),
nsys AS (
  SELECT 'bm25' AS ranker, * FROM nsys1
  UNION ALL SELECT 'rrf' AS ranker, * FROM nsys2),
ndcg_t AS (
  SELECT ranker, s.query_id,
         sum(coalesce(g.gain, 0) * d.ppm)::BIGINT AS dcg_ppm
  FROM nsys s
  JOIN ndisc d USING (rank)
  LEFT JOIN ngr g ON s.query_id = g.query_id AND s.doc_id = g.doc_id
  GROUP BY 1, 2),
nideal AS (
  SELECT query_id, sum(gain * d.ppm)::BIGINT AS idcg_ppm
  FROM (SELECT query_id, gain,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY gain DESC, doc_id) AS rank
        FROM ngr QUALIFY rank <= {k}) i
  JOIN ndisc d USING (rank)
  GROUP BY 1)
SELECT ranker, query_id, dcg_ppm, idcg_ppm,
       ((1000000 * dcg_ppm) // idcg_ppm)::BIGINT AS ndcg_u6
FROM ndcg_t JOIN nideal USING (query_id)
"""
