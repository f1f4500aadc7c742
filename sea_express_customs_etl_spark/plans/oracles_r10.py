"""Round-10 oracle SQL (DuckDB) — new statistical-family queries.

Conventions: hp_-prefixed CTEs (composition-collision rule), the
lm-family tokenization (lower/trim/split-\\s+/nonempty), u6-rounded
single libm ln calls (the token_entropy license), DECIMAL(38,0)
moment products (zipf_alpha's overflow rule), positive-operand DIV.
"""

from __future__ import annotations

_LTOKS = (
    "list_filter(string_split_regex(trim(lower(text)), '\\s+'),"
    " x -> x != '')"
)

# Heaps/Herdan vocabulary-growth fit (operators/dispersion.py:
# heaps_law_fit): one (ln cum_tokens, ln cum_vocab) point per document
# in (md5(id), id) stream order; first-appearance = (md5, id)-minimum
# occurrence per token; OLS slope in exact integer/decimal arithmetic.
HEAPS_LAW_SQL = f"""
WITH hp_t AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
         unnest({_LTOKS}) AS token
  FROM documents),
hp_d AS (
  SELECT doc_id, h, count(*)::BIGINT AS nt FROM hp_t GROUP BY 1, 2),
hp_f AS (
  SELECT doc_id FROM (
    SELECT token, doc_id,
           row_number() OVER (PARTITION BY token ORDER BY h, doc_id)
               AS rn
    FROM hp_t)
  WHERE rn = 1),
hp_n AS (SELECT doc_id, count(*)::BIGINT AS nn FROM hp_f GROUP BY 1),
hp_c AS (
  SELECT d.doc_id, d.h, d.nt, coalesce(n.nn, 0) AS nn
  FROM hp_d d LEFT JOIN hp_n n USING (doc_id)),
hp_cum AS (
  SELECT sum(nt) OVER w AS ct, sum(nn) OVER w AS cv
  FROM hp_c
  WINDOW w AS (ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING)),
hp_xy AS (
  SELECT CAST(round(ln(ct) * 1000000) AS BIGINT) AS x,
         CAST(round(ln(cv) * 1000000) AS BIGINT) AS y
  FROM hp_cum),
hp_m AS (
  SELECT count(*)::DECIMAL(38,0) AS n,
         sum(x::DECIMAL(38,0)) AS sx,
         sum(y::DECIMAL(38,0)) AS sy,
         sum(x::DECIMAL(38,0) * y) AS sxy,
         sum(x::DECIMAL(38,0) * x) AS sxx
  FROM hp_xy)
SELECT CAST(n AS INTEGER) AS n_points,
       CAST(((n * sxy - sx * sy) * 1000000)
            // (n * sxx - sx * sx) AS BIGINT) AS beta_u6
FROM hp_m
"""
