"""DuckDB oracle SQL for the wave-AB queries (business-day SLA,
memorization/novelty scoring, EWMA smoothing). Usual portability
rules; the weekday prefix-count and the EWMA lag polynomial are
generated from one template so the two engines share the formula by
construction.
"""

from __future__ import annotations

from sea_express_customs_etl_spark.operators.sampling import hex_threshold


def _w(col: str) -> str:
    """Weekdays in [1969-12-29, col) — the calendar.py closed form."""
    dm = f"(date_diff('day', DATE '1970-01-01', CAST({col} AS DATE)) + 3)"
    return f"(5 * ({dm} // 7) + least({dm} % 7, 5))"


PRIORITY_SHIP_BIZDAYS_SQL = f"""
WITH j AS (
  SELECT o.o_orderpriority,
         {_w('l.l_shipdate')} - {_w('o.o_orderdate')} AS bd
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
SELECT o_orderpriority,
       count(*)::BIGINT AS n_lineitems,
       sum(bd)::BIGINT AS sum_bizdays,
       max(bd)::BIGINT AS max_bizdays
FROM j GROUP BY 1
"""


_SH3 = (
    "unnest(list_transform(range(1, len(toks) - 1), "
    "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle"
)

# memorization_scores (operators/memorization.py): md5 70/30 split,
# 3-gram shingles (the MinHash-family tokenizer: trim, \\s+ split, NOT
# lowered), train collapsed to a distinct dictionary.
MEMORIZATION_SCORES_SQL = rf"""
WITH sp AS (
  SELECT doc_id, text,
         CASE WHEN substring(md5('memo' || CAST(doc_id AS VARCHAR)), 1, 8)
                   < '{hex_threshold(0.7)}'
              THEN 'train' ELSE 'eval' END AS split
  FROM documents),
tr AS (
  SELECT DISTINCT shingle FROM (
    SELECT {_SH3}
    FROM (SELECT regexp_split_to_array(trim(text), '\s+') AS toks
          FROM sp WHERE split = 'train')
    WHERE len(toks) >= 3)),
ev AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, {_SH3}
    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
          FROM sp WHERE split = 'eval')
    WHERE len(toks) >= 3)),
m AS (
  SELECT e.doc_id, count(*)::BIGINT AS n_shingles,
         sum(CASE WHEN t.shingle IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_seen
  FROM ev e LEFT JOIN tr t USING (shingle) GROUP BY 1)
SELECT doc_id, n_shingles, n_seen,
       ((1000000 * (n_shingles - n_seen)) // n_shingles)::BIGINT
           AS novelty_ppm
FROM m
"""


def _ewma_terms(lags: int) -> tuple[str, str]:
    num = " + ".join(
        f"coalesce(lag(v, {k}) OVER wh, 0) * {1 << (lags - 1 - k)}"
        for k in range(lags)
    )
    den = " + ".join(
        f"(CASE WHEN lag(v, {k}) OVER wh IS NULL THEN 0 "
        f"ELSE {1 << (lags - 1 - k)} END)"
        for k in range(lags)
    )
    return num, den


_EWMA_NUM, _EWMA_DEN = _ewma_terms(16)

# ewma_hourly (operators/timeseries.py): α = 1/2 over the ROW series
# of nonempty hours, truncated at 16 lags — weights 2^(15-k), exact
# integers end-to-end (num ≤ Σ v·2^15 ≪ 2^63).
EVENT_EWMA_HOURLY_SQL = f"""
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS hour_id,
         sum(CAST(round(value * 1000000) AS BIGINT)) AS v
  FROM events GROUP BY 1, 2),
sm AS (
  SELECT event_type, hour_id, v,
         ({_EWMA_NUM}) AS num,
         ({_EWMA_DEN}) AS den
  FROM hourly
  WINDOW wh AS (PARTITION BY event_type ORDER BY hour_id))
SELECT event_type, hour_id, CAST(v AS BIGINT) AS sum_value_u6,
       CAST(num // den AS BIGINT) AS ewma_u6
FROM sm
"""

# group_reservoir_sample (operators/sampling.py): min-k md5 order per
# group, k = 7 — the same _hash_prefix recipe as hash_sample.
GROUP_RESERVOIR_SAMPLE_SQL = """
WITH h AS (
  SELECT event_type, event_id,
         substring(md5('res|' || CAST(event_id AS VARCHAR)), 1, 8) AS hx
  FROM events),
r AS (
  SELECT event_type, event_id,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY hx, event_id) AS sample_rank
  FROM h)
SELECT event_type, event_id, sample_rank::BIGINT AS sample_rank
FROM r WHERE sample_rank <= 7
"""

# exact_group_median (operators/quantiles.py): lower median picked at
# rank (n-1)//2 within the (value, id) total order per group.
EXACT_GROUP_MEDIAN_SQL = """
WITH vals AS (
  SELECT event_type AS g,
         CAST(round(value * 1000000) AS BIGINT) AS v,
         event_id AS id
  FROM events),
r AS (
  SELECT g, v,
         row_number() OVER (PARTITION BY g ORDER BY v, id) AS rn,
         count(*) OVER (PARTITION BY g) AS n
  FROM vals)
SELECT g AS event_type, n::BIGINT AS n_rows, v AS median_value
FROM r WHERE rn = 1 + (n - 1) // 2
"""
