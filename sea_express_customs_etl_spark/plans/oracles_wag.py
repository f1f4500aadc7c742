"""DuckDB oracle SQL for the wave-AG queries (schema-evolution scan,
per-token co-occurrence neighbors)."""

from __future__ import annotations

# schema_evolution_scan: v1 batch (even orderkeys) lacks the priority
# column, v2 carries it; the mergeSchema read must surface v1 rows
# with NULL priority and leave every value intact.
SCHEMA_EVOLUTION_SCAN_SQL = """
SELECT CASE WHEN o_orderkey % 2 = 0 THEN NULL
            ELSE o_orderpriority END AS o_orderpriority,
       count(*)::BIGINT AS n_orders,
       sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT
           AS sum_price_c
FROM orders
GROUP BY 1
"""

# token_neighbors_topk: same tokenizer + adjacency as TextRank's edge
# list; top-3 neighbors per source token by (count DESC, dst).
TOKEN_NEIGHBORS_TOPK_SQL = r"""
WITH toks AS (
  SELECT doc_id, tok, i FROM (
    SELECT doc_id, unnest(arr) AS tok,
           unnest(range(1, len(arr) + 1)) AS i
    FROM (SELECT doc_id,
                 regexp_split_to_array(trim(lower(text)), '\s+') AS arr
          FROM documents))
  WHERE tok <> ''),
pairs AS (
  SELECT a.tok AS wa, b.tok AS wb
  FROM toks a
  JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
  WHERE a.tok <> b.tok),
ew AS (
  SELECT src, dst, count(*)::BIGINT AS w
  FROM (SELECT wa AS src, wb AS dst FROM pairs
        UNION ALL SELECT wb, wa FROM pairs) u
  GROUP BY 1, 2),
r AS (
  SELECT src, dst, w,
         row_number() OVER (PARTITION BY src
             ORDER BY w DESC, dst) AS rank
  FROM ew)
SELECT src, dst, w, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 3
"""

# events_dow_hour_heatmap: weekday from epoch days + Monday anchor —
# the calendar.py arithmetic, no engine dow() trusted.
EVENTS_DOW_HOUR_HEATMAP_SQL = """
SELECT ((epoch_us(ts) // 86400000000) + 3) % 7 AS dow,
       (epoch_us(ts) // 3600000000) % 24 AS hour,
       count(*)::BIGINT AS n_events,
       sum(CAST(round(value * 1000000) AS BIGINT))::BIGINT
           AS sum_value_u6
FROM events GROUP BY 1, 2
"""

# event_value_digit_hist: decimal digit count of the nonnegative
# micro-unit BIGINT — identical text rendering on both engines.
EVENT_VALUE_DIGIT_HIST_SQL = """
SELECT event_type,
       length(CAST(CAST(round(value * 1000000) AS BIGINT) AS VARCHAR))
           ::BIGINT AS n_digits,
       count(*)::BIGINT AS n_events
FROM events GROUP BY 1, 2
"""
