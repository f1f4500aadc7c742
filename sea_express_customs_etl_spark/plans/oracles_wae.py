"""DuckDB oracle SQL for the wave-AE queries (time-decay attribution,
exact trimmed aggregates)."""

from __future__ import annotations

# time_decay_attribution (operators/attribution.py): same 24 h pair
# table as the linear/U-shaped models (strict lower bound, inclusive
# upper); half-life 6 h in 4 buckets → power-of-two weights {8,4,2,1};
# base share (value·w) DIV W, remainder to the MOST RECENT touch.
TIME_DECAY_ATTRIBUTION_SQL = """
WITH p AS (
  SELECT user_id, ts, event_id,
         CAST(round(value * 1000000) AS BIGINT) AS value_u6
  FROM events WHERE event_type = 'purchase'),
c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
pairs AS (
  SELECT p.user_id, p.ts, p.event_id, p.value_u6,
         c.ts AS prior_ts, c.event_id AS prior_event_id
  FROM p JOIN c ON c.user_id = p.user_id
               AND c.ts <= p.ts AND c.ts > p.ts - INTERVAL 24 HOUR),
wt AS (
  SELECT *,
         (epoch_us(ts) - epoch_us(prior_ts)) // 21600000000 AS decay_bucket
  FROM pairs),
ww AS (
  SELECT *,
         CASE decay_bucket WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2
              ELSE 1 END AS w
  FROM wt),
agg AS (
  SELECT *,
         sum(w) OVER (PARTITION BY event_id) AS wtot,
         count(*) OVER (PARTITION BY event_id) AS n,
         row_number() OVER (PARTITION BY event_id
             ORDER BY prior_ts DESC, prior_event_id DESC) AS rn_recent
  FROM ww),
base AS (
  SELECT *,
         (value_u6 * w) // wtot AS share0,
         sum((value_u6 * w) // wtot) OVER (PARTITION BY event_id)
             AS floor_total
  FROM agg)
SELECT user_id, event_id, prior_event_id,
       CAST(decay_bucket AS BIGINT) AS decay_bucket,
       CAST(n AS BIGINT) AS n_touches,
       CAST(share0 + CASE WHEN rn_recent = 1
                          THEN value_u6 - floor_total ELSE 0 END
            AS BIGINT) AS share_u6
FROM base
"""

# trimmed_sums (operators/quantiles.py): drop the exact bottom and top
# n DIV 10 ranks per group under the (value, id) total order; the
# surviving sum is aggregation-order-exact.
EVENT_TRIMMED_SUMS_SQL = """
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
SELECT g AS event_type,
       max(n)::BIGINT AS n_rows,
       count(*)::BIGINT AS n_kept,
       sum(v)::BIGINT AS sum_kept_u6
FROM r
WHERE rn > n // 10 AND rn <= n - n // 10
GROUP BY 1
"""
