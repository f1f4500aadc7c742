"""DuckDB oracle SQL for the general relational surface
(``plans/relational.py``). The ``events`` view is nanosecond-timestamp
parquet; DuckDB truncates to microseconds on read, matching the Spark
loader's explicit nanos→micros conversion."""

from __future__ import annotations

EVENTS_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
"""

EVENTS_SESSIONIZE_SQL = """
WITH ordered AS (
  SELECT user_id, ts, event_id,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events),
flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN prev_ts IS NULL
                   OR epoch(ts) - epoch(prev_ts) > 30 * 60
              THEN 1 ELSE 0 END AS is_new
  FROM ordered),
sessions AS (
  SELECT user_id, ts,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS session_id
  FROM flagged)
SELECT user_id, session_id,
       count(*) AS n_events,
       min(ts) AS session_start,
       max(ts) AS session_end
FROM sessions
GROUP BY 1, 2
"""

EVENTS_SESSION_WINDOW_SQL = """
WITH ordered AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events),
flagged AS (
  SELECT user_id, ts,
         CASE WHEN prev_ts IS NULL
                   OR epoch(ts) - epoch(prev_ts) >= 30 * 60
              THEN 1 ELSE 0 END AS is_new
  FROM ordered),
sessions AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) AS last_event,
       count(*) AS n_events
FROM sessions
GROUP BY user_id, sid
"""

PURCHASE_LAST_CLICK_ASOF_SQL = """
WITH tagged AS (
  SELECT user_id, ts, event_id, 1 AS side FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, ts, event_id, 0 AS side FROM events WHERE event_type = 'click'),
carried AS (
  SELECT *,
    last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS) OVER w
        AS asof_event_id,
    last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS) OVER w AS asof_ts
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT user_id, ts, event_id, asof_event_id, asof_ts
FROM carried WHERE side = 1
"""

PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       count(*) AS count_order,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY 1, 2
"""

TOPK_PARTS_PER_BRAND_SQL = """
SELECT p_brand, p_partkey, p_name, p_retailprice, CAST(rk AS INTEGER) AS rk
FROM (SELECT p_brand, p_partkey, p_name, p_retailprice,
             row_number() OVER (PARTITION BY p_brand
                 ORDER BY p_retailprice DESC, p_partkey) AS rk
      FROM part)
WHERE rk <= 3
"""

ROLLUP_ORDER_STATS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS sum_total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""

CUBE_ORDER_STATS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS sum_total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""

CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer
ANTI JOIN orders ON c_custkey = o_custkey
GROUP BY 1
"""

REVENUE_BY_NATION_SQL = """
SELECT r_name, n_name,
       count(*) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1, 2
"""

ORDER_GAPS_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(date_diff('day',
            lag(o_orderdate) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey),
            o_orderdate) AS INTEGER) AS days_since_prev
FROM orders
"""

CUSTOMER_RUNNING_TOTALS_SQL = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
           AS running_total
FROM orders
"""

SHIPPING_PRIORITY_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderdate < DATE '1995-03-15' AND l_shipdate > DATE '1995-03-15'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""

NATION_REVENUE_SHARE_SQL = """
WITH agg AS (
  SELECT n_name, year(o_orderdate) AS order_year,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2)
SELECT n_name, CAST(order_year AS INTEGER) AS order_year, revenue,
       round(revenue / sum(revenue) OVER (PARTITION BY order_year), 4) AS share
FROM agg
"""

LATE_SHIPMENT_PRIORITY_SQL = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY 1
"""

BRAND_SUPPLIER_VARIETY_SQL = """
SELECT p_brand,
       count(DISTINCT l_suppkey) AS n_suppliers,
       count(*) AS n_lineitems
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1
"""

RETURNED_REVENUE_TOPK_SQL = """
SELECT c_custkey, c_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R'
GROUP BY 1, 2
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

JSON_PROPS_ROLLUP_SQL = """
SELECT event_type,
       count(v) AS n_parsed,
       CAST(sum(v) AS BIGINT) AS sum_v,
       round(avg(v), 4) AS avg_v,
       min(v) AS min_v,
       max(v) AS max_v
FROM (SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS v
      FROM events)
GROUP BY event_type
"""

CLICK_PURCHASE_INTERVAL_SQL = """
SELECT p.user_id, p.ts, p.event_id,
       c.ts AS prior_ts, c.event_id AS prior_event_id
FROM events p
JOIN events c
  ON p.user_id = c.user_id
 AND c.ts <= p.ts
 AND c.ts > p.ts - INTERVAL 24 HOUR
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
"""

NATION_YEAR_PIVOT_SQL = """
SELECT n_name,
       round(sum(CASE WHEN y = 1992 THEN rev END), 2) AS y1992,
       round(sum(CASE WHEN y = 1993 THEN rev END), 2) AS y1993,
       round(sum(CASE WHEN y = 1994 THEN rev END), 2) AS y1994,
       round(sum(CASE WHEN y = 1995 THEN rev END), 2) AS y1995,
       round(sum(CASE WHEN y = 1996 THEN rev END), 2) AS y1996,
       round(sum(CASE WHEN y = 1997 THEN rev END), 2) AS y1997,
       round(sum(CASE WHEN y = 1998 THEN rev END), 2) AS y1998
FROM (SELECT n_name,
             year(o_orderdate) AS y,
             l_extendedprice * (1 - l_discount) AS rev
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey)
GROUP BY n_name
"""

ORDER_PRIORITY_UNPIVOT_SQL = """
WITH agg AS (
  SELECT o_orderpriority,
         CAST(count(*) AS DOUBLE) AS n_orders,
         round(sum(o_totalprice), 2) AS sum_total,
         round(avg(o_totalprice), 4) AS avg_total
  FROM orders GROUP BY 1)
SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS value FROM agg
UNION ALL
SELECT o_orderpriority, 'sum_total' AS metric, sum_total AS value FROM agg
UNION ALL
SELECT o_orderpriority, 'avg_total' AS metric, avg_total AS value FROM agg
"""

RETURNFLAG_QTY_PRICE_CORR_SQL = """
WITH comp AS (
  SELECT l_returnflag,
         count(*) AS n_items,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sx2, sum(y * y) AS sy2
  FROM (SELECT l_returnflag,
               CAST(round(l_quantity) AS BIGINT) AS x,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        FROM lineitem)
  GROUP BY 1)
SELECT l_returnflag,
       n_items,
       round((CAST(n_items AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n_items AS DOUBLE) * CAST(sx2 AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n_items AS DOUBLE) * CAST(sy2 AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
             6) AS corr_qty_price
FROM comp
"""

USER_ROLLING_24H_SQL = """
SELECT user_id, event_id,
       count(*) OVER w AS n_24h,
       CAST(sum(CAST(round(value * 1e6) AS BIGINT)) OVER w AS BIGINT)
           AS sum_value_u6
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
"""

# strict-sequence funnel: first view, first click after it, first
# purchase after that; lags as floor-mean microseconds (exact ints)
FUNNEL_CONVERSION_SQL = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t2, min(s1.t1) AS t1
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t3, min(s2.t2) AS t2
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
SELECT 1 AS step_no, 'view' AS step, count(*) AS n_users,
       CAST(NULL AS BIGINT) AS avg_lag_us FROM s1
UNION ALL
SELECT 2, 'click', count(*),
       CAST(floor(sum(epoch_us(t2) - epoch_us(t1)) / count(*)) AS BIGINT)
FROM s2
UNION ALL
SELECT 3, 'purchase', count(*),
       CAST(floor(sum(epoch_us(t3) - epoch_us(t2)) / count(*)) AS BIGINT)
FROM s3
"""

# cohort-retention triangle over first-seen calendar day
COHORT_RETENTION_SQL = """
WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
           FROM events GROUP BY 1),
a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
SELECT f.cohort_day,
       CAST(a.d - f.cohort_day AS INTEGER) AS day_offset,
       count(*) AS n_users
FROM a JOIN f USING (user_id)
GROUP BY 1, 2
"""

# point-in-interval join (operators/asof.py:interval_join): clicks
# inside each user's daily [first error, last error] window — the
# oracle states the naive BETWEEN join the bucket rewrite must equal
CLICKS_IN_ERROR_WINDOW_SQL = """
WITH iv AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         min(ts) AS w_start, max(ts) AS w_end
  FROM events WHERE event_type = 'error' GROUP BY 1, 2),
c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
SELECT iv.user_id, iv.d, count(*) AS n_clicks
FROM iv JOIN c ON c.user_id = iv.user_id
              AND c.ts >= iv.w_start AND c.ts <= iv.w_end
GROUP BY 1, 2
"""

# one-pass column profile (operators/profiling.py:profile_table) over
# orders with price pre-quantized to integer cents (double->string
# formatting is not engine-portable; bigint/date/varchar are)


def _profile_col_sql(col: str) -> str:
    return f"""
SELECT '{col}' AS "column", count(*) AS n_rows,
       CAST(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_nulls,
       count(DISTINCT {col}) AS n_distinct,
       CAST(min({col}) AS VARCHAR) AS lo,
       CAST(max({col}) AS VARCHAR) AS hi
FROM o
"""


TABLE_PROFILE_SQL = (
    """
WITH o AS (
  SELECT o_custkey, o_orderstatus, o_orderpriority, o_orderdate,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_u2
  FROM orders)
"""
    + " UNION ALL ".join(
        _profile_col_sql(c)
        for c in (
            "o_custkey", "o_orderstatus", "o_orderpriority",
            "o_orderdate", "price_u2",
        )
    )
)

# dbt-style constraint counts (profiling.check_constraints): FALSE OR
# NULL counts as a violation
LINEITEM_CONSTRAINTS_SQL = """
WITH w AS (
  SELECT
    count(*) AS n,
    sum(CASE WHEN NOT coalesce(l_quantity BETWEEN 1 AND 50, FALSE)
        THEN 1 ELSE 0 END) AS v0,
    sum(CASE WHEN NOT coalesce(l_shipdate BETWEEN DATE '1992-01-01'
        AND DATE '1998-12-31', FALSE) THEN 1 ELSE 0 END) AS v1,
    sum(CASE WHEN NOT coalesce(l_extendedprice > 0, FALSE)
        THEN 1 ELSE 0 END) AS v2,
    sum(CASE WHEN NOT coalesce(l_tax <= 0.05, FALSE)
        THEN 1 ELSE 0 END) AS v3,
    sum(CASE WHEN NOT coalesce(l_returnflag IN ('A','N','R'), FALSE)
        THEN 1 ELSE 0 END) AS v4
  FROM lineitem)
SELECT r.rule, w.n AS n_rows, CAST(r.v AS BIGINT) AS n_violations,
       r.v = 0 AS pass
FROM w, LATERAL (VALUES
  ('qty_in_1_50', v0), ('shipdate_in_range', v1),
  ('positive_price', v2), ('tax_le_5pct', v3),
  ('returnflag_domain', v4)) r(rule, v)
"""

# latest-by-key compaction (profiling.latest_by_key): greatest
# (ts, event_id) row per user
LATEST_EVENT_PER_USER_SQL = """
SELECT user_id, ts, event_id, event_type,
       CAST(round(value * 1000000) AS BIGINT) AS value_u6
FROM (SELECT *, row_number() OVER (PARTITION BY user_id
          ORDER BY ts DESC, event_id DESC) AS rn FROM events)
WHERE rn = 1
"""

# salted-join parity (operators/skew.py:salted_join): the oracle is
# the PLAIN join -- salting must be invisible in the result
SALTED_JOIN_REVENUE_SQL = """
SELECT o.o_orderpriority, count(*) AS n_items,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS revenue_u2
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY 1
"""

# ANSI distribution windows
EVENT_PERCENT_RANK_SQL = """
SELECT event_id, event_type,
       percent_rank() OVER w AS pr,
       cume_dist() OVER w AS cd
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY value)
"""

# hopping windows (1 h length, 15 min hop): every event is in exactly
# 4 windows -- the oracle states the map-side expansion explicitly
EVENTS_SLIDING_COUNTS_SQL = """
SELECT ((epoch_us(ts) // 900000000) - g.k) * 900 AS ws_s,
       event_type, count(*) AS n_events,
       CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
           AS sum_value_u6
FROM events, generate_series(0, 3) g(k)
GROUP BY 1, 2
"""

# incremental aggregate-state merge (profiling.merge_agg_states): the
# oracle is the FULL-scan aggregate the merged shard states must equal
INCREMENTAL_AGG_MERGE_SQL = """
SELECT o_custkey, count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_u2,
       min(CAST(round(o_totalprice * 100) AS BIGINT)) AS min_u2,
       max(CAST(round(o_totalprice * 100) AS BIGINT)) AS max_u2
FROM orders GROUP BY 1
"""

# join-key skew diagnostics: top-20 hottest keys with exact ppm share
KEY_SKEW_STATS_SQL = """
WITH c AS (SELECT l_partkey, count(*) AS n_rows FROM lineitem GROUP BY 1),
t AS (SELECT sum(n_rows) AS t FROM c)
SELECT l_partkey, n_rows,
       CAST(n_rows * 1000000 // t.t AS BIGINT) AS share_ppm
FROM c, t
ORDER BY n_rows DESC, l_partkey
LIMIT 20
"""

# registered Python UDTF (functions/udtfs.py:ParseProps) -- DuckDB
# replays the lateral explode with json_keys + per-key extraction
# (this build has no json_each table function). The UDTF skips
# non-integer and boolean values per-row, so the oracle mirrors that
# with a json_type filter rather than relying on an all-int data
# invariant (ADVICE r4): BIGINT/UBIGINT are DuckDB's JSON int types.
PROPS_KV_UDTF_SQL = """
SELECT event_id, k AS prop_key,
       CAST(json_extract(props, '$.' || k) AS BIGINT) AS prop_value
FROM (SELECT event_id, props, unnest(json_keys(props)) AS k
      FROM events WHERE event_id % 10 = 0)
WHERE json_type(props, '$.' || k) IN ('BIGINT', 'UBIGINT')
"""

# custom grouping sets ((status),(priority)) — grouping_id per row.
# DuckDB's GROUPING(a, b) bitmask matches Spark's grouping_id order.
GROUPING_SETS_ORDER_STATS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS INTEGER) AS gid,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_u2
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
"""


def _profile_col_from(col: str, src: str) -> str:
    return f"""
SELECT '{col}' AS "column", count(*) AS n_rows,
       CAST(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_nulls,
       count(DISTINCT {col}) AS n_distinct,
       CAST(min({col}) AS VARCHAR) AS lo,
       CAST(max({col}) AS VARCHAR) AS hi
FROM {src}
"""


_DRIFT_COLS = ("o_custkey", "o_orderstatus", "o_orderpriority", "price_u2")

# profile drift (operators/profiling.py:profile_drift over
# profile_table ×2): pre-1999 vs 1999+ order snapshots — per column,
# exact null ppm both sides (guarded //), NDV delta, min/max envelope
# movement via IS DISTINCT FROM (Spark's <=> negated).
ORDERS_PROFILE_DRIFT_SQL = (
    """
WITH o_all AS (
  SELECT o_custkey, o_orderstatus, o_orderpriority, o_orderdate,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_u2
  FROM orders),
o_old AS (SELECT * FROM o_all WHERE year(o_orderdate) < 1999),
o_new AS (SELECT * FROM o_all WHERE year(o_orderdate) >= 1999),
po AS ("""
    + " UNION ALL ".join(_profile_col_from(c, "o_old") for c in _DRIFT_COLS)
    + """),
pn AS ("""
    + " UNION ALL ".join(_profile_col_from(c, "o_new") for c in _DRIFT_COLS)
    + """)
SELECT po."column",
       CAST(po.n_rows AS BIGINT) AS n_rows_old,
       CAST(pn.n_rows AS BIGINT) AS n_rows_new,
       CAST(CASE WHEN po.n_rows = 0 THEN 0
            ELSE (1000000 * po.n_nulls) // po.n_rows END AS BIGINT)
           AS null_ppm_old,
       CAST(CASE WHEN pn.n_rows = 0 THEN 0
            ELSE (1000000 * pn.n_nulls) // pn.n_rows END AS BIGINT)
           AS null_ppm_new,
       CAST(pn.n_distinct - po.n_distinct AS BIGINT) AS ndv_delta,
       (po.lo IS DISTINCT FROM pn.lo) AS lo_changed,
       (po.hi IS DISTINCT FROM pn.hi) AS hi_changed
FROM po JOIN pn ON po."column" = pn."column"
"""
)

# 3-step path mining (operators/markov.py:path_counts): two leads over
# the per-user (ts, event_id) order, triple counts, top-20 by
# (n DESC, s1, s2, s3).
EVENT_TRIGRAM_PATHS_SQL = """
WITH s AS (
  SELECT event_type AS s1,
         lead(event_type, 1) OVER w AS s2,
         lead(event_type, 2) OVER w AS s3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
c AS (SELECT s1, s2, s3, count(*)::BIGINT AS n
      FROM s WHERE s3 IS NOT NULL GROUP BY 1, 2, 3)
SELECT s1, s2, s3, n FROM c ORDER BY n DESC, s1, s2, s3 LIMIT 20
"""


# Q17 shape decorrelated (plans/relational.py:small_qty_revenue):
# threshold cleared by cross-multiplication, no float average.
SMALL_QTY_REVENUE_SQL = """
WITH li AS (
  SELECT l_partkey, CAST(round(l_quantity) AS BIGINT) AS qty,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
  FROM lineitem),
stats AS (
  SELECT l_partkey, count(*)::BIGINT AS n, sum(qty)::BIGINT AS sq
  FROM li GROUP BY 1)
SELECT p.p_brand, count(*)::BIGINT AS n_small_lines,
       sum(l.price_c)::BIGINT AS revenue_cents
FROM li l
JOIN stats s USING (l_partkey)
JOIN part p ON p.p_partkey = l.l_partkey
WHERE 5 * l.qty * s.n < s.sq
GROUP BY 1
"""

# cohort LTV (plans/relational.py:cohort_ltv_curve): integer month
# indexes, exact cents, per-cohort cumulative window at bucket grain.
COHORT_LTV_CURVE_SQL = """
WITH o AS (
  SELECT o_custkey,
         year(o_orderdate) * 12 + month(o_orderdate) - 1 AS mi,
         CAST(round(o_totalprice * 100) AS BIGINT) AS rev
  FROM orders),
fst AS (SELECT o_custkey, min(mi) AS m0 FROM o GROUP BY 1),
cells AS (
  SELECT f.m0 AS cm, o.mi - f.m0 AS offset_months,
         count(*)::BIGINT AS n_orders, sum(o.rev)::BIGINT AS rev_cents
  FROM o JOIN fst f USING (o_custkey)
  GROUP BY 1, 2)
SELECT CAST((cm // 12) * 100 + (cm % 12 + 1) AS INTEGER) AS cohort_month,
       CAST(offset_months AS INTEGER) AS offset_months,
       n_orders, rev_cents,
       CAST(sum(rev_cents) OVER (PARTITION BY cm ORDER BY offset_months
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_rev_cents
FROM cells
"""

# month-over-month revenue per nation (plans/relational.py:
# nation_revenue_mom): bucket-grain lag, signed delta, ppm ratio.
NATION_REVENUE_MOM_SQL = """
WITH o AS (
  SELECT o_custkey,
         year(o_orderdate) * 100 + month(o_orderdate) AS om,
         CAST(round(o_totalprice * 100) AS BIGINT) AS rev
  FROM orders),
monthly AS (
  SELECT n.n_name, o.om, sum(o.rev)::BIGINT AS rev_cents
  FROM o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2),
lagged AS (
  SELECT n_name, om, rev_cents,
         lag(rev_cents) OVER (PARTITION BY n_name ORDER BY om)
             AS prev_cents
  FROM monthly)
SELECT n_name, CAST(om AS INTEGER) AS order_month, rev_cents, prev_cents,
       rev_cents - prev_cents AS delta_cents,
       CASE WHEN prev_cents > 0
            THEN CAST((1000000 * rev_cents) // prev_cents AS BIGINT)
       END AS ratio_ppm
FROM lagged
"""

# EXISTS decorrelation (plans/relational.py:
# priority_return_exists_counts): Q4 shape on available columns.
PRIORITY_RETURN_EXISTS_SQL = """
WITH tot AS (
  SELECT o_orderpriority, count(*)::BIGINT AS n_orders
  FROM orders GROUP BY 1),
ret AS (
  SELECT o_orderpriority, count(*)::BIGINT AS n_with_return
  FROM orders o
  WHERE EXISTS (SELECT 1 FROM lineitem l
                WHERE l.l_orderkey = o.o_orderkey
                  AND l.l_returnflag = 'R')
  GROUP BY 1)
SELECT t.o_orderpriority, t.n_orders,
       coalesce(r.n_with_return, 0)::BIGINT AS n_with_return,
       CAST((1000000 * coalesce(r.n_with_return, 0)) // t.n_orders
            AS BIGINT) AS share_ppm
FROM tot t LEFT JOIN ret r USING (o_orderpriority)
"""


# Q6 shape (plans/relational.py:discount_revenue_q6): integer
# cents x permille promo revenue, one filtered scan.
DISCOUNT_REVENUE_Q6_SQL = """
SELECT count(*)::BIGINT AS n_lines,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * CAST(round(l_discount * 1000) AS BIGINT))
            AS BIGINT) AS promo_revenue_u5
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND CAST(round(l_discount * 1000) AS BIGINT) BETWEEN 50 AND 70
  AND l_quantity < 24
"""

# Q7 shape (plans/relational.py:nation_trade_flows): snowflake
# multi-way join, cross-border flows, exact cents.
NATION_TRADE_FLOWS_SQL = """
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
       sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))::BIGINT
           AS revenue_cents,
       count(*)::BIGINT AS n_lines
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation ns ON ns.n_nationkey = s.s_nationkey
JOIN nation nc ON nc.n_nationkey = c.c_nationkey
WHERE ns.n_name <> nc.n_name
GROUP BY 1, 2, 3
"""


# Q13 shape (plans/relational.py:customer_order_custdist): left-join
# double aggregation including the zero bucket.
CUSTOMER_ORDER_CUSTDIST_SQL = """
SELECT c_count, count(*)::BIGINT AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey)::BIGINT AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
GROUP BY c_count
"""

# Q18 shape (plans/relational.py:large_order_customers): HAVING-
# filtered aggregate then join back.
LARGE_ORDER_CUSTOMERS_SQL = """
WITH big AS (
  SELECT l_orderkey, sum(CAST(l_quantity AS BIGINT))::BIGINT AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS BIGINT)) > 200
)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
       CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_price_cents,
       b.sum_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
"""

# Q19 shape (plans/relational.py:brand_size_qty_revenue): disjunctive
# predicate over the part x lineitem join, integer units.
BRAND_SIZE_QTY_REVENUE_SQL = """
SELECT count(*)::BIGINT AS n_lines,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (1000 - CAST(round(l.l_discount * 1000) AS BIGINT)))
            AS BIGINT) AS disc_revenue_u5
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 1 AND 15)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 20
       AND l.l_quantity BETWEEN 10 AND 25)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 30
       AND l.l_quantity BETWEEN 20 AND 35)
"""
