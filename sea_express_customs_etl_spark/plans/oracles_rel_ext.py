"""DuckDB oracle SQL for plans/relational_ext.py (Q2/Q21/Q22 shapes).

Written as the textbook correlated forms (EXISTS / NOT EXISTS / scalar
subquery) so the decorrelated Spark plans are checked against an
INDEPENDENT formulation, not a transliteration.
"""

# Q21 shape (relational_ext.py:late_supplier_blame): exists +
# not-exists double correlation at distinct (order, supplier) grain.
LATE_SUPPLIER_BLAME_SQL = """
WITH pairs AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                                 CAST(l_shipdate AS DATE)) > 60
                  THEN 1 ELSE 0 END) = 1 AS late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY 1, 2
)
SELECT s.s_name, count(*)::BIGINT AS numwait
FROM pairs p1 JOIN supplier s ON s.s_suppkey = p1.l_suppkey
WHERE p1.late
  AND EXISTS (SELECT 1 FROM pairs p2
              WHERE p2.l_orderkey = p1.l_orderkey
                AND p2.l_suppkey <> p1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM pairs p3
                  WHERE p3.l_orderkey = p1.l_orderkey
                    AND p3.l_suppkey <> p1.l_suppkey AND p3.late)
GROUP BY 1
"""

# Q22 shape (relational_ext.py:idle_rich_customers): scalar avg via
# integer cross-multiply, anti join as NOT EXISTS.
IDLE_RICH_CUSTOMERS_SQL = """
WITH c AS (
  SELECT c_custkey, c_mktsegment AS segment,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
  FROM customer
  WHERE c_mktsegment IN ('AUTOMOBILE', 'MACHINERY', 'FURNITURE')
), a AS (
  SELECT sum(bal_c)::HUGEINT AS sum_c, count(*)::HUGEINT AS n
  FROM c WHERE bal_c > 0
)
SELECT segment, count(*)::BIGINT AS numcust,
       sum(bal_c)::BIGINT AS totacctbal_cents
FROM c, a
WHERE bal_c::HUGEINT * n > sum_c
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY 1
"""

# Q2 shape (relational_ext.py:part_min_cost_supplier): correlated
# groupwise min decorrelated to a ranked window; integral // unit cost.
PART_MIN_COST_SUPPLIER_SQL = """
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         min((CAST(round(l_extendedprice * 100) AS BIGINT) * 1000)
             // CAST(l_quantity AS BIGINT)) AS unit_u3
  FROM lineitem GROUP BY 1, 2
), eu AS (
  SELECT s_suppkey, s_name, n_name
  FROM supplier
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = 'EUROPE'
), ranked AS (
  SELECT p.p_partkey, p.p_name, eu.s_name, eu.n_name, c.unit_u3,
         row_number() OVER (PARTITION BY c.l_partkey
                            ORDER BY c.unit_u3, c.l_suppkey) AS rn
  FROM cost c
  JOIN eu ON eu.s_suppkey = c.l_suppkey
  JOIN part p ON p.p_partkey = c.l_partkey
  WHERE p.p_size <= 15 AND p.p_type = 'ECONOMY'
)
SELECT p_partkey, p_name, s_name, n_name, unit_u3 AS min_unit_u3
FROM ranked WHERE rn = 1
"""


# CUPED (operators/abtest.py:cuped_adjusted_lift): split 2024-01-16,
# md5 'cuped' salt, threshold hex_threshold(0.5) = '80000000'.
CUPED_ADJUSTED_LIFT_SQL = """
WITH pu AS (
  SELECT user_id,
         coalesce(sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
                           THEN CAST(round(value * 100) AS BIGINT) END),
                  0) AS x,
         coalesce(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                           THEN CAST(round(value * 100) AS BIGINT) END),
                  0) AS y
  FROM events GROUP BY user_id
), pv AS (
  SELECT *,
         CASE WHEN substring(md5('cuped' || CAST(user_id AS VARCHAR)), 1, 8)
                   < '80000000'
              THEN 'control' ELSE 'treatment' END AS variant
  FROM pu
), g AS (
  SELECT count(*)::HUGEINT AS n, sum(x)::HUGEINT AS sx,
         sum(y)::HUGEINT AS sy,
         sum(x::HUGEINT * y::HUGEINT) AS sxy,
         sum(x::HUGEINT * x::HUGEINT) AS sxx
  FROM pv
), v AS (
  SELECT variant, count(*)::BIGINT AS n_users,
         sum(x)::BIGINT AS sum_x_cents, sum(y)::BIGINT AS sum_y_cents
  FROM pv GROUP BY variant
)
, f AS (
  SELECT v.variant, v.n_users, v.sum_x_cents, v.sum_y_cents,
         g.n * (g.n * g.sxx - g.sx * g.sx) * v.sum_y_cents::HUGEINT
           - (g.n * g.sxy - g.sx * g.sy)
             * (g.n * v.sum_x_cents::HUGEINT - v.n_users::HUGEINT * g.sx)
           AS adj_num,
         v.n_users::HUGEINT * g.n * (g.n * g.sxx - g.sx * g.sx) AS denom
  FROM v, g
)
-- int64-safe output envelope (round 8): adj_mean_u6 =
-- (1e6*adj_num) // denom via the exact q/r split (mirrors Spark's
-- quotient/remainder form; both engines' // / div truncate to zero)
SELECT variant, n_users, sum_x_cents, sum_y_cents,
       ((adj_num // denom) * 1000000
        + ((adj_num - (adj_num // denom) * denom) * 1000000) // denom
       )::BIGINT AS adj_mean_u6
FROM f
"""

# K-M life table (operators/survival.py:km_life_table).
KM_LIFE_TABLE_SQL = """
WITH lives AS (
  SELECT user_id,
         (max(epoch_us(ts)) - min(epoch_us(ts))) // 3600000000
             AS t_hours
  FROM events GROUP BY user_id
), deaths AS (
  SELECT t_hours, count(*)::BIGINT AS n_events FROM lives GROUP BY t_hours
), risk AS (
  SELECT t_hours, n_events,
         CAST(sum(n_events) OVER (ORDER BY t_hours DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS n_risk
  FROM deaths
)
SELECT t_hours, n_events, n_risk,
       ((n_events * 1000000) // n_risk)::BIGINT AS hazard_ppm
FROM risk
"""

# FK orphan audit (operators/integrity.py:fk_orphan_audit).
_FK_BRANCH = """
SELECT '{name}' AS relation, count(*)::BIGINT AS n_orphan_keys,
       coalesce(sum(n), 0)::BIGINT AS n_orphan_rows
FROM (SELECT {fk} AS k, count(*) AS n FROM {fact} GROUP BY 1) f
WHERE NOT EXISTS (SELECT 1 FROM {dim} d WHERE d.{dk} = f.k)
"""

FK_ORPHAN_AUDIT_SQL = "\nUNION ALL\n".join(
    _FK_BRANCH.format(name=name, fact=fact, fk=fk, dim=dim, dk=dk)
    for name, fact, fk, dim, dk in [
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ]
)


# Q11 shape (relational_ext.py:important_parts_value): groupwise HAVING
# vs global scalar, integer cross-multiply (share > 1/1500).
IMPORTANT_PARTS_VALUE_SQL = """
WITH pr AS (
  SELECT l_partkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT
             AS part_value_cents
  FROM lineitem GROUP BY 1
), t AS (SELECT sum(part_value_cents)::HUGEINT AS tot FROM pr)
SELECT l_partkey, part_value_cents FROM pr, t
WHERE part_value_cents::HUGEINT * 1500 > tot
"""

# Q15 shape (relational_ext.py:top_supplier_revenue): scalar-max view
# join, ties kept.
TOP_SUPPLIER_REVENUE_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT
             AS total_revenue_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-07-01'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, r.total_revenue_cents
FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue_cents = (SELECT max(total_revenue_cents) FROM rev)
"""

# Q20 shape (relational_ext.py:excess_share_suppliers): share above
# groupwise threshold via window sum + cross-multiply.
EXCESS_SHARE_SUPPLIERS_SQL = """
WITH ps AS (
  SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS BIGINT)) AS qty_ps
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY 1, 2
), wp AS (
  SELECT *, sum(qty_ps) OVER (PARTITION BY l_partkey) AS qty_p FROM ps
), ex AS (
  SELECT l_suppkey, count(*)::BIGINT AS n_parts_excess
  FROM wp WHERE qty_ps * 10 > qty_p * 3 GROUP BY 1
)
SELECT s.s_name, n.n_name, e.n_parts_excess
FROM ex e
JOIN supplier s ON s.s_suppkey = e.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
"""

# RAKE (operators/rake.py:rake_top_phrases): stopword-sentinel split,
# floor-before-sum word scores, distinct-phrase-grain scoring.
RAKE_TOP_PHRASES_SQL = r"""
WITH phr0 AS (
  SELECT unnest(string_split(
           regexp_replace(lower(text),
             '\b(?:a|the|and|of|to|in|is|on|for)\b', '|', 'g'),
           '|')) AS raw
  FROM documents
), phr AS (
  SELECT trim(regexp_replace(raw, '\s+', ' ', 'g')) AS phrase FROM phr0
  WHERE trim(regexp_replace(raw, '\s+', ' ', 'g')) <> ''
), words AS (
  SELECT phrase, len(string_split(phrase, ' ')) AS plen,
         unnest(string_split(phrase, ' ')) AS word
  FROM phr
), ws AS (
  SELECT word, count(*)::BIGINT AS freq, sum(plen)::BIGINT AS deg
  FROM words GROUP BY 1
), wsc AS (
  SELECT word, (deg * 1000000) // freq AS wscore FROM ws
), dictw AS (
  SELECT phrase, unnest(string_split(phrase, ' ')) AS word
  FROM (SELECT DISTINCT phrase FROM phr)
), scored AS (
  SELECT d.phrase, sum(w.wscore)::BIGINT AS score_u6
  FROM dictw d JOIN wsc w USING (word) GROUP BY 1
), cnt AS (
  SELECT phrase, count(*)::BIGINT AS n_occurrences FROM phr GROUP BY 1
)
SELECT s.phrase, s.score_u6, c.n_occurrences
FROM scored s JOIN cnt c USING (phrase)
ORDER BY s.score_u6 DESC, s.phrase ASC
LIMIT 20
"""


# Q8 shape (relational_ext.py:nation_market_share): conditional
# numerator over total, integral ppm.
NATION_MARKET_SHARE_SQL = """
WITH eu AS (
  SELECT n_nationkey FROM nation JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = 'EUROPE'
), j AS (
  SELECT year(o.o_orderdate) AS o_year,
         CAST(round(l.l_extendedprice * 100) AS BIGINT) AS c,
         CASE WHEN s.s_nationkey =
                   (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_3')
              THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
              ELSE 0 END AS nc
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'ECONOMY'
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  WHERE EXISTS (SELECT 1 FROM customer c2 JOIN eu
                  ON c2.c_nationkey = eu.n_nationkey
                WHERE c2.c_custkey = o.o_custkey)
)
SELECT o_year, sum(c)::BIGINT AS total_cents,
       sum(nc)::BIGINT AS nation_cents,
       ((sum(nc) * 1000000) // sum(c))::BIGINT AS share_ppm
FROM j GROUP BY o_year
"""

# Q9 shape (relational_ext.py:nation_year_profit): snowflake profit,
# signed exact units.
NATION_YEAR_PROFIT_SQL = """
SELECT n.n_name, CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
       sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (1000 - CAST(round(l.l_discount * 1000) AS BIGINT))
           - CAST(round(p.p_retailprice * 100) AS BIGINT)
             * CAST(l.l_quantity AS BIGINT) * 1000)::BIGINT AS profit_u5,
       count(*)::BIGINT AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%red%'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
GROUP BY 1, 2
"""

# Q14 shape (relational_ext.py:promo_revenue_share): conditional share
# per month bucket, integral ppm.
PROMO_REVENUE_SHARE_SQL = """
WITH j AS (
  SELECT CAST(date_trunc('month', l.l_shipdate) AS DATE) AS ship_month,
         CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (1000 - CAST(round(l.l_discount * 1000) AS BIGINT)) AS u5,
         p.p_type = 'PROMO' AS is_promo
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
)
SELECT ship_month, sum(CASE WHEN is_promo THEN u5 ELSE 0 END)::BIGINT
           AS promo_u5,
       sum(u5)::BIGINT AS total_u5,
       ((sum(CASE WHEN is_promo THEN u5 ELSE 0 END) * 1000000)
           // sum(u5))::BIGINT AS promo_ppm
FROM j GROUP BY ship_month
"""


# U-shaped attribution (operators/attribution.py:u_shaped_attribution):
# 40/20/40 with exact-integer degenerate policies, same pair table as
# the linear model.
MULTITOUCH_ATTRIBUTION_SQL = """
WITH p AS (
  SELECT user_id, ts, event_id,
         CAST(round(value * 1000000) AS BIGINT) AS value_u6
  FROM events WHERE event_type = 'purchase'),
c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
pairs AS (
  SELECT p.user_id, p.event_id, p.value_u6,
         c.ts AS prior_ts, c.event_id AS prior_event_id
  FROM p JOIN c ON c.user_id = p.user_id
               AND c.ts <= p.ts AND c.ts > p.ts - INTERVAL 24 HOUR),
att AS (
  SELECT *, count(*) OVER (PARTITION BY event_id) AS n,
         row_number() OVER (PARTITION BY event_id
             ORDER BY prior_ts, prior_event_id) AS rn
  FROM pairs)
SELECT user_id, event_id, prior_event_id, value_u6,
       CAST(n AS BIGINT) AS n_touches,
       CAST(CASE
         WHEN n = 1 THEN value_u6
         WHEN n = 2 AND rn = 1
           THEN value_u6 // 2 + (value_u6 - 2 * (value_u6 // 2))
         WHEN n = 2 THEN value_u6 // 2
         WHEN rn = 1 OR rn = n THEN (value_u6 * 2) // 5
         WHEN rn = 2 THEN
           (value_u6 - 2 * ((value_u6 * 2) // 5)) // (n - 2)
           + (value_u6 - 2 * ((value_u6 * 2) // 5))
           - ((value_u6 - 2 * ((value_u6 * 2) // 5)) // (n - 2)) * (n - 2)
         ELSE (value_u6 - 2 * ((value_u6 * 2) // 5)) // (n - 2)
       END AS BIGINT) AS share_u
FROM att
"""
