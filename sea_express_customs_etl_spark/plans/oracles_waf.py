"""DuckDB oracle SQL for the wave-AF queries (consistent-hash
rebalance plan, sequence pattern counts). Boolean sort order (false <
true) is relied on identically by both engines for the ring-successor
pick."""

from __future__ import annotations

CONSISTENT_HASH_REBALANCE_SQL = """
WITH ring AS (
  SELECT s.s AS shard,
         ('0x' || substring(md5('ring|' || s.s || '|' || v.v), 1, 15))
             ::BIGINT AS vh
  FROM generate_series(0, 8) s(s)
  CROSS JOIN generate_series(0, 15) v(v)),
ks AS (
  SELECT doc_id AS k,
         ('0x' || substring(md5('doc|' || doc_id), 1, 15))::BIGINT AS h
  FROM documents),
ab AS (
  SELECT ks.k, r.shard,
         row_number() OVER (PARTITION BY ks.k
             ORDER BY (r.vh < ks.h), r.vh) AS rn
  FROM ks CROSS JOIN ring r WHERE r.shard < 8),
aa AS (
  SELECT ks.k, r.shard,
         row_number() OVER (PARTITION BY ks.k
             ORDER BY (r.vh < ks.h), r.vh) AS rn
  FROM ks CROSS JOIN ring r WHERE r.shard < 9)
SELECT b.shard AS shard_before, a.shard AS shard_after,
       count(*)::BIGINT AS n_keys
FROM (SELECT k, shard FROM ab WHERE rn = 1) b
JOIN (SELECT k, shard FROM aa WHERE rn = 1) a USING (k)
GROUP BY 1, 2
"""

SEQUENCE_PATTERN_COUNTS_SQL = """
WITH s AS (
  SELECT user_id,
         string_agg(CASE event_type
             WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
             WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
             WHEN 'error' THEN 'e' ELSE '?' END,
             '' ORDER BY ts, event_id) AS seq
  FROM events GROUP BY 1),
p AS (SELECT unnest(['v.*c.*p', 'e.*p.*e', 's.*v.*c.*p']) AS pattern)
SELECT p.pattern,
       sum(CASE WHEN regexp_matches(s.seq, p.pattern)
                THEN 1 ELSE 0 END)::BIGINT AS n_users
FROM p CROSS JOIN s
GROUP BY 1
"""
