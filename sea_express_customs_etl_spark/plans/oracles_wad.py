"""DuckDB oracle SQL for the wave-AD queries. The prefix-filter join's
oracle is deliberately the BRUTE-FORCE all-pairs join at distinct-text
grain: the hash match proves the prefix filter is lossless (the whole
point of an exact set-similarity join).
"""

from __future__ import annotations

PREFIX_JACCARD_PAIRS_SQL = r"""
WITH reps AS (SELECT min(doc_id) AS id, text FROM documents
              WHERE source = 'src0' GROUP BY text),
toks AS (
  SELECT DISTINCT id, tok FROM (
    SELECT id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
    FROM reps)
  WHERE tok <> ''),
sizes AS (SELECT id, count(*)::BIGINT AS n FROM toks GROUP BY 1),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*)::BIGINT AS n_inter
  FROM toks a JOIN toks b ON b.tok = a.tok AND a.id < b.id
  GROUP BY 1, 2)
SELECT i.id_a, i.id_b, i.n_inter,
       (sa.n + sb.n - i.n_inter)::BIGINT AS n_union,
       ((1000000 * i.n_inter) // (sa.n + sb.n - i.n_inter))::BIGINT
           AS jac_ppm
FROM inter i
JOIN sizes sa ON sa.id = i.id_a
JOIN sizes sb ON sb.id = i.id_b
WHERE 8 * i.n_inter >= 3 * (sa.n + sb.n)
"""

TWO_HOP_REACH_SQL = """
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT a.l_partkey AS src, b.l_partkey AS dst
  FROM items a JOIN items b USING (l_orderkey)
  WHERE a.l_partkey <> b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2),
e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM edges),
nbr AS (SELECT a AS node, b AS nb FROM e
        UNION ALL SELECT b, a FROM e),
two AS (
  SELECT x.nb AS v, y.nb AS w
  FROM nbr x JOIN nbr y ON y.node = x.node
  WHERE x.nb <> y.nb),
reach AS (
  SELECT DISTINCT v, w FROM (
    SELECT v, w FROM two
    UNION ALL SELECT node AS v, nb AS w FROM nbr)),
deg1 AS (SELECT node AS v, count(*)::BIGINT AS n_1hop FROM nbr GROUP BY 1),
cnt2 AS (SELECT v, count(*)::BIGINT AS n_2hop FROM reach GROUP BY 1)
SELECT d.v AS node, d.n_1hop, c.n_2hop
FROM deg1 d JOIN cnt2 c USING (v)
"""

# Hub-capped variant on the UNTHRESHOLDED (min_weight=1) graph over
# the l_orderkey % 4 order slice: middles with degree > 40 are dropped
# before the wedge join (the mid_deg_max dial); direct edges still
# count. Set semantics throughout — the cap changes RESULTS, so the
# oracle applies the identical cap.
TWO_HOP_REACH_CAPPED_SQL = """
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
               WHERE l_orderkey % 4 = 0),
e0 AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM items a JOIN items b USING (l_orderkey)
  WHERE a.l_partkey <> b.l_partkey),
e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM e0),
nbr AS (SELECT a AS node, b AS nb FROM e
        UNION ALL SELECT b, a FROM e),
deg AS (SELECT node, count(*) AS d FROM nbr GROUP BY 1),
mid AS (SELECT n.node, n.nb FROM nbr n JOIN deg USING (node)
        WHERE d <= 40),
two AS (
  SELECT x.nb AS v, y.nb AS w
  FROM mid x JOIN mid y ON y.node = x.node
  WHERE x.nb <> y.nb),
reach AS (
  SELECT DISTINCT v, w FROM (
    SELECT v, w FROM two
    UNION ALL SELECT node AS v, nb AS w FROM nbr)),
deg1 AS (SELECT node AS v, count(*)::BIGINT AS n_1hop FROM nbr GROUP BY 1),
cnt2 AS (SELECT v, count(*)::BIGINT AS n_2hop FROM reach GROUP BY 1)
SELECT d.v AS node, d.n_1hop, c.n_2hop
FROM deg1 d JOIN cnt2 c USING (v)
"""
