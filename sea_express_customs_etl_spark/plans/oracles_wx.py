"""DuckDB oracle SQL for the wave-X queries (interval coverage, local
clustering coefficient, CDC apply, readability, deterministic
bootstrap). Same portability rules as the other oracle modules:
micro-unit integers through every aggregate, md5 as the only hash,
integral ``//`` division on nonnegative operands only, deterministic
tie-breaks everywhere.
"""

from __future__ import annotations

# interval_union_coverage (operators/timeseries.py): 300 s intervals,
# merge-overlaps sweep as a preceding-rows running max of ends.
USER_ACTIVE_COVERAGE_SQL = """
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s,
         epoch_us(ts) + 300000000 AS e, event_id
  FROM events),
w AS (
  SELECT user_id, s, e,
         max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS pm
  FROM iv)
SELECT user_id,
       count(*)::BIGINT AS n_events,
       CAST(sum(CASE WHEN pm IS NULL OR s >= pm THEN 1 ELSE 0 END)
            AS BIGINT) AS n_spans,
       CAST(sum(greatest(0, e - greatest(s, coalesce(pm, s))))
            AS BIGINT) AS covered_us
FROM w
GROUP BY 1
"""

# clustering_coefficient (operators/graph.py): same canonical triangle
# enumeration as COPURCHASE_TRIANGLES_SQL plus the distinct-degree
# normalization; // is exact DIV (all operands nonnegative).
NODE_CLUSTERING_COEFF_SQL = """
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM items a JOIN items b USING (l_orderkey)
  WHERE a.l_partkey <> b.l_partkey),
e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM edges),
ends_ AS (SELECT a AS node FROM e UNION ALL SELECT b FROM e),
deg AS (
  SELECT node, count(*)::BIGINT AS degree
  FROM ends_ GROUP BY 1 HAVING count(*) >= 2),
tris AS (
  SELECT ab.a AS x, ab.b AS y, bc.b AS z
  FROM e ab
  JOIN e bc ON bc.a = ab.b
  JOIN e ac ON ac.a = ab.a AND ac.b = bc.b),
nodes AS (
  SELECT x AS node FROM tris
  UNION ALL SELECT y FROM tris
  UNION ALL SELECT z FROM tris),
tc AS (SELECT node, count(*)::BIGINT AS n_triangles FROM nodes GROUP BY 1)
SELECT d.node, d.degree,
       coalesce(t.n_triangles, 0)::BIGINT AS n_triangles,
       ((2 * coalesce(t.n_triangles, 0) * 1000000)
        // (d.degree * (d.degree - 1)))::BIGINT AS coeff_ppm
FROM deg d LEFT JOIN tc t USING (node)
"""

# cdc_apply (operators/scd.py): the oracle is FULL REPLAY — the Spark
# side answers via snapshot-then-merge (state = apply(prefix), final =
# apply(batch, state)), so the hash match checks the merge algebra.
CDC_APPLY_CHANGES_SQL = """
WITH ch AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         event_type,
         CAST(round(value * 1000000) AS BIGINT) AS value_u6
  FROM events),
r AS (
  SELECT *, row_number() OVER (PARTITION BY user_id
             ORDER BY ts DESC, event_id DESC) AS rn
  FROM ch)
SELECT user_id, ts, event_id, event_type, value_u6
FROM r WHERE rn = 1 AND op = 'U'
"""

# readability_scores (operators/textstats.py): vowel-group syllable
# proxy; both ratio terms nonnegative so per-term // floors match
# Spark's DIV.
DOC_READABILITY_SQL = """
WITH c AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '[A-Za-z0-9]+'))::BIGINT
             AS n_words,
         greatest(1, len(regexp_extract_all(text, '[.!?]+')))::BIGINT
             AS n_sents,
         len(regexp_extract_all(text, '[aeiouyAEIOUY]+'))::BIGINT
             AS n_syllables
  FROM documents)
SELECT doc_id, n_words, n_sents, n_syllables,
       (206835 - (1015 * n_words) // n_sents
               - (84600 * n_syllables) // n_words)::BIGINT
           AS flesch_milli
FROM c WHERE n_words >= 1
"""

# bootstrap_sum_ci (operators/stats_tests.py): positional-md5 draws,
# 20 replicates, order statistics 1 and 18 of the replicate totals.
# The 15-hex-char prefix is 60 bits — BIGINT-safe on both engines.
BOOTSTRAP_VALUE_CI_SQL = """
WITH base AS (
  SELECT event_type AS g,
         CAST(round(value * 1000000) AS BIGINT) AS v,
         row_number() OVER (PARTITION BY event_type ORDER BY event_id)
             - 1 AS rn
  FROM events),
cnt AS (SELECT g, count(*)::BIGINT AS n FROM base GROUP BY 1),
draws AS (
  SELECT b.g, r.i AS rep,
         ('0x' || substring(md5(b.g || '|' || r.i || '|' || b.rn),
                            1, 15))::BIGINT % c.n AS j
  FROM base b
  JOIN cnt c USING (g)
  CROSS JOIN generate_series(0, 19) r(i)),
resampled AS (
  SELECT d.g, d.rep, s.v
  FROM draws d JOIN base s ON s.g = d.g AND s.rn = d.j),
reps AS (
  SELECT g, rep, sum(v)::BIGINT AS s FROM resampled GROUP BY 1, 2),
ranked AS (
  SELECT g, s,
         row_number() OVER (PARTITION BY g ORDER BY s, rep) - 1 AS r
  FROM reps)
SELECT c.g AS event_type, c.n AS n_rows,
       CAST(20 AS BIGINT) AS n_reps,
       max(CASE WHEN r.r = 1 THEN r.s END)::BIGINT AS lo_sum_u6,
       max(CASE WHEN r.r = 18 THEN r.s END)::BIGINT AS hi_sum_u6
FROM ranked r JOIN cnt c USING (g)
GROUP BY 1, 2, 3
"""

# textrank_keywords (operators/textrank.py): same unrolled weighted-
# PageRank trajectory as COPURCHASE_PAGERANK_WEIGHTED_SQL, over the
# adjacent-token co-occurrence graph.
from sea_express_customs_etl_spark.plans.oracles_ext import _PRW_STEP

TEXTRANK_KEYWORDS_SQL = (
    r"""
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
ws AS (SELECT src, sum(w) AS wtot FROM ew GROUP BY 1),
ed AS (SELECT e.src, e.dst, e.w, ws.wtot FROM ew e JOIN ws USING (src)),
r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM ws),
it1 AS ("""
    + _PRW_STEP.format(prev="r0")
    + """),
it2 AS ("""
    + _PRW_STEP.format(prev="it1")
    + """),
it3 AS ("""
    + _PRW_STEP.format(prev="it2")
    + """)
SELECT node AS word, r AS rank_u6
FROM it3
ORDER BY rank_u6 DESC, word
LIMIT 20
"""
)

# bucketed_join_segments: the oracle is the PLAIN join — the Spark
# side's bucketed write/read lineage must not change a single value.
BUCKETED_JOIN_SEGMENTS_SQL = """
SELECT c.c_mktsegment,
       count(*)::BIGINT AS n_orders,
       sum(CAST(round(o.o_totalprice * 100) AS BIGINT))::BIGINT
           AS revenue_c
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1
"""

# partitioned_prune_hourly: direct filtered rollup — the Spark side's
# partitionBy write + pruned read must be value-transparent.
PARTITIONED_PRUNE_HOURLY_SQL = """
SELECT epoch_us(ts) // 3600000000 AS hour_id,
       count(*)::BIGINT AS n_events,
       sum(CAST(round(value * 1000000) AS BIGINT))::BIGINT
           AS sum_value_u6
FROM events
WHERE event_type = 'purchase'
GROUP BY 1
"""

# image_resize_stats (multimodal/binary_ops.py:resize_images):
# nearest-neighbor index map yi = (i·h0) DIV out_h, xi = (j·w0) DIV
# out_w over the synth_pgm closed form pixel = (3·id + 5·yi + 7·xi)
# mod 251; resized to 6×5. Corrupt ids (every 29th) fail the resize.
IMAGE_RESIZE_STATS_SQL = """
WITH ids AS (SELECT p_partkey AS media_id FROM part WHERE p_partkey <= 60),
dims AS (SELECT media_id, 4 + media_id % 13 AS w0, 4 + media_id % 11 AS h0
         FROM ids),
px AS (
  SELECT d.media_id,
         sum((3 * d.media_id + 5 * ((gi.i * d.h0) // 5)
              + 7 * ((gj.j * d.w0) // 6)) % 251) AS s
  FROM dims d
  CROSS JOIN generate_series(0, 4) gi(i)
  CROSS JOIN generate_series(0, 5) gj(j)
  GROUP BY 1)
SELECT media_id,
       CASE WHEN media_id % 29 = 0 THEN NULL
            ELSE CAST(6 AS INTEGER) END AS width,
       CASE WHEN media_id % 29 = 0 THEN NULL
            ELSE CAST(5 AS INTEGER) END AS height,
       CASE WHEN media_id % 29 = 0 THEN NULL
            ELSE CAST(s AS BIGINT) END AS luma_sum,
       media_id % 29 = 0 AS resize_failed
FROM px
"""
