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
def sketch_states_sql(where: str = "") -> str:
    """Fresh single-pass sketch-state build (HLL registers over
    user_id + centi-unit value histogram per event_type) in the tall
    (kind, event_type, reg_or_bin, state_val) shape — the oracle for
    both store-lifecycle queries: rebuild-from-survivors (``where``
    restricts to survivors) and compaction (no restriction)."""
    return f"""
WITH surv AS (
  SELECT user_id, event_type, value
  FROM events{where}),
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


SKETCH_REBUILD_SURVIVORS_SQL = sketch_states_sql(
    " WHERE user_id % 13 <> 5"
)
SKETCH_COMPACT_MERGED_SQL = sketch_states_sql()


def _systems_prefix(
    queries: tuple[tuple[str, tuple[str, ...]], ...],
    k: int = 10,
    per_ranker_k: int = 20,
    c: int = 60,
) -> str:
    """Shared CTE prefix for the ranked-retrieval eval oracles: the
    BM25 CTE body plus graded coverage (``ncov``) and BOTH system
    rankings as ``nsys(ranker, query_id, doc_id, rank)`` — bm25 top-k
    and the RRF fusion exactly as bm25_sql/rrf_sql state them. All new
    CTE names are n-prefixed (the wordpiece shared-fragment collision
    rule)."""
    from sea_express_customs_etl_spark.plans.oracles_ext import (
        _bm25_cte_body,
    )

    return f"""{_bm25_cte_body(queries)},
ncov AS (
  SELECT qt.query_id, tf.doc_id, count(DISTINCT tf.term)::BIGINT AS nq
  FROM tf JOIN qt USING (term) GROUP BY 1, 2),
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
  UNION ALL SELECT 'rrf' AS ranker, * FROM nsys2)"""


def retrieval_ndcg_sql(
    queries: tuple[tuple[str, tuple[str, ...]], ...],
    disc_ppm: tuple[int, ...],
    k: int = 10,
    per_ranker_k: int = 20,
    c: int = 60,
) -> str:
    """nDCG@k oracle (operators/retrieval_eval.py): graded truth =
    2^(distinct query terms) - 1, discount table = the SAME fixed ppm
    literals the Spark plan embeds."""
    disc_vals = ", ".join(
        f"({i + 1}, {d})" for i, d in enumerate(disc_ppm)
    )
    return f"""
WITH {_systems_prefix(queries, k, per_ranker_k, c)},
ndisc(rank, ppm) AS (SELECT * FROM (VALUES {disc_vals})),
ngr AS (
  SELECT query_id, doc_id, ((1 << nq) - 1)::BIGINT AS gain FROM ncov),
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


def retrieval_map_mrr_sql(
    queries: tuple[tuple[str, tuple[str, ...]], ...],
    k: int = 10,
    per_ranker_k: int = 20,
    c: int = 60,
    min_tf: int = 4,
) -> str:
    """MAP@k / MRR oracle: binary relevance = the doc contains EVERY
    query term with tf >= ``min_tf`` ("strongly about all terms" — on
    the bag-of-words corpus a presence-only criterion saturates to
    AP = 1.0 for every system; the tf threshold keeps R sparse, 3-18
    per query at sf0.01, so hit positions actually discriminate).
    Exactness: P@i = hits_i/i scaled by 2520 = lcm(1..10) so every
    per-hit precision term is an exact integer; AP = (10^6 * sum) //
    (2520 * min(R, k)); RR = 10^6 // first_relevant_rank. All
    bigint; R = 0 guards to 0."""
    return f"""
WITH {_systems_prefix(queries, k, per_ranker_k, c)},
nqn AS (SELECT query_id, count(*)::BIGINT AS qn FROM qt GROUP BY 1),
ncov_tf AS (
  SELECT qt.query_id, tf.doc_id, count(*)::BIGINT AS nterm
  FROM tf JOIN qt USING (term) WHERE tf.tf >= {min_tf}
  GROUP BY 1, 2),
nrel AS (SELECT c.query_id, c.doc_id
         FROM ncov_tf c JOIN nqn USING (query_id)
         WHERE c.nterm = nqn.qn),
nrcnt AS (SELECT query_id, count(*)::BIGINT AS n_rel
          FROM nrel GROUP BY 1),
nj AS (
  SELECT s.ranker, s.query_id, s.rank,
         CASE WHEN r.doc_id IS NULL THEN 0 ELSE 1 END AS relv
  FROM nsys s
  LEFT JOIN nrel r ON s.query_id = r.query_id AND s.doc_id = r.doc_id),
nh AS (
  SELECT ranker, query_id, rank, relv,
         sum(relv) OVER (PARTITION BY ranker, query_id
                         ORDER BY rank) AS h
  FROM nj),
nagg AS (
  SELECT ranker, query_id,
         sum(CASE WHEN relv = 1 THEN (2520 * h) // rank
                  ELSE 0 END)::BIGINT AS num,
         min(CASE WHEN relv = 1 THEN rank END) AS fr
  FROM nh GROUP BY 1, 2)
SELECT a.ranker, a.query_id,
       CAST(coalesce(c.n_rel, 0) AS BIGINT) AS n_rel,
       CAST(CASE WHEN coalesce(c.n_rel, 0) = 0 THEN 0
                 ELSE (1000000 * a.num) // (2520 * least(c.n_rel, {k}))
            END AS BIGINT) AS ap_u6,
       CAST(CASE WHEN a.fr IS NULL THEN 0
                 ELSE 1000000 // a.fr END AS BIGINT) AS rr_u6
FROM nagg a LEFT JOIN nrcnt c ON a.query_id = c.query_id
"""


# Cohen's kappa between the two deterministic quality annotators
# (operators/evalstats.py:cohens_kappa): token-budget (n >= 30) vs
# lexical-richness (distinct >= 18) over the BM25 tokenization; kappa
# as one integer rational, |numerator| divided first and the sign
# re-applied (negative-numerator integer division is convention-
# dependent across engines — CLAUDE.md).
LABEL_AGREEMENT_KAPPA_SQL = r"""
WITH ta AS (
  SELECT list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                     x -> x <> '') AS tk
  FROM documents),
t AS (
  SELECT CASE WHEN len(tk) >= 30 THEN 1 ELSE 0 END AS a,
         CASE WHEN len(list_distinct(tk)) >= 18 THEN 1 ELSE 0 END AS b
  FROM ta),
g AS (
  SELECT sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END)::BIGINT AS n11,
         sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)::BIGINT AS n10,
         sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)::BIGINT AS n01,
         sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END)::BIGINT AS n00
  FROM t)
SELECT n11, n10, n01, n00,
       CAST(CASE WHEN
         ((n11+n10+n01+n00) * (n11+n00)
          - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00))) >= 0
         THEN (1000000 * ((n11+n10+n01+n00) * (n11+n00)
               - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00))))
              // ((n11+n10+n01+n00) * (n11+n10+n01+n00)
                  - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00)))
         ELSE -((1000000 * (((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00))
                - (n11+n10+n01+n00) * (n11+n00)))
              // ((n11+n10+n01+n00) * (n11+n10+n01+n00)
                  - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00))))
       END AS BIGINT) AS kappa_u6
FROM g
"""


def ranking_rbo_sql(
    queries: tuple[tuple[str, tuple[str, ...]], ...],
    suffix_w: tuple[int, ...],
    denom: int,
    k: int = 10,
    per_ranker_k: int = 20,
    c: int = 60,
) -> str:
    """RBO@10 oracle between the bm25 and RRF system rankings (both
    restated from the shared prefix): a common doc contributes the
    suffix weight of its max depth; numerator in HUGEINT, final
    quotient bigint. Weights are the SAME fixed literals the Spark
    plan embeds."""
    w_vals = ", ".join(f"({m + 1}, {w})" for m, w in enumerate(suffix_w))
    return f"""
WITH {_systems_prefix(queries, k, per_ranker_k, c)},
rw(m, w) AS (SELECT * FROM (VALUES {w_vals})),
rmatch AS (
  SELECT a.query_id, greatest(a.rank, b.rank) AS m
  FROM nsys1 a
  JOIN nsys2 b ON a.query_id = b.query_id AND a.doc_id = b.doc_id),
ragg AS (
  SELECT query_id, count(*)::BIGINT AS n_common,
         sum(w)::HUGEINT AS num
  FROM rmatch JOIN rw USING (m) GROUP BY 1),
rq AS (SELECT DISTINCT query_id FROM nsys1)
SELECT rq.query_id,
       CAST(coalesce(n_common, 0) AS BIGINT) AS n_common,
       CAST(coalesce((num * 1000000) // {denom}, 0) AS BIGINT) AS rbo_u6
FROM rq LEFT JOIN ragg USING (query_id)
"""


def wordpiece_token_counts_sql(
    n_merges: int = 8, rounds: int = 20, src: str = "documents"
) -> str:
    """WordPiece APPLY oracle (operators/bpe.wordpiece_encode_pieces):
    the training trajectory re-derived via the SHARED stage CTEs
    (oracles_ext.wordpiece_stage_ctes — never pasted literals), the
    vocabulary assembled from the m1..m{n} winners + the '</w>'
    sentinel, then ``rounds`` unrolled greedy longest-prefix-match
    steps at DISTINCT-WORD grain (a correlated max-length scalar
    subquery per step; the done-guard makes surplus rounds no-ops),
    and one per-doc piece-count rollup."""
    from sea_express_customs_etl_spark.plans.oracles_ext import (
        wordpiece_stage_ctes,
    )

    stages = wordpiece_stage_ctes(n_merges, src)
    vocab_union = " UNION ALL ".join(
        f"SELECT l || r AS u FROM m{k}" for k in range(1, n_merges + 1)
    )
    enc = [
        f"""wpv AS MATERIALIZED (
  SELECT u FROM ({vocab_union} UNION ALL SELECT '</w>')),
wpd AS MATERIALIZED (
  SELECT doc_id, w AS word FROM (
    SELECT doc_id,
           unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
    FROM {src})
  WHERE w <> ''),
e0 AS (
  SELECT word, word || '</w>' AS aug,
         1 AS pos, CAST(0 AS BIGINT) AS pieces
  FROM (SELECT DISTINCT word FROM wpd))"""
    ]
    for j in range(1, rounds + 1):
        enc.append(f"""e{j} AS MATERIALIZED (
  SELECT word, aug,
         CASE WHEN pos > len(aug) THEN pos
              ELSE pos + coalesce((SELECT max(len(v.u)) FROM wpv v
                   WHERE substr(aug, pos, len(v.u)) = v.u), 1) END AS pos,
         CASE WHEN pos > len(aug) THEN pieces ELSE pieces + 1 END
             AS pieces
  FROM e{j - 1})""")
    return (
        "WITH "
        + ",\n".join(stages + enc)
        + f"""
SELECT d.doc_id, CAST(sum(e.pieces) AS BIGINT) AS n_tokens
FROM wpd d JOIN e{rounds} e USING (word) GROUP BY 1
"""
    )


def bpe_token_counts_sql(
    n_merges: int = 10, src: str = "documents"
) -> str:
    """BPE LEARNED-merge apply oracle (operators/bpe.bpe_encode under
    the session-trained merges): the training trajectory re-derived
    via the SHARED stage CTEs (oracles_ext.bpe_stage_ctes, all
    MATERIALIZED — the m{k} winners are referenced twice here, train
    chain + encode chain, the wordpiece 3^k-inlining lesson), then a
    word-keyed replace chain applies each winner in merge order and
    the per-doc piece counts roll up. Never pasted literals — the
    learned merges stay CTE values."""
    from sea_express_customs_etl_spark.plans.oracles_ext import (
        bpe_stage_ctes,
    )

    s = chr(31)
    stages = bpe_stage_ctes(n_merges, src, materialized=True)
    enc = [
        f"""bwd AS MATERIALIZED (
  SELECT doc_id, w FROM (
    SELECT doc_id,
           unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
    FROM {src})
  WHERE w <> ''),
be0 AS MATERIALIZED (
  SELECT w,
         '{s}' || array_to_string(
             list_append(regexp_split_to_array(w, ''), '</w>'),
             '{s}{s}') || '{s}' AS enc
  FROM (SELECT DISTINCT w FROM bwd))"""
    ]
    for k in range(1, n_merges + 1):
        enc.append(f"""be{k} AS MATERIALIZED (
  SELECT w,
         replace(enc, '{s}' || m.l || '{s}{s}' || m.r || '{s}',
                 '{s}' || m.l || m.r || '{s}') AS enc
  FROM be{k - 1} CROSS JOIN m{k} m)""")
    return (
        "WITH "
        + ",\n".join(stages + enc)
        + f""",
bpieces AS MATERIALIZED (
  SELECT w,
         CAST(len(string_split(trim(enc, '{s}'), '{s}{s}')) AS BIGINT)
             AS n
  FROM be{n_merges})
SELECT d.doc_id, CAST(sum(p.n) AS BIGINT) AS n_tokens
FROM bwd d JOIN bpieces p USING (w) GROUP BY 1
"""
    )
