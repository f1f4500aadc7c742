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


def wordpiece_apply_ctes(
    n_merges: int, rounds: int, src: str, carry_col: str,
    word_cte: str = "wpd"
) -> list[str]:
    """Shared WordPiece-APPLY chain: stage CTEs (training
    trajectory), the learned-unit vocabulary, a ``carry_col``-carrying
    word table, and ``rounds`` unrolled greedy longest-prefix-match
    steps ending in ``e{rounds}`` (word, pieces) — the one place the
    greedy-match SQL lives (token counts and fertility compose it)."""
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
{word_cte} AS MATERIALIZED (
  SELECT {carry_col}, w AS word FROM (
    SELECT {carry_col},
           unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
    FROM {src})
  WHERE w <> ''),
e0 AS (
  SELECT word, word || '</w>' AS aug,
         1 AS pos, CAST(0 AS BIGINT) AS pieces
  FROM (SELECT DISTINCT word FROM {word_cte}))"""
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
    return stages + enc


def wordpiece_token_counts_sql(
    n_merges: int = 8, rounds: int = 20, src: str = "documents"
) -> str:
    """WordPiece APPLY oracle (operators/bpe.wordpiece_encode_pieces):
    the shared apply chain (:func:`wordpiece_apply_ctes` — trajectory
    via the stage CTEs, never pasted literals; ``rounds`` unrolled
    greedy longest-prefix-match steps at DISTINCT-WORD grain) plus
    one per-doc piece-count rollup."""
    ctes = wordpiece_apply_ctes(n_merges, rounds, src, "doc_id")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT d.doc_id, CAST(sum(e.pieces) AS BIGINT) AS n_tokens
FROM wpd d JOIN e{rounds} e USING (word) GROUP BY 1
"""
    )

def bpe_apply_ctes(
    n_merges: int, src: str, carry_col: str, word_cte: str = "bwd"
) -> list[str]:
    """Shared BPE-APPLY chain: the MATERIALIZED stage CTEs (training
    trajectory), a ``carry_col``-carrying word table, the word-keyed
    replace chain, and the per-word piece table ``bpieces`` — the one
    place merge-apply SQL lives (token counts and fertility both
    compose it; a fix here lands in every consumer)."""
    from sea_express_customs_etl_spark.plans.oracles_ext import (
        bpe_stage_ctes,
    )

    s = chr(31)
    stages = bpe_stage_ctes(n_merges, src, materialized=True)
    enc = [
        f"""{word_cte} AS MATERIALIZED (
  SELECT {carry_col}, w FROM (
    SELECT {carry_col},
           unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
    FROM {src})
  WHERE w <> ''),
be0 AS MATERIALIZED (
  SELECT w,
         '{s}' || array_to_string(
             list_append(regexp_split_to_array(w, ''), '</w>'),
             '{s}{s}') || '{s}' AS enc
  FROM (SELECT DISTINCT w FROM {word_cte}))"""
    ]
    for k in range(1, n_merges + 1):
        enc.append(f"""be{k} AS MATERIALIZED (
  SELECT w,
         replace(enc, '{s}' || m.l || '{s}{s}' || m.r || '{s}',
                 '{s}' || m.l || m.r || '{s}') AS enc
  FROM be{k - 1} CROSS JOIN m{k} m)""")
    enc.append(f"""bpieces AS MATERIALIZED (
  SELECT w,
         CAST(len(string_split(trim(enc, '{s}'), '{s}{s}')) AS BIGINT)
             AS n
  FROM be{n_merges})""")
    return stages + enc


def bpe_token_counts_sql(
    n_merges: int = 10, src: str = "documents"
) -> str:
    """BPE LEARNED-merge apply oracle (operators/bpe.bpe_encode under
    the session-trained merges): the shared apply chain
    (:func:`bpe_apply_ctes` — stage CTEs all MATERIALIZED, the
    wordpiece 3^k-inlining lesson) plus the per-doc piece-count
    rollup. Never pasted literals — the learned merges stay CTE
    values."""
    ctes = bpe_apply_ctes(n_merges, src, "doc_id")
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT d.doc_id, CAST(sum(p.n) AS BIGINT) AS n_tokens
FROM bwd d JOIN bpieces p USING (w) GROUP BY 1
"""
    )


# --------------------------------------------------------------------------
# Corpus-dispersion wave (operators/dispersion.py): per-doc token
# entropy, Church-Gale burstiness, Zipf slope — plus the Moore-Lewis
# contrastive-perplexity selection (operators/lm.py:perplexity_gain).
# Tokenization = the lm.py convention (lower/trim/split-\s+/nonempty).
# --------------------------------------------------------------------------

_LTOKS = (
    "list_filter(string_split_regex(trim(lower(text)), '\\s+'),"
    " x -> x <> '')"
)

TOKEN_ENTROPY_SQL = f"""
WITH te_tok AS (
  SELECT doc_id, unnest({_LTOKS}) AS tok FROM documents),
te_c AS (SELECT doc_id, tok, count(*) AS c FROM te_tok GROUP BY 1, 2),
te_p AS (
  SELECT doc_id, sum(c) AS n, count(*) AS nd,
         sum(c * CAST(round(ln(c) * 1000000.0) AS BIGINT)) AS s
  FROM te_c GROUP BY 1)
SELECT d.doc_id,
       CAST(coalesce(n, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(nd, 0) AS INTEGER) AS n_distinct,
       CAST(coalesce(
           (n * CAST(round(ln(n) * 1000000.0) AS BIGINT) - s) // n,
           0) AS BIGINT) AS entropy_u6
FROM documents d LEFT JOIN te_p USING (doc_id)
"""

TOKEN_BURSTINESS_SQL = f"""
WITH tb_n AS (SELECT count(*)::HUGEINT AS ndocs FROM documents),
tb_tok AS (
  SELECT doc_id, unnest({_LTOKS}) AS token FROM documents),
tb_c AS (SELECT doc_id, token, count(*) AS c FROM tb_tok GROUP BY 1, 2),
tb_p AS (
  SELECT token, count(*) AS doc_freq,
         sum(c)::HUGEINT AS t, sum(c * c)::HUGEINT AS q
  FROM tb_c GROUP BY 1)
SELECT token, CAST(doc_freq AS INTEGER) AS doc_freq,
       CAST(t AS BIGINT) AS total_tf,
       CAST(((ndocs * q - t * t) * 1000000) // ((ndocs - 1) * t)
            AS BIGINT) AS vmr_u6
FROM tb_p, tb_n
"""

ZIPF_ALPHA_SQL = f"""
WITH za_tok AS (SELECT unnest({_LTOKS}) AS token FROM documents),
za_c AS (SELECT token, count(*) AS cnt FROM za_tok GROUP BY 1),
za_top AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, token) AS r
  FROM za_c ORDER BY cnt DESC, token LIMIT 500),
za_xy AS (
  SELECT CAST(round(ln(r) * 1000000.0) AS BIGINT) AS x,
         CAST(round(ln(cnt) * 1000000.0) AS BIGINT) AS y
  FROM za_top),
za_m AS (
  SELECT count(*)::HUGEINT AS n, sum(x)::HUGEINT AS sx,
         sum(y)::HUGEINT AS sy, sum(x::HUGEINT * y) AS sxy,
         sum(x::HUGEINT * x) AS sxx
  FROM za_xy)
SELECT CAST(n AS INTEGER) AS n_ranks,
       CAST(((sx * sy - n * sxy) * 1000000) // (n * sxx - sx * sx)
            AS BIGINT) AS alpha_u6
FROM za_m
"""


def perplexity_gain_sql(lm_score_sql: str, trigram_sql: str) -> str:
    """Moore-Lewis contrastive selection: mean bigram NLL minus mean
    trigram NLL per held-out doc, negate-first signed DIVs, top-100
    under (gain DESC, doc_id). Composes the two existing LM oracles
    as nested-WITH CTEs (each keeps its own private scope)."""
    return f"""
WITH pg_bi AS ({lm_score_sql}),
pg_tr AS ({trigram_sql})
SELECT b.doc_id, b.n_bigrams, t.n_trigrams,
       CAST((-b.logprob_u6) // b.n_bigrams AS BIGINT) AS mean_nll_bi_u6,
       CAST((-t.score_u6) // t.n_trigrams AS BIGINT) AS mean_nll_tri_u6,
       CAST((-b.logprob_u6) // b.n_bigrams
            - (-t.score_u6) // t.n_trigrams AS BIGINT) AS gain_u6
FROM pg_bi b JOIN pg_tr t USING (doc_id)
WHERE b.n_bigrams > 0 AND t.n_trigrams > 0
ORDER BY gain_u6 DESC, doc_id
LIMIT 100
"""


# --------------------------------------------------------------------------
# Power-iteration top principal component (operators/pca.py): the
# WHOLE trajectory re-derived — quantize, center (signed-DIV mean),
# then per round the two matvecs + max-norm rescale threaded through
# chained CTEs (never replayed literals). All MATERIALIZED: pc_c and
# each pc_w{k} are referenced twice (the wordpiece 3^k-inlining rule).
# Signed divisions are negate-first everywhere (trunc-vs-floor).
# --------------------------------------------------------------------------

def pca_stage_ctes(rounds: int = 5) -> list[str]:
    stages = [
        """pc_x AS MATERIALIZED (
  SELECT i, j, CAST(round(CAST(e AS DOUBLE) * 1000000.0) AS BIGINT) AS x
  FROM (SELECT vec_id AS i, generate_subscripts(embedding, 1) AS j,
               unnest(embedding) AS e
        FROM embeddings))""",
        """pc_mu AS MATERIALIZED (
  SELECT j, CASE WHEN s >= 0 THEN s // n ELSE -((-s) // n) END AS mu
  FROM (SELECT j, sum(x) AS s, count(*) AS n FROM pc_x GROUP BY j))""",
        """pc_c AS MATERIALIZED (
  SELECT i, j, x - mu AS xc FROM pc_x JOIN pc_mu USING (j))""",
        "pc_v0 AS (SELECT j, 1000000::HUGEINT AS v FROM pc_mu)",
    ]
    for k in range(1, rounds + 1):
        stages.append(f"""pc_d{k} AS MATERIALIZED (
  SELECT i, CASE WHEN s >= 0 THEN s // 1000000
               ELSE -((-s) // 1000000) END AS d
  FROM (SELECT i, sum(xc * v) AS s
        FROM pc_c JOIN pc_v{k - 1} USING (j) GROUP BY i)),
pc_w{k} AS MATERIALIZED (
  SELECT j, sum(xc::HUGEINT * d) AS w
  FROM pc_c JOIN pc_d{k} USING (i) GROUP BY j),
pc_m{k} AS MATERIALIZED (SELECT max(abs(w)) AS m FROM pc_w{k}),
pc_v{k} AS MATERIALIZED (
  SELECT j, CASE WHEN w >= 0 THEN (w * 1000000) // m
              ELSE -(((-w) * 1000000) // m) END AS v
  FROM pc_w{k}, pc_m{k})""")
    return stages


def pca_component_sql(rounds: int = 5) -> str:
    """Trained-component oracle: (dim, v_u6, mu_u6) after ``rounds``
    power steps."""
    stages = ",\n".join(pca_stage_ctes(rounds))
    return f"""
WITH {stages}
SELECT j AS dim, CAST(v AS BIGINT) AS v_u6, CAST(mu AS BIGINT) AS mu_u6
FROM pc_v{rounds} JOIN pc_mu USING (j)
"""


def pca_project_sql(rounds: int = 5) -> str:
    """Projection oracle: every vector's 1-D PCA score under the SAME
    re-derived trajectory (centered dot with the final component,
    signed micro-unit div)."""
    stages = ",\n".join(pca_stage_ctes(rounds))
    return f"""
WITH {stages}
SELECT i AS vec_id,
       CAST(CASE WHEN s >= 0 THEN s // 1000000
                 ELSE -((-s) // 1000000) END AS BIGINT) AS proj_u6
FROM (SELECT c.i, sum(c.xc * v.v) AS s
      FROM pc_c c JOIN pc_v{rounds} v USING (j) GROUP BY c.i)
"""


def pca_label_anova_sql(rounds: int = 5) -> str:
    """One-way ANOVA of the projection by label under the SAME
    re-derived trajectory: truncated-mean spec (signed DIVs), SSW at
    row grain, SSB at label grain, F as one integer rational."""
    stages = ",\n".join(pca_stage_ctes(rounds)) + f""",
pa_p AS MATERIALIZED (
  SELECT i, CASE WHEN s >= 0 THEN s // 1000000
              ELSE -((-s) // 1000000) END AS p
  FROM (SELECT c.i, sum(c.xc * v.v) AS s
        FROM pc_c c JOIN pc_v{rounds} v USING (j) GROUP BY c.i)),
pa_l AS MATERIALIZED (
  SELECT e.label, p.p FROM pa_p p JOIN embeddings e ON e.vec_id = p.i),
pa_g AS MATERIALIZED (
  SELECT label, count(*) AS n, sum(p) AS s,
         CASE WHEN sum(p) >= 0 THEN sum(p) // count(*)
              ELSE -((-sum(p)) // count(*)) END AS meang
  FROM pa_l GROUP BY label),
pa_gr AS (
  SELECT sum(n) AS nn,
         CASE WHEN sum(s) >= 0 THEN sum(s) // sum(n)
              ELSE -((-sum(s)) // sum(n)) END AS gmean
  FROM pa_g),
pa_ssw AS (
  SELECT sum((l.p - g.meang) * (l.p - g.meang)) AS ssw
  FROM pa_l l JOIN pa_g g USING (label)),
pa_ssb AS (
  SELECT count(*) AS k,
         sum(g.n * (g.meang - gr.gmean) * (g.meang - gr.gmean)) AS ssb
  FROM pa_g g, pa_gr gr)"""
    return f"""
WITH {stages}
SELECT CAST(b.k AS INTEGER) AS k, CAST(gr.nn AS BIGINT) AS n,
       CAST(b.ssb AS BIGINT) AS ssb, CAST(w.ssw AS BIGINT) AS ssw,
       CAST((b.ssb::HUGEINT * (gr.nn - b.k) * 1000000)
            // ((b.k - 1)::HUGEINT * w.ssw) AS BIGINT) AS f_u6
FROM pa_ssb b, pa_ssw w, pa_gr gr
"""


def knn_label_vote_sql(
    k: int = 5, nprobe: int = 2, n_cent: int | None = None,
    iters: int = 2,
) -> str:
    """Holdout kNN classifier oracle (operators/knn.py): integer
    k-means re-derived over the EVEN half (same md5 init rule /
    floor-mean update as KMEANS_Q_SQL, kn_-prefixed CTEs per the
    composition-collision rule), odd vectors probe nprobe cells and
    vote among their k nearest even neighbors (d2 ASC, neighbor ASC;
    vote count DESC, label ASC). ``n_cent=None`` mirrors the Spark
    side's scale dial — ``max(4, ⌈√N_train⌉)`` recomputed from the
    data in the init CTE's LIMIT subquery, so the oracle stays valid
    at every sf without pasting a collected count as a literal."""
    from sea_express_customs_etl_spark.plans.oracles_ext import _KMQ_D2

    iter_tpl = """kn_a{i} AS (
  SELECT q.vec_id, q.v, c.cluster,
         row_number() OVER (PARTITION BY q.vec_id ORDER BY
             {d2qc}, c.cluster) AS rn
  FROM kn_tr q, kn_cent{j} c),
kn_m{i} AS (
  SELECT a.cluster, g.d AS dim,
         CAST(floor(sum(a.v[g.d + 1]) / count(*)) AS BIGINT) AS m
  FROM kn_a{i} a, generate_series(0, 63) g(d)
  WHERE a.rn = 1 GROUP BY 1, 2),
kn_b{i} AS (
  SELECT cluster, list(m ORDER BY dim) AS v FROM kn_m{i} GROUP BY cluster),
kn_cent{i} AS MATERIALIZED (
  SELECT p.cluster, coalesce(b.v, p.v) AS v
  FROM kn_cent{j} p LEFT JOIN kn_b{i} b USING (cluster))"""
    iters_sql = ",\n".join(
        iter_tpl.format(
            i=i, j=i - 1, d2qc=_KMQ_D2.format(a="q.v", b="c.v")
        )
        for i in range(1, iters + 1)
    )
    n_cent_expr = (
        str(n_cent)
        if n_cent is not None
        else (
            "(SELECT greatest(4, CAST(ceil(sqrt(count(*))) AS BIGINT)) "
            "FROM kn_tr)"
        )
    )
    return f"""
WITH kn_q AS MATERIALIZED (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(round(x * 1000000.0) AS BIGINT)) AS v
  FROM embeddings),
kn_tr AS MATERIALIZED (SELECT * FROM kn_q WHERE vec_id % 2 = 0),
kn_cent0 AS (
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
             - 1 AS cluster, v
  FROM kn_tr
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
  LIMIT {n_cent_expr}),
{iters_sql},
kn_asg AS MATERIALIZED (
  SELECT vec_id, v, cluster FROM (
    SELECT q.vec_id, q.v, c.cluster,
           row_number() OVER (PARTITION BY q.vec_id ORDER BY
               {_KMQ_D2.format(a='q.v', b='c.v')}, c.cluster) AS rn
    FROM kn_tr q, kn_cent{iters} c)
  WHERE rn = 1),
kn_te AS (SELECT vec_id AS query_id, v AS qv
          FROM kn_q WHERE vec_id % 2 = 1),
kn_pr AS MATERIALIZED (
  SELECT query_id, qv, cluster FROM (
    SELECT t.query_id, t.qv, c.cluster,
           row_number() OVER (PARTITION BY t.query_id ORDER BY
               {_KMQ_D2.format(a='t.qv', b='c.v')}, c.cluster) AS pr
    FROM kn_te t, kn_cent{iters} c)
  WHERE pr <= {nprobe}),
kn_nn AS MATERIALIZED (
  SELECT query_id, neighbor_id FROM (
    SELECT p.query_id, a.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY p.query_id ORDER BY
               {_KMQ_D2.format(a='p.qv', b='a.v')}, a.vec_id) AS rn
    FROM kn_asg a JOIN kn_pr p USING (cluster))
  WHERE rn <= {k}),
kn_v AS (
  SELECT n.query_id, e.label AS nl, count(*) AS c
  FROM kn_nn n JOIN embeddings e ON e.vec_id = n.neighbor_id
  GROUP BY 1, 2),
kn_p AS (
  SELECT query_id, nl AS pred_label FROM (
    SELECT query_id, nl,
           row_number() OVER (PARTITION BY query_id
               ORDER BY c DESC, nl) AS rn
    FROM kn_v)
  WHERE rn = 1)
SELECT p.query_id AS vec_id,
       CAST(p.pred_label AS INTEGER) AS pred_label,
       CAST(e.label AS INTEGER) AS true_label,
       CAST(CASE WHEN p.pred_label = e.label THEN 1 ELSE 0 END
            AS INTEGER) AS correct
FROM kn_p p JOIN embeddings e ON e.vec_id = p.query_id
"""


# Mann-Kendall monotonic trend per event type
# (operators/stats_tests.py:mann_kendall_trend): S over hour-bucket
# pairs, tie-corrected variance numerator, significance via the fixed
# 1.96^2 ppm literal — no sqrt, no floats, HUGEINT comparison.
MANN_KENDALL_SQL = """
WITH mk_b AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h,
         CAST(round(value * 1000) AS BIGINT) AS v3
  FROM events),
mk_hb AS MATERIALIZED (
  SELECT event_type, h, sum(v3)::BIGINT AS s3 FROM mk_b GROUP BY 1, 2),
mk_s AS (
  SELECT a.event_type, CAST(sum(sign(c.s3 - a.s3)) AS BIGINT) AS s_stat
  FROM mk_hb a JOIN mk_hb c ON a.event_type = c.event_type AND a.h < c.h
  GROUP BY 1),
mk_n AS (SELECT event_type, count(*)::BIGINT AS n FROM mk_hb GROUP BY 1),
mk_t AS (
  SELECT event_type, sum(t * (t - 1) * (2 * t + 5))::BIGINT AS tie
  FROM (SELECT event_type, s3, count(*)::BIGINT AS t
        FROM mk_hb GROUP BY 1, 2)
  GROUP BY 1)
SELECT s.event_type, CAST(n.n AS INTEGER) AS n_buckets, s.s_stat,
       CAST(n.n * (n.n - 1) * (2 * n.n + 5) - t.tie AS BIGINT) AS var_num,
       CAST(sign(s.s_stat) AS INTEGER) AS trend,
       CAST(CASE
            WHEN n.n * (n.n - 1) * (2 * n.n + 5) - t.tie = 0 THEN 0
            WHEN 18 * s.s_stat::HUGEINT * s.s_stat * 1000000
                 >= 3841600 * (n.n::HUGEINT * (n.n - 1) * (2 * n.n + 5)
                               - t.tie)
            THEN 1 ELSE 0 END AS INTEGER) AS significant
FROM mk_s s JOIN mk_n n USING (event_type) JOIN mk_t t USING (event_type)
"""
