"""Round-10 oracle SQL (DuckDB) — new statistical-family queries.

Conventions: hp_-prefixed CTEs (composition-collision rule), the
lm-family tokenization (lower/trim/split-\\s+/nonempty), u6-rounded
single libm ln calls (the token_entropy license), DECIMAL(38,0)
moment products (zipf_alpha's overflow rule), positive-operand DIV.
"""

from __future__ import annotations

_LTOKS = (
    "list_filter(string_split_regex(trim(lower(text)), '\\s+'),"
    " x -> x != '')"
)

# Heaps/Herdan vocabulary-growth fit (operators/dispersion.py:
# heaps_law_fit): one (ln cum_tokens, ln cum_vocab) point per document
# in (md5(id), id) stream order; first-appearance = (md5, id)-minimum
# occurrence per token; OLS slope in exact integer/decimal arithmetic.
HEAPS_LAW_SQL = f"""
WITH hp_t AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
         unnest({_LTOKS}) AS token
  FROM documents),
hp_d AS (
  SELECT doc_id, h, count(*)::BIGINT AS nt FROM hp_t GROUP BY 1, 2),
hp_f AS (
  SELECT doc_id FROM (
    SELECT token, doc_id,
           row_number() OVER (PARTITION BY token ORDER BY h, doc_id)
               AS rn
    FROM hp_t)
  WHERE rn = 1),
hp_n AS (SELECT doc_id, count(*)::BIGINT AS nn FROM hp_f GROUP BY 1),
hp_c AS (
  SELECT d.doc_id, d.h, d.nt, coalesce(n.nn, 0) AS nn
  FROM hp_d d LEFT JOIN hp_n n USING (doc_id)),
hp_cum AS (
  SELECT sum(nt) OVER w AS ct, sum(nn) OVER w AS cv
  FROM hp_c
  WINDOW w AS (ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING)),
hp_xy AS (
  SELECT CAST(round(ln(ct) * 1000000) AS BIGINT) AS x,
         CAST(round(ln(cv) * 1000000) AS BIGINT) AS y
  FROM hp_cum),
hp_m AS (
  SELECT count(*)::DECIMAL(38,0) AS n,
         sum(x::DECIMAL(38,0)) AS sx,
         sum(y::DECIMAL(38,0)) AS sy,
         sum(x::DECIMAL(38,0) * y) AS sxy,
         sum(x::DECIMAL(38,0) * x) AS sxx
  FROM hp_xy)
SELECT CAST(n AS INTEGER) AS n_points,
       CAST(CAST((n * sxy - sx * sy) * 1000000 AS HUGEINT)
            // CAST(n * sxx - sx * sx AS HUGEINT) AS BIGINT) AS beta_u6
FROM hp_m
"""

# k-anonymity / l-diversity release audit (operators/privacy.py:
# k_anonymity_audit): QI = (nation, $1k acctbal band via the
# round(x*100)::BIGINT cents parity pattern, shifted non-negative
# before integer division), sensitive = mktsegment. Pure integer
# counts over the class-grain frame.
K_ANONYMITY_SQL = """
WITH ka_q AS (
  SELECT c_nationkey AS qi_nation,
         (CAST(round(c_acctbal * 100) AS BIGINT) + 100000) // 100000
             AS qi_band,
         c_mktsegment AS sensitive
  FROM customer),
ka_c AS (
  SELECT qi_nation, qi_band, count(*)::BIGINT AS sz,
         count(DISTINCT sensitive)::BIGINT AS ldiv
  FROM ka_q GROUP BY 1, 2)
SELECT count(*)::BIGINT AS n_classes,
       sum(sz)::BIGINT AS n_rows,
       min(sz)::BIGINT AS k_min,
       sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END)::BIGINT
           AS classes_below_k,
       sum(CASE WHEN sz < 5 THEN sz ELSE 0 END)::BIGINT
           AS rows_below_k,
       min(ldiv)::BIGINT AS l_min_div,
       sum(CASE WHEN ldiv < 3 THEN 1 ELSE 0 END)::BIGINT
           AS classes_below_l
FROM ka_c
"""

# Per-source 1-D earth-mover (Wasserstein-1) drift on document length
# (operators/emd.py:length_emd_drift): closed form sum |F_s - F_c| *
# gap over the shared distinct-length grid, exact rationals over
# DECIMAL(38,0) numerators, one positive-operand DIV to u6.
LENGTH_EMD_SQL = """
WITH le_p AS (
  SELECT source, n_chars AS v, count(*)::BIGINT AS c
  FROM documents GROUP BY 1, 2),
le_g AS (SELECT v, sum(c)::BIGINT AS cc FROM le_p GROUP BY 1),
le_t AS (SELECT source, sum(c)::BIGINT AS ns FROM le_p GROUP BY 1),
le_n AS (SELECT sum(cc)::BIGINT AS nc FROM le_g),
le_l AS (
  SELECT t.source, g.v, g.cc, t.ns, n.nc, coalesce(p.c, 0) AS c
  FROM le_g g CROSS JOIN le_t t CROSS JOIN le_n n
  LEFT JOIN le_p p ON p.source = t.source AND p.v = g.v),
le_s AS (
  SELECT source, ns, nc,
         sum(c) OVER w AS cum_s, sum(cc) OVER w AS cum_c,
         lead(v) OVER (PARTITION BY source ORDER BY v) - v AS gap
  FROM le_l
  WINDOW w AS (PARTITION BY source ORDER BY v
               ROWS UNBOUNDED PRECEDING)),
le_m AS (
  SELECT source, ns, nc,
         sum(abs(cum_s::DECIMAL(38,0) * nc - cum_c::DECIMAL(38,0) * ns)
             * gap::DECIMAL(38,0)) AS numsum
  FROM le_s WHERE gap IS NOT NULL
  GROUP BY 1, 2, 3)
SELECT source, ns AS n_docs,
       CAST(CAST(numsum * 1000000 AS HUGEINT)
            // (ns::HUGEINT * nc::HUGEINT) AS BIGINT)
           AS emd_u6
FROM le_m
"""

# Neyman-allocation stratified sample (operators/sampling.py:
# neyman_allocation_sample): n_h ~ N_h*sd_h with the budget derived
# from N (scaling-scalar rule), exact isqrt (double seed + two integer
# corrections), largest-remainder rounding, md5-prefix ranked draw.
# The rank ORDER BY mirrors Spark's (8-hex md5 prefix, key) exactly.
NEYMAN_SAMPLE_SQL = """
WITH ny_b AS (
  SELECT o_orderpriority AS stratum, o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS y
  FROM orders),
ny_s AS (
  SELECT stratum, count(*)::BIGINT AS big_n,
         sum(y::DECIMAL(38,0)) AS sy,
         sum(y::DECIMAL(38,0) * y::DECIMAL(38,0)) AS syy
  FROM ny_b GROUP BY 1),
ny_v AS (
  SELECT stratum, big_n,
         CAST(CAST(big_n::DECIMAL(38,0) * syy - sy * sy AS HUGEINT)
              // (big_n::HUGEINT * big_n::HUGEINT)
              AS BIGINT) AS v
  FROM ny_s),
ny_sd AS (
  SELECT stratum, big_n,
         s1 - (CASE WHEN s1 * s1 > v THEN 1 ELSE 0 END) AS sd_cents
  FROM (
    SELECT stratum, big_n, v,
           s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= v THEN 1 ELSE 0 END)
               AS s1
    FROM (SELECT stratum, big_n, v,
                 CAST(floor(sqrt(v::DOUBLE)) AS BIGINT) AS s0
          FROM ny_v))),
ny_w AS (SELECT *, big_n * sd_cents AS w FROM ny_sd),
ny_sc AS (
  SELECT (sum(big_n) + 29) // 30 AS budget,
         sum(w::DECIMAL(38,0)) AS wsum
  FROM ny_w),
ny_pl AS (
  SELECT stratum, big_n, sd_cents,
         CAST((budget::HUGEINT * w::HUGEINT) // CAST(wsum AS HUGEINT)
              AS BIGINT) AS base,
         budget::HUGEINT * w::HUGEINT
           - ((budget::HUGEINT * w::HUGEINT) // CAST(wsum AS HUGEINT))
             * CAST(wsum AS HUGEINT) AS rem,
         budget
  FROM ny_w CROSS JOIN ny_sc),
ny_al AS (
  SELECT stratum, big_n, sd_cents,
         least(base + (CASE WHEN row_number()
                                 OVER (ORDER BY rem DESC, stratum ASC)
                            <= budget - sum(base) OVER ()
                            THEN 1 ELSE 0 END),
               big_n) AS alloc_n
  FROM ny_pl),
ny_rk AS (
  SELECT b.stratum, b.k, b.y, a.alloc_n,
         row_number() OVER (
           PARTITION BY b.stratum
           ORDER BY substr(md5('neyman' || CAST(b.k AS VARCHAR)), 1, 8),
                    b.k) AS rk
  FROM ny_b b JOIN ny_al a ON a.stratum = b.stratum),
ny_pk AS (
  SELECT stratum, count(*)::BIGINT AS picked_n,
         sum(k)::BIGINT AS key_sum, sum(y)::BIGINT AS cents_sum
  FROM ny_rk WHERE rk <= alloc_n GROUP BY 1)
SELECT a.stratum, a.big_n, a.sd_cents, a.alloc_n,
       coalesce(p.picked_n, 0)::BIGINT AS picked_n,
       coalesce(p.key_sum, 0)::BIGINT AS key_sum,
       coalesce(p.cents_sum, 0)::BIGINT AS cents_sum
FROM ny_al a LEFT JOIN ny_pk p ON p.stratum = a.stratum
"""


def hard_negative_sql(shortlist: int = 32, k: int = 8) -> str:
    """Hard-negative mining oracle (operators/knn_adc.py:
    hard_negative_mining): the trained-IVFPQ ADC template (the exact
    statement the shared store hash-matches) with the query set
    re-targeted to the anchor slice and the top list widened to the
    shortlist, then label-joined, same-label-dropped, and re-ranked
    to the k hardest negatives."""
    from sea_express_customs_etl_spark.plans.oracles_ext import (
        _IVFPQ_TRAINED_TMPL,
    )

    adc = _IVFPQ_TRAINED_TMPL.replace(
        "__TOPK__", str(shortlist), 1
    ).replace(
        "q AS (SELECT vec_id AS query_id, v FROM base WHERE vec_id < 10)",
        "q AS (SELECT vec_id AS query_id, v FROM base"
        " WHERE vec_id % 16 = 0)",
        1,
    )
    return f"""
WITH hn_sl AS ({adc}),
hn_f AS (
  SELECT s.query_id, s.neighbor_id, s.dist_u12
  FROM hn_sl s
  JOIN embeddings qa ON qa.vec_id = s.query_id
  JOIN embeddings nb ON nb.vec_id = s.neighbor_id
  WHERE nb.label <> qa.label),
hn_r AS (
  SELECT query_id, neighbor_id, dist_u12,
         row_number() OVER (PARTITION BY query_id
             ORDER BY dist_u12, neighbor_id) AS rk
  FROM hn_f)
SELECT query_id AS vec_id, neighbor_id AS neg_id,
       CAST(rk AS BIGINT) AS neg_rank, dist_u12
FROM hn_r WHERE rk <= {k}
"""


# PSI drift (operators/psi.py:value_psi_drift): reference-decile
# buckets via ANSI ntile (matches ntile_by_rank's extras-first
# sizing), shared 1 + #{edges < v} bucketing rule, Laplace +1,
# exact per-bucket term via HUGEINT products and the u6 ln license.
VALUE_PSI_SQL = """
WITH ps_b AS (
  SELECT (year(o_orderdate) >= 1997) AS cur,
         CAST(round(o_totalprice * 100) AS BIGINT) AS y,
         o_orderkey AS k
  FROM orders),
ps_r AS (
  SELECT y, ntile(10) OVER (ORDER BY y, k) AS bucket
  FROM ps_b WHERE NOT cur),
ps_e AS (
  SELECT bucket, max(y) AS e FROM ps_r WHERE bucket < 10 GROUP BY 1),
ps_a AS (
  SELECT b.k, b.cur,
         1 + sum(CASE WHEN b.y > e.e THEN 1 ELSE 0 END) AS bucket
  FROM ps_b b CROSS JOIN ps_e e GROUP BY b.k, b.cur),
ps_c AS (
  SELECT bucket,
         sum(CASE WHEN NOT cur THEN 1 ELSE 0 END)::BIGINT AS ref_n,
         sum(CASE WHEN cur THEN 1 ELSE 0 END)::BIGINT AS cur_n
  FROM ps_a GROUP BY 1),
ps_s AS (
  SELECT CAST(g.g AS INTEGER) AS bucket,
         coalesce(c.ref_n, 0) AS ref_n,
         coalesce(c.cur_n, 0) AS cur_n
  FROM (SELECT unnest(generate_series(1, 10)) AS g) g
  LEFT JOIN ps_c c ON c.bucket = g.g),
ps_t AS (
  SELECT sum(ref_n) + 10 AS np1, sum(cur_n) + 10 AS nq1 FROM ps_s)
SELECT bucket, ref_n, cur_n,
       CAST(
         CAST(((ref_n + 1)::HUGEINT * nq1 - (cur_n + 1)::HUGEINT * np1)
              * (CAST(round(ln((ref_n + 1) * nq1) * 1000000) AS BIGINT)
                 - CAST(round(ln((cur_n + 1) * np1) * 1000000)
                        AS BIGINT)) AS HUGEINT)
         // (np1::HUGEINT * nq1::HUGEINT) AS BIGINT) AS term_u6
FROM ps_s CROSS JOIN ps_t
"""


def bpe_fertility_sql(n_merges: int = 10, src: str = "documents") -> str:
    """Per-source tokenizer-fertility oracle (operators/bpe.py:
    bpe_fertility): the SHARED BPE apply chain
    (oracles_r9.bpe_apply_ctes — one place for the replace-chain SQL)
    with a source-carrying word table, then a source-grain rollup of
    pieces-per-word. Single positive DIVs on BIGINT."""
    from sea_express_customs_etl_spark.plans.oracles_r9 import (
        bpe_apply_ctes,
    )

    ctes = bpe_apply_ctes(n_merges, src, "source", word_cte="bfw")
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT b.source,
       count(*)::BIGINT AS n_words,
       sum(p.n)::BIGINT AS n_pieces,
       (1000000 * sum(p.n)::BIGINT) // count(*)::BIGINT AS fert_u6,
       (1000000 * sum(CASE WHEN p.n > 1 THEN 1 ELSE 0 END)::BIGINT)
           // count(*)::BIGINT AS multi_ppm
FROM bfw b JOIN bpieces p USING (w) GROUP BY 1
"""
    )


# Sliding-window HLL distinct (operators/sketches.py:
# hll_sliding_stats): per-hour 256-register sketches merged by
# register-wise max over the trailing 24 hours; integer sufficient
# statistics per hour (the hll_stats surface). The h48/rank recipe is
# the exact oracles_ext HLL convention.
HLL_SLIDING_SQL = """
WITH hs_b AS (
  SELECT epoch_us(ts) // 3600000000 AS eh,
         ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 12)
         )::BIGINT AS h48
  FROM events),
hs_r AS (
  SELECT eh, (h48 % 256)::INTEGER AS bucket,
         max(CASE WHEN h48 // 256 = 0 THEN 41
                  ELSE 41 - length(ltrim(bin(h48 // 256), '0')) END)
             AS max_rank
  FROM hs_b GROUP BY 1, 2),
hs_h AS (SELECT DISTINCT eh AS whour FROM hs_r),
hs_c AS (
  SELECT r.eh + g.o AS whour, r.bucket, r.max_rank
  FROM hs_r r, (SELECT unnest(generate_series(0, 23)) AS o) g
  WHERE r.eh + g.o IN (SELECT whour FROM hs_h)),
hs_m AS (
  SELECT whour, bucket, max(max_rank) AS mr
  FROM hs_c GROUP BY 1, 2)
SELECT whour AS epoch_hour,
       count(*)::INTEGER AS n_buckets,
       (256 - count(*))::INTEGER AS n_zero,
       CAST(sum(CAST(2 ** (41 - mr) AS BIGINT)) AS BIGINT) AS s_scaled
FROM hs_m GROUP BY 1
"""


def split_srm_sql(t_train: str, t_val: str) -> str:
    """SRM-audit oracle (operators/sampling.py:split_srm_check): the
    identical md5-prefix split assignment (thresholds supplied as the
    same hex_threshold literals the Spark side compiles), split-grain
    counts vs intended ppm, chi-square terms in HUGEINT."""
    return f"""
WITH sm_w AS (
  SELECT * FROM (VALUES ('train', 800000::BIGINT),
                        ('val', 100000::BIGINT),
                        ('test', 100000::BIGINT)) w(split, p_ppm)),
sm_a AS (
  SELECT doc_id,
         CASE WHEN substring(md5('split' || CAST(doc_id AS VARCHAR)),
                             1, 8) < '{t_train}' THEN 'train'
              WHEN substring(md5('split' || CAST(doc_id AS VARCHAR)),
                             1, 8) < '{t_val}' THEN 'val'
              ELSE 'test' END AS split
  FROM documents),
sm_c AS (SELECT split, count(*)::BIGINT AS n_obs FROM sm_a GROUP BY 1),
sm_n AS (SELECT count(*)::BIGINT AS n FROM documents)
SELECT w.split, coalesce(c.n_obs, 0) AS n_obs,
       w.p_ppm AS expected_ppm,
       CAST(((coalesce(c.n_obs, 0)::HUGEINT * 1000000
              - n::HUGEINT * w.p_ppm)
             * (coalesce(c.n_obs, 0)::HUGEINT * 1000000
                - n::HUGEINT * w.p_ppm))
            // (n::HUGEINT * w.p_ppm::HUGEINT) AS BIGINT)
           AS chi2_term_u6
FROM sm_w w LEFT JOIN sm_c c USING (split) CROSS JOIN sm_n
"""


# Hill tail-index (operators/tail.py:hill_tail_index): k=ceil(sqrt(N))
# scalar CTE (never a pasted literal), top-(k+1) order statistics,
# u6 ln diffs vs the (k+1)-th value (the k+1-th row contributes 0),
# positive-operand HUGEINT final DIV.
HILL_TAIL_SQL = """
WITH hl_b AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS y,
         o_orderkey AS k
  FROM orders WHERE round(o_totalprice * 100) > 0),
hl_n AS (SELECT count(*)::BIGINT AS n,
                CAST(ceil(sqrt(count(*)::DOUBLE)) AS BIGINT) AS kk
         FROM hl_b),
hl_t AS (
  SELECT y, row_number() OVER (ORDER BY y DESC, k ASC) AS rn
  FROM hl_b),
hl_top AS (SELECT t.y FROM hl_t t CROSS JOIN hl_n WHERE t.rn <= kk + 1),
hl_f AS (SELECT min(y) AS xk1 FROM hl_top),
hl_s AS (
  SELECT sum(CAST(round(ln(t.y) * 1000000) AS BIGINT)
             - CAST(round(ln(f.xk1) * 1000000) AS BIGINT)) AS s
  FROM hl_top t CROSS JOIN hl_f f)
SELECT n, kk AS k, CAST(s AS BIGINT) AS sum_ln_u6,
       CAST(CASE WHEN s = 0 THEN 0
                 ELSE (kk::HUGEINT * 1000000 * 1000000)
                      // CAST(s AS HUGEINT) END AS BIGINT) AS alpha_u6
FROM hl_n CROSS JOIN hl_s
"""


def uncertainty_topk_sql(k: int = 32) -> str:
    """Active-learning acquisition oracle (operators/perceptron.py:
    uncertainty_sample_topk): the shared averaged-perceptron prelude,
    docs scored under w1+w2+w3, smallest |score| first (doc_id
    tie-break), LIMIT k. No-token docs score 0 via the left join."""
    from sea_express_customs_etl_spark.plans.oracles_ext import (
        _PERC_PRELUDE,
    )

    return (
        "WITH "
        + _PERC_PRELUDE
        + f""",
us_w AS (SELECT w1.bucket, w1.w + w2.w + w3.w AS w
         FROM w1 JOIN w2 USING (bucket) JOIN w3 USING (bucket)),
us_s AS (SELECT c.doc_id, sum(us_w.w * c.c) AS s
         FROM cnt c JOIN us_w USING (bucket) GROUP BY 1),
us_a AS (
  SELECT d.doc_id, CAST(coalesce(s.s, 0) AS BIGINT) AS score,
         abs(CAST(coalesce(s.s, 0) AS BIGINT)) AS abs_score
  FROM documents d LEFT JOIN us_s s USING (doc_id))
SELECT doc_id, score, abs_score
FROM us_a ORDER BY abs_score, doc_id LIMIT {k}
"""
    )


def wordpiece_fertility_sql(
    n_merges: int = 8, rounds: int = 20, src: str = "documents"
) -> str:
    """Per-source WordPiece fertility oracle (operators/bpe.py:
    wordpiece_encode_pieces at distinct-word grain + a source-grain
    rollup): the SHARED WordPiece apply chain
    (oracles_r9.wordpiece_apply_ctes) with a source-carrying word
    table — pieces-per-word and multi-piece share per source (the
    BPE-fertility pairing for the WordPiece family)."""
    from sea_express_customs_etl_spark.plans.oracles_r9 import (
        wordpiece_apply_ctes,
    )

    ctes = wordpiece_apply_ctes(
        n_merges, rounds, src, "source", word_cte="wfw"
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT d.source,
       count(*)::BIGINT AS n_words,
       sum(e.pieces)::BIGINT AS n_pieces,
       (1000000 * sum(e.pieces)::BIGINT) // count(*)::BIGINT
           AS fert_u6,
       (1000000 * sum(CASE WHEN e.pieces > 1 THEN 1 ELSE 0 END)::BIGINT)
           // count(*)::BIGINT AS multi_ppm
FROM wfw d JOIN e{rounds} e USING (word) GROUP BY 1
"""
    )


# Corpus balance datacard (operators/textstats or entry-inline):
# per-source concentration — Herfindahl index, effective source
# count, max share — all exact integer rationals over HUGEINT.
CORPUS_BALANCE_SQL = """
WITH cb_c AS (
  SELECT source, count(*)::BIGINT AS c FROM documents GROUP BY 1),
cb_t AS (
  SELECT sum(c)::BIGINT AS n, sum(c::HUGEINT * c) AS c2,
         max(c)::BIGINT AS cmax, count(*)::BIGINT AS ns
  FROM cb_c)
SELECT ns AS n_sources, n AS n_docs,
       CAST((1000000::HUGEINT * c2) // (n::HUGEINT * n) AS BIGINT)
           AS hhi_u6,
       CAST((1000000::HUGEINT * n * n) // c2 AS BIGINT)
           AS effective_sources_u6,
       CAST((1000000::HUGEINT * cmax) // n AS BIGINT) AS max_share_ppm
FROM cb_t
"""


def psm_att_sql() -> str:
    """Caliper-matched ATT oracle (operators/psm.py:psm_att): the
    averaged-perceptron prelude scores every doc, treated = en;
    exact integer sd via the corrected-isqrt CTE chain (the Neyman
    pattern), caliper-bucket blocking with the b-1/b/b+1 attach, 1-NN
    by (|delta|, control score, control id), negate-first mean."""
    from sea_express_customs_etl_spark.plans.oracles_ext import (
        _PERC_PRELUDE,
    )

    return (
        "WITH "
        + _PERC_PRELUDE
        + """,
pm_w AS (SELECT w1.bucket, w1.w + w2.w + w3.w AS w
         FROM w1 JOIN w2 USING (bucket) JOIN w3 USING (bucket)),
pm_s AS (SELECT c.doc_id, sum(pm_w.w * c.c) AS s
         FROM cnt c JOIN pm_w USING (bucket) GROUP BY 1),
pm_b AS (
  SELECT d.doc_id AS id, (d.lang = 'en') AS t,
         CAST(coalesce(s.s, 0) AS BIGINT) AS s, d.n_chars AS y
  FROM documents d LEFT JOIN pm_s s USING (doc_id)),
pm_m AS (SELECT count(*)::BIGINT AS n, sum(s::DECIMAL(38,0)) AS ss,
                sum(s::DECIMAL(38,0) * s::DECIMAL(38,0)) AS ss2,
                min(s) AS smin
         FROM pm_b),
pm_v AS (SELECT smin,
                CAST(CAST(n::DECIMAL(38,0) * ss2 - ss * ss AS HUGEINT)
                     // (n::HUGEINT * n::HUGEINT) AS BIGINT) AS v
         FROM pm_m),
pm_sd AS (
  SELECT smin, s1 - (CASE WHEN s1 * s1 > v THEN 1 ELSE 0 END) AS sd
  FROM (SELECT smin, v,
               s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= v
                          THEN 1 ELSE 0 END) AS s1
        FROM (SELECT smin, v,
                     CAST(floor(sqrt(v::DOUBLE)) AS BIGINT) AS s0
              FROM pm_v))),
pm_c AS (SELECT smin, greatest(1, (2 * sd + 9) // 10) AS c
         FROM pm_sd),
pm_bb AS (SELECT b.*, (b.s - c.smin) // c.c AS bk, c.c
          FROM pm_b b CROSS JOIN pm_c c),
pm_t AS (SELECT id AS tid, s AS ts, y AS ty, bk AS tb, c
         FROM pm_bb WHERE t),
pm_ct AS (SELECT id AS cid, s AS cs, y AS cy, bk + g.o AS tb
          FROM pm_bb, (SELECT unnest([-1, 0, 1]) AS o) g
          WHERE NOT t),
pm_cand AS (
  SELECT t.tid, t.ts, t.ty, t.c, c2.cid, c2.cs, c2.cy
  FROM pm_t t JOIN pm_ct c2 USING (tb)
  WHERE abs(t.ts - c2.cs) <= t.c),
pm_nn AS (
  SELECT tid, ty, cy FROM (
    SELECT *, row_number() OVER (PARTITION BY tid
        ORDER BY abs(ts - cs), cs, cid) AS rn
    FROM pm_cand)
  WHERE rn = 1),
pm_st AS (SELECT count(*)::BIGINT AS n_matched,
                 CAST(coalesce(sum(ty - cy), 0) AS BIGINT) AS att_num
          FROM pm_nn),
pm_nt AS (SELECT count(*)::BIGINT AS n_treated FROM pm_b WHERE t)
SELECT n_treated, n_matched, CAST(c.c AS BIGINT) AS caliper_c, att_num,
       CAST(CASE WHEN n_matched = 0 THEN 0
                 WHEN att_num >= 0 THEN
                   (1000000::HUGEINT * att_num) // n_matched
                 ELSE -((1000000::HUGEINT * (-att_num)) // n_matched)
            END AS BIGINT) AS att_u6
FROM pm_nt CROSS JOIN pm_st CROSS JOIN pm_c c
"""
    )


def training_cartography_sql() -> str:
    """Dataset-cartography oracle (operators/perceptron.py:
    training_cartography): the exact perceptron-training prelude
    (w1/w2/w3 post-epoch snapshots, the statement the trained-model
    family hash-matches) re-scored per document per epoch; margins,
    confidence and variability numerators in HUGEINT; region by
    margin signs. Docs with no tokens score 0 every epoch."""
    from sea_express_customs_etl_spark.plans.oracles_ext import (
        _PERC_PRELUDE,
    )

    eps = "".join(
        f""",
cg{e} AS (SELECT c.doc_id, sum(w{e}.w * c.c) AS s
          FROM cnt c JOIN w{e} USING (bucket) GROUP BY 1)"""
        for e in (1, 2, 3)
    )
    return (
        "WITH "
        + _PERC_PRELUDE
        + eps
        + """,
cg_pm AS (SELECT doc_id,
                 CAST(CASE WHEN lang = 'en' THEN 1 ELSE -1 END
                      AS BIGINT) AS pm
          FROM documents),
cg_m AS (
  SELECT p.doc_id,
         p.pm * coalesce(c1.s, 0) AS m1,
         p.pm * coalesce(c2.s, 0) AS m2,
         p.pm * coalesce(c3.s, 0) AS m3
  FROM cg_pm p
  LEFT JOIN cg1 c1 USING (doc_id)
  LEFT JOIN cg2 c2 USING (doc_id)
  LEFT JOIN cg3 c3 USING (doc_id))
SELECT doc_id,
       CAST(m1 + m2 + m3 AS BIGINT) AS conf_num,
       CAST(3::HUGEINT * (m1::HUGEINT * m1 + m2::HUGEINT * m2
                          + m3::HUGEINT * m3)
            - (m1 + m2 + m3)::HUGEINT * (m1 + m2 + m3)
            AS BIGINT) AS var_num,
       CASE WHEN least(m1, m2, m3) > 0 THEN 'easy'
            WHEN greatest(m1, m2, m3) <= 0 THEN 'hard'
            ELSE 'ambiguous' END AS region
FROM cg_m
"""
    )


def domain_reweight_sql(rounds: int = 5, k_mult: int = 20_000_000) -> str:
    """Trajectory oracle for operators/reweight.py:domain_reweight_mw —
    every round threads the previous round's integer weights through a
    MATERIALIZED CTE (each is referenced twice: the weighted-mean agg
    and the cross-join; plain CTEs would inline to a 2^T expansion,
    the wordpiece rule). Weights are never pasted as literals."""
    parts = [
        f"""WITH dw_t AS MATERIALIZED (
  SELECT source AS domain, unnest({_LTOKS}) AS tok
  FROM documents),
dw_c AS MATERIALIZED (
  SELECT domain, tok, count(*)::BIGINT AS c FROM dw_t GROUP BY 1, 2),
dw_v AS MATERIALIZED (
  SELECT tok, sum(c)::BIGINT AS ct FROM dw_c GROUP BY 1),
dw_n AS MATERIALIZED (SELECT sum(ct)::BIGINT AS n FROM dw_v),
dw_l AS MATERIALIZED (
  SELECT domain, sum(c)::BIGINT AS n_tok,
         CAST(CAST(sum((c * (CAST(round(ln(n) * 1000000) AS BIGINT)
                             - CAST(round(ln(ct) * 1000000) AS BIGINT))
                       )::HUGEINT) AS HUGEINT)
              // CAST(sum(c) AS HUGEINT) AS BIGINT) AS loss_u6
  FROM dw_c JOIN dw_v USING (tok) CROSS JOIN dw_n
  GROUP BY 1),
dw_w0 AS MATERIALIZED (
  SELECT domain, n_tok, loss_u6,
         (1000000 // d)
           + (CASE WHEN rk <= 1000000 % d THEN 1 ELSE 0 END) AS w_ppm
  FROM (SELECT *, count(*) OVER () AS d,
               row_number() OVER (ORDER BY domain) AS rk
        FROM dw_l))"""
    ]
    for k in range(1, rounds + 1):
        p = k - 1
        parts.append(
            f""",
dw_s{k} AS MATERIALIZED (
  SELECT CAST(CAST(sum(w_ppm::HUGEINT * loss_u6) AS HUGEINT)
              // CAST(sum(w_ppm) AS HUGEINT) AS BIGINT) AS lbar
  FROM dw_w{p}),
dw_p{k} AS MATERIALIZED (
  SELECT domain, n_tok, loss_u6,
         w_ppm::HUGEINT
           * greatest({k_mult} + loss_u6 - lbar, 1)::HUGEINT AS p
  FROM dw_w{p} CROSS JOIN dw_s{k}),
dw_w{k} AS MATERIALIZED (
  SELECT domain, n_tok, loss_u6,
         base + (CASE WHEN row_number()
                           OVER (ORDER BY rem DESC, domain ASC)
                      <= 1000000 - sum(base) OVER ()
                      THEN 1 ELSE 0 END) AS w_ppm
  FROM (
    SELECT domain, n_tok, loss_u6,
           CAST((1000000::HUGEINT * p) // s AS BIGINT) AS base,
           1000000::HUGEINT * p - ((1000000::HUGEINT * p) // s) * s
               AS rem
    FROM (SELECT *, CAST(sum(p) OVER () AS HUGEINT) AS s
          FROM dw_p{k})))"""
        )
    parts.append(
        f"\nSELECT domain, n_tok, loss_u6, w_ppm FROM dw_w{rounds}"
    )
    return "".join(parts)
