"""DuckDB oracle for the end-to-end pretraining-data flagship
(``plans/pretrain_e2e.py``): ONE statement nesting every stage's
already-checked oracle fragment —

  pe_quar (integrity quarantine) → gate CTEs (CURATION_PIPELINE_SQL's
  Gopher rules) → pe_ex/pe_ed (exact dedup) → sh/sig/band/pairs/vp
  (the shared MinHash-LSH + Jaccard fragments, used once so the shared
  names stay collision-free) ∪ pe_rp* (SRP embedding pairs, prefixed
  copy of SRP_NEAR_DUPS_SQL's fragments — its ``sig`` would collide
  with the MinHash ``sig``) → pe_cedges/pe_reach/pe_comp (recursive
  components over the UNION) → pe_keep → pe_sh5c/pe_shb + pe_clean
  (DECONTAM_SQL's 5-gram benchmark overlap) → pe_um* (UNIMAX_SQL with
  the literal budget replaced by a data-derived scalar CTE — 70 % of
  clean survivors, the knn_label_vote LIMIT-subquery rule) → pe_sel
  (per-source md5-rank draw) → v0/p{k}/m{k} (bpe_stage_ctes over
  pe_sel, MATERIALIZED — the m{k} winners feed train AND encode, the
  wordpiece 3^k lesson) → bwd/be{k}/bpieces (learned-merge encode) →
  pe_tok/pe_packed (512-token greedy pack per doc_id%8 shard) →
  per-(shard, bin) manifest.

No literal in the statement is data-dependent: the learned merges, the
budget, and every allocation stay CTE values, so the hash checks the
full trajectory of the pipeline, not a replayed answer.
"""

from __future__ import annotations

from sea_express_customs_etl_spark.plans.oracles_ext import (
    _BANDS,
    _BIGRAMS,
    _CCOMP,
    _PAIRS,
    _SIG,
    _TOKS,
    _VPAIRS,
    _sh_over,
    bpe_stage_ctes,
)

PACK_LEN = 512
N_SHARDS = 8
N_MERGES = 10

_RP_PLANES, _RP_BANDS = 16, 4  # SRP planes, LSH bands (of 4 bits each)
_RP_R = _RP_PLANES // _RP_BANDS

_SHARE_BAND = " OR ".join(
    f"((a.srp >> {b * _RP_R}) & {(1 << _RP_R) - 1}) = "
    f"((b.srp >> {b * _RP_R}) & {(1 << _RP_R) - 1})"
    for b in range(4)
)

# prefixed copy of oracles_ext._RP_BASE + SRP signature/verify chain,
# restricted to the exact-dedup survivors (pe_ed) — `sig`/`e`/`w`
# would collide with the MinHash fragments above
_RP_CTES = f"""
pe_rpe AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(round(x * 1000000) AS BIGINT)) AS v
  FROM embeddings
  WHERE vec_id IN (SELECT doc_id FROM pe_ed)),
pe_rpw AS (
  SELECT p.p, d.d,
         CASE WHEN (instr('0123456789abcdef',
                    substr(md5('rp_' || p.p || '_' || d.d), 1, 1)) - 1) % 2 = 0
              THEN 1 ELSE -1 END AS w
  FROM (SELECT unnest(generate_series(0, 15)) AS p) p,
       (SELECT unnest(generate_series(0, 63)) AS d) d),
pe_rpx AS (
  SELECT vec_id, d.d AS d, v[d.d + 1] AS val
  FROM pe_rpe, (SELECT unnest(generate_series(0, 63)) AS d) d),
pe_rpp AS (
  SELECT vec_id, p, sum(val * w) AS s
  FROM pe_rpx JOIN pe_rpw USING (d) GROUP BY vec_id, p),
pe_rsig AS (
  SELECT vec_id,
         CAST(sum(CASE WHEN s >= 0 THEN (1::BIGINT << p) ELSE 0 END)
              AS BIGINT) AS srp
  FROM pe_rpp GROUP BY vec_id),
pe_rn AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS nv,
         sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                 CAST(embedding AS DOUBLE[]))) AS nn
  FROM embeddings
  WHERE vec_id IN (SELECT doc_id FROM pe_ed)),
pe_spairs AS (
  SELECT c.id_a, c.id_b
  FROM (SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM pe_rsig a JOIN pe_rsig b ON a.vec_id < b.vec_id
        WHERE {_SHARE_BAND}) c
  JOIN pe_rn na ON na.vec_id = c.id_a
  JOIN pe_rn nb ON nb.vec_id = c.id_b
  WHERE round(list_inner_product(na.nv, nb.nv) / (na.nn * nb.nn), 6)
        >= 0.4)
"""

# components over the UNION of text + embedding pair signals —
# _CCOMP's shape with `vp` swapped for the union CTE
_PE_CCOMP = """
pe_up AS (SELECT id_a, id_b FROM vp
          UNION SELECT id_a, id_b FROM pe_spairs),
pe_cedges AS (SELECT id_a AS src, id_b AS dst FROM pe_up
              UNION ALL SELECT id_b, id_a FROM pe_up),
pe_reach(src, dst) AS (
  SELECT src, dst FROM pe_cedges
  UNION
  SELECT r.src, e.dst FROM pe_reach r JOIN pe_cedges e ON r.dst = e.src),
pe_comp AS (SELECT src AS id, least(src, min(dst)) AS cluster_id
            FROM pe_reach GROUP BY src)
"""

# UNIMAX_SQL with the fixed budget-700 literal replaced by the scalar
# CTE pe_b (70 % of clean survivors) cross-joined through the chain
_PE_UNIMAX = """
pe_b AS MATERIALIZED (SELECT (count(*) * 7) // 10 AS b FROM pe_clean),
pe_cnt AS (
  SELECT source, count(*)::BIGINT AS n_rows FROM pe_clean GROUP BY source),
pe_ums AS (
  SELECT source, n_rows, 2 * n_rows AS cap,
         row_number() OVER (ORDER BY n_rows, source) AS i,
         count(*) OVER () AS n,
         coalesce(sum(2 * n_rows) OVER (ORDER BY n_rows, source
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS cum_prev
  FROM pe_cnt),
pe_umc AS (
  SELECT s.*, CASE WHEN s.cap * (s.n - s.i + 1) <= pb.b - s.cum_prev
                   THEN 1 ELSE 0 END AS cond
  FROM pe_ums s CROSS JOIN pe_b pb),
pe_umcc AS (
  SELECT *, min(cond) OVER (ORDER BY i
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS is_capped
  FROM pe_umc),
pe_umt AS (
  SELECT *, sum(is_capped) OVER () AS t_capped,
         sum(is_capped * cap) OVER () AS cap_sum
  FROM pe_umcc),
pe_alloc AS MATERIALIZED (
  SELECT t.source,
         CASE WHEN t.is_capped = 1 THEN t.cap
              WHEN t.n - t.t_capped <= 0 THEN t.cap
              ELSE (pb.b - t.cap_sum) // (t.n - t.t_capped)
                   + (CASE WHEN (t.i - t.t_capped)
                               <= (pb.b - t.cap_sum) % (t.n - t.t_capped)
                           THEN 1 ELSE 0 END)
         END AS alloc
  FROM pe_umt t CROSS JOIN pe_b pb)
"""


def _pe2e_with() -> str:
    """The shared WITH-chain through pe_packed — one source of truth
    for the manifest AND datacard finals (drift-proof by construction).
    Plain CTEs the datacard never references (pe_packed) stay lazy;
    everything multiply-referenced is MATERIALIZED."""
    stages = bpe_stage_ctes(N_MERGES, "pe_sel", materialized=True)
    s = chr(31)
    enc = [
        f"""bwd AS MATERIALIZED (
  SELECT doc_id, w FROM (
    SELECT doc_id,
           unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
    FROM pe_sel)
  WHERE w <> ''),
be0 AS MATERIALIZED (
  SELECT w,
         '{s}' || array_to_string(
             list_append(regexp_split_to_array(w, ''), '</w>'),
             '{s}{s}') || '{s}' AS enc
  FROM (SELECT DISTINCT w FROM bwd))"""
    ]
    for k in range(1, N_MERGES + 1):
        enc.append(f"""be{k} AS MATERIALIZED (
  SELECT w,
         replace(enc, '{s}' || m.l || '{s}{s}' || m.r || '{s}',
                 '{s}' || m.l || m.r || '{s}') AS enc
  FROM be{k - 1} CROSS JOIN m{k} m)""")
    bpe = ",\n".join(stages + enc)
    return f"""
WITH RECURSIVE pe_quar AS MATERIALIZED (
  SELECT doc_id, text, source FROM documents
  WHERE length(trim(text)) > 0 AND lang IS NOT NULL
    AND n_chars = length(text)),
pe_qb AS (
  SELECT doc_id, toks, no_ws, {_BIGRAMS} AS bg FROM (
    SELECT doc_id, {_TOKS} AS toks,
           length(regexp_replace(text, '\\s', '', 'g')) AS no_ws
    FROM pe_quar)),
pe_qm AS (
  SELECT doc_id,
         CAST(len(toks) AS INTEGER) AS n_words,
         round(no_ws / len(toks), 4) AS avg_word_len,
         round((len(toks) - len(list_distinct(toks))) / len(toks), 4)
             AS dup_word_frac,
         CASE WHEN len(bg) > 0
              THEN round(list_max(list_transform(list_distinct(bg),
                       d -> len(list_filter(bg, x -> x = d)))) / len(bg), 4)
              ELSE 0.0 END AS top_bigram_frac
  FROM pe_qb),
pe_gate AS (
  SELECT doc_id FROM pe_qm
  WHERE n_words >= 40 AND n_words <= 100000
    AND avg_word_len >= 3.0 AND avg_word_len <= 10.0
    AND dup_word_frac <= 0.6 AND top_bigram_frac <= 0.05),
pe_pd AS MATERIALIZED (SELECT d.doc_id, d.text, d.source
          FROM pe_quar d JOIN pe_gate USING (doc_id)),
pe_ex AS (SELECT min(doc_id) AS doc_id FROM pe_pd GROUP BY md5(text)),
pe_ed AS MATERIALIZED (SELECT p.doc_id, p.text, p.source FROM pe_pd p
          JOIN pe_ex USING (doc_id)),
{_sh_over('pe_ed')}, {_SIG}, {_BANDS}, {_PAIRS}, {_VPAIRS},
{_RP_CTES}, {_PE_CCOMP},
pe_keep AS MATERIALIZED (
  SELECT e.doc_id, e.text, e.source
  FROM pe_ed e LEFT JOIN pe_comp c ON c.id = e.doc_id
  WHERE coalesce(c.cluster_id, e.doc_id) = e.doc_id),
pe_corpus AS MATERIALIZED (SELECT * FROM pe_keep WHERE doc_id % 50 != 0),
pe_evalset AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 = 0),
{_sh_over('pe_corpus', n=5, cte='pe_sh5c')},
{_sh_over('pe_evalset', n=5, cte='pe_shb')},
pe_bgrams AS (SELECT DISTINCT shingle FROM pe_shb),
pe_ov AS (
  SELECT s.doc_id, count(*) AS n_overlap
  FROM pe_sh5c s JOIN pe_bgrams USING (shingle)
  GROUP BY 1),
pe_clean AS MATERIALIZED (
  SELECT c.doc_id, c.text, c.source
  FROM pe_corpus c LEFT JOIN pe_ov o USING (doc_id)
  WHERE coalesce(o.n_overlap, 0) = 0),
{_PE_UNIMAX},
pe_sel AS MATERIALIZED (
  SELECT doc_id, text, source FROM (
    SELECT c.doc_id, c.text, c.source, a.alloc,
           row_number() OVER (PARTITION BY c.source ORDER BY
               md5(CAST(c.doc_id AS VARCHAR)), c.doc_id) AS rk
    FROM pe_clean c JOIN pe_alloc a USING (source))
  WHERE rk <= alloc),
{bpe},
bpieces AS MATERIALIZED (
  SELECT w,
         CAST(len(string_split(trim(enc, '{s}'), '{s}{s}')) AS BIGINT)
             AS n
  FROM be{N_MERGES}),
pe_ntok AS (
  SELECT d.doc_id, CAST(sum(p.n) AS BIGINT) AS n_tokens
  FROM bwd d JOIN bpieces p USING (w) GROUP BY 1),
pe_packed AS (
  SELECT CAST(doc_id % {N_SHARDS} AS INTEGER) AS shard, n_tokens,
         sum(n_tokens) OVER (PARTITION BY doc_id % {N_SHARDS}
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ROWS UNBOUNDED PRECEDING) AS cum
  FROM pe_ntok)"""


def pretrain_e2e_sql() -> str:
    return (
        _pe2e_with()
        + f"""
SELECT shard,
       CAST((cum - n_tokens) // {PACK_LEN} AS INTEGER) AS bin_id,
       count(*)::BIGINT AS n_docs,
       sum(n_tokens)::BIGINT AS n_tokens
FROM pe_packed
GROUP BY 1, 2
"""
    )


def pretrain_e2e_datacard_sql() -> str:
    """Per-source stage funnel over the SAME WITH-chain the manifest
    uses — raw → gated → exact → kept → clean → alloc → selected →
    tokens; missing sources coalesce to 0 (a source the gate or the
    mix zeroed out still reports its raw count)."""
    return (
        _pe2e_with()
        + """,
dc_raw AS (SELECT source, count(*)::BIGINT AS n_raw
           FROM documents GROUP BY 1),
dc_g AS (SELECT source, count(*)::BIGINT AS c FROM pe_pd GROUP BY 1),
dc_e AS (SELECT source, count(*)::BIGINT AS c FROM pe_ed GROUP BY 1),
dc_k AS (SELECT source, count(*)::BIGINT AS c FROM pe_keep GROUP BY 1),
dc_c AS (SELECT source, count(*)::BIGINT AS c FROM pe_clean GROUP BY 1),
dc_s AS (SELECT source, count(*)::BIGINT AS c FROM pe_sel GROUP BY 1),
dc_t AS (
  SELECT s.source, sum(t.n_tokens)::BIGINT AS c
  FROM pe_ntok t JOIN pe_sel s USING (doc_id) GROUP BY 1)
SELECT r.source, r.n_raw,
       coalesce(g.c, 0) AS n_gated,
       coalesce(e.c, 0) AS n_exact,
       coalesce(k.c, 0) AS n_kept,
       coalesce(c.c, 0) AS n_clean,
       CAST(coalesce(a.alloc, 0) AS BIGINT) AS alloc,
       coalesce(s.c, 0) AS n_selected,
       coalesce(t.c, 0) AS n_tokens
FROM dc_raw r
LEFT JOIN dc_g g USING (source)
LEFT JOIN dc_e e USING (source)
LEFT JOIN dc_k k USING (source)
LEFT JOIN dc_c c USING (source)
LEFT JOIN pe_alloc a USING (source)
LEFT JOIN dc_s s USING (source)
LEFT JOIN dc_t t USING (source)
"""
    )
