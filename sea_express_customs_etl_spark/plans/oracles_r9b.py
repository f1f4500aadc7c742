"""Round-9 second-chunk oracles: the ADC-store holdout classifier."""

from __future__ import annotations


def knn_adc_vote_sql(k: int = 5) -> str:
    """ADC holdout-kNN oracle (operators/knn_adc.py): the trained-
    IVFPQ ADC template (the exact statement the shared store hash-
    matches) re-targeted — queries become ALL odd vec_ids, the store
    side is scoped to even vec_ids (the ANN_STORE_DELETE_TOPK
    restriction mechanism), then the majority vote + label join of
    knn_label_vote_sql. Codebook training keeps the shared-model
    sample (label-free compression — no label leakage); the candidate
    scope enforces train/test separation."""
    from sea_express_customs_etl_spark.plans.oracles_ext import (
        _IVFPQ_TRAINED_TMPL,
    )

    adc = (
        _IVFPQ_TRAINED_TMPL.replace("__TOPK__", str(k), 1)
        .replace(
            "q AS (SELECT vec_id AS query_id, v FROM base WHERE vec_id < 10)",
            "q AS (SELECT vec_id AS query_id, v FROM base"
            " WHERE vec_id % 2 = 1)",
            1,
        )
        .replace(
            "WHERE e.vec_id <> l.query_id",
            "WHERE e.vec_id <> l.query_id AND e.vec_id % 2 = 0",
            1,
        )
    )
    return f"""
WITH ka_nn AS ({adc}),
ka_v AS (
  SELECT n.query_id, e.label AS nl, count(*) AS c
  FROM ka_nn n JOIN embeddings e ON e.vec_id = n.neighbor_id
  GROUP BY 1, 2),
ka_p AS (
  SELECT query_id, nl AS pred_label FROM (
    SELECT query_id, nl,
           row_number() OVER (PARTITION BY query_id
               ORDER BY c DESC, nl) AS rn
    FROM ka_v)
  WHERE rn = 1)
SELECT p.query_id AS vec_id,
       CAST(p.pred_label AS INTEGER) AS pred_label,
       CAST(e.label AS INTEGER) AS true_label,
       CAST(CASE WHEN p.pred_label = e.label THEN 1 ELSE 0 END
            AS INTEGER) AS correct
FROM ka_p p JOIN embeddings e ON e.vec_id = p.query_id
"""


def isotonic_calibration_sql() -> str:
    """Isotonic calibration oracle (operators/isotonic.py): the
    classifier reliability deciles (the exact CLASSIFIER_DECILES_SQL
    statement, nested) fed through the minimax closed form at bucket
    grain — u6-rounded pooled rates, integer comparisons only."""
    from sea_express_customs_etl_spark.plans.oracles_ext import (
        CLASSIFIER_DECILES_SQL,
    )

    return f"""
WITH ic_d AS ({CLASSIFIER_DECILES_SQL}),
ic_r AS (
  SELECT j.bucket AS jj, k.bucket AS kk,
         CAST((1000000 * sum(b.n_pos)) // sum(b.n_rows) AS BIGINT)
             AS rate
  FROM ic_d j, ic_d k, ic_d b
  WHERE j.bucket <= k.bucket
    AND b.bucket BETWEEN j.bucket AND k.bucket
  GROUP BY 1, 2),
ic_i AS (
  SELECT d.bucket, r.jj, min(r.rate) AS mn
  FROM ic_d d JOIN ic_r r ON r.jj <= d.bucket AND r.kk >= d.bucket
  GROUP BY 1, 2),
ic_iso AS (SELECT bucket, max(mn) AS iso FROM ic_i GROUP BY 1)
SELECT d.bucket, d.n_rows, d.n_pos, d.pos_ppm,
       CAST(i.iso AS BIGINT) AS iso_ppm
FROM ic_d d JOIN ic_iso i USING (bucket)
"""


def split_conformal_sql(alpha_ppm: int = 100_000) -> str:
    """Split-conformal coverage oracle (operators/conformal.py):
    OLS moments on even uids, exact scaled residuals, k-th order
    statistic (ceil((1-a)(n+1)), capped), held-out coverage. All
    HUGEINT; uid = l_orderkey*8 + l_linenumber (linenumber parity
    mixes both halves)."""
    keep = 1_000_000 - alpha_ppm
    return f"""
WITH cf_b AS (
  SELECT l_orderkey * 8 + l_linenumber AS uid,
         CAST(floor(l_quantity * 100) AS BIGINT) AS x,
         CAST(floor(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem),
cf_cal AS (SELECT * FROM cf_b WHERE uid % 2 = 0),
cf_m AS (
  SELECT count(*)::HUGEINT AS n, sum(x)::HUGEINT AS s,
         sum(y)::HUGEINT AS t, sum(x * y)::HUGEINT AS sxy,
         sum(x * x)::HUGEINT AS sxx
  FROM cf_cal),
cf_mm AS (
  SELECT n, n * sxy - s * t AS cxy, n * sxx - s * s AS cxx, s, t
  FROM cf_m),
cf_cr AS (
  SELECT c.uid,
         abs(m.n * m.cxx * c.y
             - (m.n * m.cxy * c.x + (m.t * m.cxx - m.s * m.cxy)))
             AS rs
  FROM cf_cal c, cf_mm m),
cf_rk AS (
  SELECT rs, row_number() OVER (ORDER BY rs, uid) AS gr FROM cf_cr),
cf_k AS (
  SELECT CAST(n AS BIGINT) AS n_cal,
         least(CAST(n AS BIGINT),
               ((CAST(n AS BIGINT) + 1) * {keep} + 999999) // 1000000)
             AS k_rank
  FROM cf_mm),
cf_q AS (
  SELECT k.n_cal, k.k_rank, r.rs AS q
  FROM cf_rk r, cf_k k WHERE r.gr = k.k_rank),
cf_tr AS (
  SELECT abs(m.n * m.cxx * b.y
             - (m.n * m.cxy * b.x + (m.t * m.cxx - m.s * m.cxy)))
             AS rs,
         m.n * m.cxx AS dden
  FROM cf_b b, cf_mm m WHERE b.uid % 2 = 1)
SELECT q.n_cal,
       count(*)::BIGINT AS n_test,
       q.k_rank,
       CAST(q.q // max(t.dden) AS BIGINT) AS qhat_c,
       sum(CASE WHEN t.rs <= q.q THEN 1 ELSE 0 END)::BIGINT AS covered,
       CAST((1000000 * sum(CASE WHEN t.rs <= q.q THEN 1 ELSE 0 END))
            // count(*) AS BIGINT) AS coverage_ppm
FROM cf_tr t, cf_q q
GROUP BY q.n_cal, q.k_rank, q.q
"""


# Theil-Sen robust slope per event type (operators/theilsen.py): the
# median pairwise slope on the Mann-Kendall hour-bucket spine —
# u6-rounded signed slopes, lower-median order statistic, exact ranks.
THEIL_SEN_SQL = """
WITH ts_b AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h,
         CAST(round(value * 1000) AS BIGINT) AS v3
  FROM events),
ts_hb AS MATERIALIZED (
  SELECT event_type, h, sum(v3)::BIGINT AS s3 FROM ts_b GROUP BY 1, 2),
ts_p AS (
  SELECT a.event_type, a.h AS hi, c.h AS hj,
         CAST(CASE WHEN (c.s3 - a.s3) >= 0
              THEN ((c.s3 - a.s3) * 1000000) // (c.h - a.h)
              ELSE -(((a.s3 - c.s3) * 1000000) // (c.h - a.h))
              END AS BIGINT) AS sl
  FROM ts_hb a JOIN ts_hb c
    ON a.event_type = c.event_type AND a.h < c.h),
ts_r AS (
  SELECT event_type, sl,
         row_number() OVER (PARTITION BY event_type
             ORDER BY sl, hi, hj) AS rn,
         count(*) OVER (PARTITION BY event_type) AS np
  FROM ts_p),
ts_m AS (
  SELECT event_type, CAST(np AS BIGINT) AS n_pairs, sl AS slope_u6
  FROM ts_r WHERE rn = (np + 1) // 2),
ts_n AS (SELECT event_type, count(*)::INTEGER AS n_buckets
         FROM ts_hb GROUP BY 1)
SELECT n.event_type, n.n_buckets, m.n_pairs, m.slope_u6
FROM ts_n n JOIN ts_m m USING (event_type)
"""


def conformal_label_sets_sql(alpha_ppm: int = 100_000) -> str:
    """Conformal classification oracle (operators/conformal_cls.py):
    the perceptron scoring prelude (the CLASSIFIER_DECILES chain),
    signed-margin nonconformity on even doc_ids, exact k-th order
    statistic, per-label set membership + coverage + set-size
    histogram on the odd half."""
    from sea_express_customs_etl_spark.plans.oracles_ext import (
        _PERC_PRELUDE,
    )

    keep = 1_000_000 - alpha_ppm
    return (
        "WITH "
        + _PERC_PRELUDE
        + f""",
cc_sc AS (SELECT c.doc_id, sum(w3.w * c.c) AS score
          FROM cnt c JOIN w3 USING (bucket) GROUP BY 1),
cc_p AS (SELECT d.doc_id, coalesce(sc.score, 0) AS s,
                CASE WHEN d.lang = 'en' THEN 1 ELSE -1 END AS y
         FROM documents d LEFT JOIN cc_sc sc USING (doc_id)),
cc_cal AS (SELECT doc_id, -y * s AS a FROM cc_p WHERE doc_id % 2 = 0),
cc_rk AS (SELECT a, row_number() OVER (ORDER BY a, doc_id) AS gr
          FROM cc_cal),
cc_n AS (SELECT count(*)::BIGINT AS n_cal FROM cc_cal),
cc_k AS (SELECT n_cal,
                least(n_cal,
                      ((n_cal + 1) * {keep} + 999999) // 1000000)
                    AS k_rank
         FROM cc_n),
cc_q AS (SELECT k.n_cal, k.k_rank, r.a AS q
         FROM cc_rk r, cc_k k WHERE r.gr = k.k_rank),
cc_t AS (SELECT y, s,
                CASE WHEN -s <= q THEN 1 ELSE 0 END AS in_pos,
                CASE WHEN s <= q THEN 1 ELSE 0 END AS in_neg,
                q, n_cal, k_rank
         FROM (SELECT y, s FROM cc_p WHERE doc_id % 2 = 1), cc_q)
SELECT n_cal, count(*)::BIGINT AS n_test, k_rank,
       CAST(q AS BIGINT) AS q_score,
       sum(CASE WHEN y > 0 THEN in_pos ELSE in_neg END)::BIGINT
           AS covered,
       CAST((1000000 * sum(CASE WHEN y > 0 THEN in_pos
                                ELSE in_neg END)) // count(*)
            AS BIGINT) AS coverage_ppm,
       sum(CASE WHEN in_pos + in_neg = 2 THEN 1 ELSE 0 END)::BIGINT
           AS n_both,
       sum(CASE WHEN in_pos + in_neg = 1 THEN 1 ELSE 0 END)::BIGINT
           AS n_single,
       sum(CASE WHEN in_pos + in_neg = 0 THEN 1 ELSE 0 END)::BIGINT
           AS n_empty
FROM cc_t GROUP BY n_cal, k_rank, q
"""
    )


def kmeans_label_ari_sql() -> str:
    """ARI oracle (operators/clustereval.py): the KMEANS_Q training
    prelude (k=4, iters=2, full corpus — the same model the Spark
    side trains) → exact-L2 argmin assignment → contingency pair
    sums → one signed HUGEINT rational, zero-denominator guarded."""
    from sea_express_customs_etl_spark.plans.oracles_ext import (
        _KMQ_D2,
        _KMQ_PRELUDE,
    )

    return f"""
WITH {_KMQ_PRELUDE},
ar_asg AS (
  SELECT vec_id, cluster FROM (
    SELECT q.vec_id, c.cluster,
           row_number() OVER (PARTITION BY q.vec_id ORDER BY
               {_KMQ_D2.format(a='q.v', b='c.v')}, c.cluster) AS rn
    FROM q, cent2 c)
  WHERE rn = 1),
ar_c AS MATERIALIZED (
  SELECT a.cluster AS cl, e.label AS lb, count(*)::HUGEINT AS nij
  FROM ar_asg a JOIN embeddings e USING (vec_id) GROUP BY 1, 2),
ar_sij AS (
  SELECT sum((nij * (nij - 1)) // 2) AS s_ij, sum(nij) AS n
  FROM ar_c),
ar_sa AS (
  SELECT sum((ai * (ai - 1)) // 2) AS s_a,
         count(*)::INTEGER AS k_clusters
  FROM (SELECT cl, sum(nij) AS ai FROM ar_c GROUP BY 1)),
ar_sb AS (
  SELECT sum((bj * (bj - 1)) // 2) AS s_b,
         count(*)::INTEGER AS n_labels
  FROM (SELECT lb, sum(nij) AS bj FROM ar_c GROUP BY 1)),
ar_f AS (
  SELECT n, k_clusters, n_labels, s_ij, s_a, s_b,
         2 * (((n * (n - 1)) // 2) * s_ij - s_a * s_b) * 1000000
             AS num,
         ((n * (n - 1)) // 2) * (s_a + s_b) - 2 * s_a * s_b AS den
  FROM ar_sij, ar_sa, ar_sb)
SELECT CAST(n AS BIGINT) AS n, k_clusters, n_labels,
       CAST(s_ij AS BIGINT) AS s_ij, CAST(s_a AS BIGINT) AS s_a,
       CAST(s_b AS BIGINT) AS s_b,
       CAST(CASE WHEN den = 0 THEN 0
                 WHEN num >= 0 THEN num // den
                 ELSE -((-num) // den) END AS BIGINT) AS ari_u6
FROM ar_f
"""


def fs_em_sql(
    rounds: int = 3,
    p0: int = 100_000,
    m0: int = 900_000,
    u0: int = 100_000,
) -> str:
    """Fellegi-Sunter EM oracle (operators/fellegi_sunter.py): the
    brand-blocked gamma pairs, then every EM round unrolled — per-pair
    posterior as one HUGEINT rational, u6-scaled M-step DIVs with the
    same [1, 999999] clamps — parameters threaded round to round
    through MATERIALIZED CTEs (fs_g and each fs_p{t} are referenced
    by two consumers)."""
    feats = ["1", "2", "3", "4"]
    clamp = "least(999999::HUGEINT, greatest(1::HUGEINT, {x}))"
    stages = [
        """fs_g AS MATERIALIZED (
  SELECT CASE WHEN a.p_size = b.p_size THEN 1 ELSE 0 END AS g1,
         CASE WHEN a.p_type = b.p_type THEN 1 ELSE 0 END AS g2,
         CASE WHEN string_split(a.p_name, ' ')[1]
                 = string_split(b.p_name, ' ')[1]
              THEN 1 ELSE 0 END AS g3,
         CASE WHEN CAST(floor(a.p_retailprice) AS BIGINT) // 10
                 = CAST(floor(b.p_retailprice) AS BIGINT) // 10
              THEN 1 ELSE 0 END AS g4
  FROM part a JOIN part b
    ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey)""",
        f"""fs_p0 AS (SELECT {p0}::HUGEINT AS p,
  {', '.join(f'{m0}::HUGEINT AS m{f}' for f in feats)},
  {', '.join(f'{u0}::HUGEINT AS u{f}' for f in feats)})""",
    ]
    for t in range(1, rounds + 1):
        tprod = " * ".join(
            f"(CASE WHEN g.g{f} = 1 THEN p.m{f}"
            f" ELSE 1000000 - p.m{f} END)"
            for f in feats
        )
        sprod = " * ".join(
            f"(CASE WHEN g.g{f} = 1 THEN p.u{f}"
            f" ELSE 1000000 - p.u{f} END)"
            for f in feats
        )
        swgs = ", ".join(
            f"sum(w * g{f})::HUGEINT AS swg{f}, "
            f"sum((1000000 - w) * g{f})::HUGEINT AS svg{f}"
            for f in feats
        )
        ms = ", ".join(
            clamp.format(x=f"(swg{f} * 1000000) // greatest(sw, 1)")
            + f" AS m{f}"
            for f in feats
        )
        us = ", ".join(
            clamp.format(
                x=f"(svg{f} * 1000000)"
                " // greatest(n * 1000000 - sw, 1)"
            )
            + f" AS u{f}"
            for f in feats
        )
        stages.append(f"""fs_w{t} AS (
  SELECT g.g1, g.g2, g.g3, g.g4,
         (p.p * {tprod} * 1000000)
             // (p.p * {tprod}
                 + (1000000 - p.p) * {sprod}) AS w
  FROM fs_g g, fs_p{t - 1} p),
fs_s{t} AS (
  SELECT count(*)::HUGEINT AS n, sum(w)::HUGEINT AS sw, {swgs}
  FROM fs_w{t}),
fs_p{t} AS MATERIALIZED (
  SELECT {clamp.format(x='sw // n')} AS p, {ms}, {us}
  FROM fs_s{t})""")
    finals = " UNION ALL ".join(
        f"SELECT {t} AS round, {f} AS feature,"
        f" CAST(m{f} AS BIGINT) AS m_u6, CAST(u{f} AS BIGINT) AS u_u6,"
        f" CAST(p AS BIGINT) AS p_u6 FROM fs_p{t}"
        for t in range(1, rounds + 1)
        for f in feats
    )
    return "WITH " + ",\n".join(stages) + "\n" + finals
