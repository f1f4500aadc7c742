"""Ranked-retrieval eval operators (operators/retrieval_eval.py):
graded/binary truth derivation, exact nDCG/AP/RR arithmetic against a
hand-computed python mirror, and the fixed-literal discount table's
provenance."""

from __future__ import annotations

import math

from sea_express_customs_etl_spark.operators.retrieval_eval import (
    NDCG_DISC_PPM,
    binary_truth,
    dcg_ppm,
    graded_truth,
    ideal_dcg_ppm,
    map_mrr,
)

QUERIES = (("q1", ("apple", "banana")),)

DOCS = [
    # d1: both terms, banana twice -> gain 3; relevant at min_tf=1 only
    (1, "apple banana banana cherry"),
    # d2: apple only -> gain 1
    (2, "apple cherry cherry"),
    # d3: both terms x4 -> gain 3; the only min_tf=4 relevant doc
    (3, "apple apple apple apple banana banana banana banana"),
    # d4: neither -> absent from truth
    (4, "cherry date cherry"),
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_disc_table_is_rounded_log2(spark):
    assert NDCG_DISC_PPM == tuple(
        round(1_000_000 / math.log2(r + 1)) for r in range(1, 11)
    )


def test_graded_and_binary_truth(spark):
    g = {
        (r.query_id, r.doc_id): r.gain
        for r in graded_truth(_docs_df(spark), QUERIES).collect()
    }
    assert g == {("q1", 1): 3, ("q1", 2): 1, ("q1", 3): 3}
    b = {
        (r.query_id, r.doc_id)
        for r in binary_truth(_docs_df(spark), QUERIES, min_tf=4).collect()
    }
    assert b == {("q1", 3)}
    b1 = {
        (r.query_id, r.doc_id)
        for r in binary_truth(_docs_df(spark), QUERIES, min_tf=1).collect()
    }
    assert b1 == {("q1", 1), ("q1", 3)}


def test_dcg_ap_rr_match_hand_math(spark):
    # system ranking: d2 (gain 1), d4 (gain 0), d3 (gain 3)
    ranked = spark.createDataFrame(
        [("q1", 2, 1), ("q1", 4, 2), ("q1", 3, 3)],
        "query_id string, doc_id long, rank int",
    )
    truth = graded_truth(_docs_df(spark), QUERIES)
    got = dcg_ppm(ranked, truth, "sys").collect()[0]
    want_dcg = 1 * NDCG_DISC_PPM[0] + 0 + 3 * NDCG_DISC_PPM[2]
    assert (got.ranker, got.dcg_ppm) == ("sys", want_dcg)

    ideal = ideal_dcg_ppm(truth, k=10).collect()[0]
    # ideal order: d1 (3), d3 (3), d2 (1) — gain DESC, doc_id ASC
    want_ideal = (
        3 * NDCG_DISC_PPM[0] + 3 * NDCG_DISC_PPM[1] + 1 * NDCG_DISC_PPM[2]
    )
    assert ideal.idcg_ppm == want_ideal

    # binary truth at min_tf=1: relevant {d1, d3}; ranking hits d3 at
    # rank 3 only -> AP = (1/2)·(1/3), RR = 1/3
    rel = binary_truth(_docs_df(spark), QUERIES, min_tf=1)
    m = map_mrr(ranked, rel, "sys").collect()[0]
    assert m.n_rel == 2
    assert m.ap_u6 == (1_000_000 * ((2520 * 1) // 3)) // (2520 * 2)
    assert m.rr_u6 == 1_000_000 // 3

    # no relevant docs retrieved -> both metrics 0, not a crash
    rel4 = binary_truth(_docs_df(spark), QUERIES, min_tf=4)
    ranked_miss = spark.createDataFrame(
        [("q1", 2, 1), ("q1", 4, 2)],
        "query_id string, doc_id long, rank int",
    )
    mm = map_mrr(ranked_miss, rel4, "sys").collect()[0]
    assert (mm.ap_u6, mm.rr_u6, mm.n_rel) == (0, 0, 1)


def test_rbo_identity_disjoint_and_partial(spark):
    from sea_express_customs_etl_spark.operators.retrieval_eval import (
        RBO10_DENOM,
        RBO10_SUFFIX_W,
        rbo_overlap,
    )

    # literals are exactly the suffix sums of (1-p)p^(d-1)/d over the
    # 10^10*2520 common denominator at p = 9/10
    coeff = [9 ** (d - 1) * 10 ** (10 - d) * (2520 // d) for d in range(1, 11)]
    assert RBO10_SUFFIX_W == tuple(sum(coeff[m - 1:]) for m in range(1, 11))
    assert RBO10_DENOM == 10 ** 10 * 2520

    ident = spark.createDataFrame(
        [("q", i, i) for i in range(1, 11)],
        "query_id string, doc_id long, rank int",
    )
    got = rbo_overlap(ident, ident).collect()[0]
    assert (got.n_common, got.rbo_u6) == (10, 651321)  # 1 - 0.9^10

    other = spark.createDataFrame(
        [("q", i + 100, i) for i in range(1, 11)],
        "query_id string, doc_id long, rank int",
    )
    got = rbo_overlap(ident, other).collect()[0]
    assert (got.n_common, got.rbo_u6) == (0, 0)

    # one shared doc at rank 1 in A, rank 2 in B -> weight w_2
    partial = spark.createDataFrame(
        [("q", 1, 2)] + [("q", i + 100, i) for i in range(1, 11) if i != 2],
        "query_id string, doc_id long, rank int",
    )
    got = rbo_overlap(ident, partial).collect()[0]
    assert got.n_common == 1
    assert got.rbo_u6 == RBO10_SUFFIX_W[1] * 1_000_000 // RBO10_DENOM
