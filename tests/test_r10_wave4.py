"""Goldens + invariants for the round-10 fourth-wave operators:
SRM check, sliding-window HLL, propensity-score matching."""

import hashlib

import pyspark.sql.functions as F

from sea_express_customs_etl_spark.operators.sampling import (
    hex_threshold,
    split_srm_check,
)
from sea_express_customs_etl_spark.operators.sketches import (
    hll_sliding_stats,
    hll_stats,
)
from sea_express_customs_etl_spark.operators.psm import psm_att


def test_srm_matches_reference_assignment(spark):
    docs = spark.createDataFrame(
        [(i, "x") for i in range(500)], ["doc_id", "text"]
    )
    out = {r.split: r for r in split_srm_check(docs).collect()}
    t80, t90 = hex_threshold(0.8), hex_threshold(0.9)
    exp = {"train": 0, "val": 0, "test": 0}
    for i in range(500):
        h = hashlib.md5(("split" + str(i)).encode()).hexdigest()[:8]
        exp["train" if h < t80 else "val" if h < t90 else "test"] += 1
    for name, n in exp.items():
        assert out[name].n_obs == n
    assert sum(r.n_obs for r in out.values()) == 500
    assert all(r.chi2_term_u6 >= 0 for r in out.values())
    # detection power: the REAL SRM failure mode is filtering bias —
    # drop every train-assigned doc with an even id before the audit
    # and the statistic must blow up vs the clean audit
    right = sum(r.chi2_term_u6 for r in out.values())
    train_ids = {
        i
        for i in range(500)
        if hashlib.md5(("split" + str(i)).encode()).hexdigest()[:8] < t80
    }
    biased = docs.filter(
        ~(F.col("doc_id").isin([i for i in train_ids if i % 2 == 0]))
    )
    wrong = sum(
        r.chi2_term_u6 for r in split_srm_check(biased).collect()
    )
    assert wrong > 5 * max(right, 1)


def test_hll_sliding_merge_equals_union_stats(spark):
    # hour 0: users 1..40; hour 1: users 30..70. The hour-1 sliding
    # stats must equal hll_stats over the UNION (register-max
    # associativity), and hour-0 stats equal hll_stats of hour 0.
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [(base, u) for u in range(1, 41)]
    rows += [(base + dt.timedelta(hours=1), u) for u in range(30, 71)]
    ev = spark.createDataFrame(rows, ["ts", "user_id"])
    out = {r.epoch_hour: r for r in hll_sliding_stats(ev).collect()}
    assert len(out) == 2
    h0, h1 = sorted(out)
    s0 = hll_stats(
        spark.createDataFrame([(u,) for u in range(1, 41)], ["user_id"]),
        "user_id",
    ).collect()[0]
    su = hll_stats(
        spark.createDataFrame([(u,) for u in range(1, 71)], ["user_id"]),
        "user_id",
    ).collect()[0]
    assert (out[h0].n_buckets, out[h0].n_zero, out[h0].s_scaled) == (
        s0.n_buckets,
        s0.n_zero,
        s0.s_scaled,
    )
    assert (out[h1].n_buckets, out[h1].n_zero, out[h1].s_scaled) == (
        su.n_buckets,
        su.n_zero,
        su.s_scaled,
    )


def test_psm_att_golden(spark):
    # scores: treated at 10 and 20; controls at 11, 19, 100.
    # sd of [10,20,11,19,100] -> caliper = max(1, ceil(0.2*sd));
    # with sd ~ 34 the caliper ~ 7: treated 10 matches control 11
    # (|d|=1), treated 20 matches 19 (|d|=1); control 100 unmatched.
    rows = [
        (1, True, 10, 100),
        (2, True, 20, 200),
        (3, False, 11, 50),
        (4, False, 19, 120),
        (5, False, 100, 999),
    ]
    df = spark.createDataFrame(
        rows, ["doc_id", "treated", "score", "outcome"]
    )
    r = psm_att(df).collect()[0]
    assert r.n_treated == 2 and r.n_matched == 2
    # ATT = (100-50) + (200-120) = 130
    assert r.att_num == 130
    assert r.att_u6 == (130 * 1_000_000) // 2


def test_psm_att_no_common_support(spark):
    # controls far outside every caliper: nothing matches, ATT 0
    rows = [(1, True, 0, 10), (2, False, 10**9, 20)]
    df = spark.createDataFrame(
        rows, ["doc_id", "treated", "score", "outcome"]
    )
    r = psm_att(df).collect()[0]
    assert r.n_treated == 1 and r.n_matched == 0
    assert r.att_num == 0 and r.att_u6 == 0


def test_psm_negative_att_sign(spark):
    # treated outcome BELOW matched controls -> negative ATT with the
    # negate-first mean
    rows = [(1, True, 10, 5), (2, False, 10, 50)]
    df = spark.createDataFrame(
        rows, ["doc_id", "treated", "score", "outcome"]
    )
    r = psm_att(df).collect()[0]
    assert r.n_matched == 1
    assert r.att_num == -45
    assert r.att_u6 == -(45 * 1_000_000)


def test_corpus_balance_golden(spark):
    from sea_express_customs_etl_spark.operators.dispersion import (
        corpus_balance,
    )

    # sources a:6, b:2 -> N=8, sum c^2 = 40
    docs = spark.createDataFrame(
        [(i, "a" if i < 6 else "b") for i in range(8)],
        ["doc_id", "source"],
    )
    r = corpus_balance(docs).collect()[0]
    assert r.n_sources == 2 and r.n_docs == 8
    assert r.hhi_u6 == (1_000_000 * 40) // 64
    assert r.effective_sources_u6 == (1_000_000 * 64) // 40
    assert r.max_share_ppm == 750_000


def test_corpus_balance_uniform_effective_equals_n(spark):
    from sea_express_customs_etl_spark.operators.dispersion import (
        corpus_balance,
    )

    docs = spark.createDataFrame(
        [(i, "s%d" % (i % 5)) for i in range(50)], ["doc_id", "source"]
    )
    r = corpus_balance(docs).collect()[0]
    assert r.effective_sources_u6 == 5_000_000
    assert r.hhi_u6 == 200_000
