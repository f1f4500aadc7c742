"""Property tests for the r8 wave-2 operators: exact AUC / deciles
(operators/evalstats.py), UniMax allocation (operators/sampling.py),
quantile normalization + preference pairs (operators/calibrate.py),
Kneser-Ney smoothing (operators/lm.py). The sf0.01 gate hash-checks
each against DuckDB; these pin the algebraic identities the oracles
cannot see (brute-force pair equivalence, budget conservation,
distribution equality)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from sea_express_customs_etl_spark.operators.calibrate import (
    preference_pairs,
    quantile_normalize,
)
from sea_express_customs_etl_spark.operators.evalstats import (
    auc_exact,
    score_deciles,
)
from sea_express_customs_etl_spark.operators.sampling import unimax_alloc
from sea_express_customs_etl_spark.plans.cache import release_tracked


@pytest.fixture(autouse=True)
def _release(spark):
    yield
    release_tracked()


def _scored(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, score long, truth int")


def test_auc_matches_bruteforce_pairs(spark):
    rows = [
        (i, s, y)
        for i, (s, y) in enumerate(
            [(5, 1), (3, 0), (5, 0), (7, 1), (1, 0), (3, 1), (9, 0), (2, 1)]
        )
    ]
    got = auc_exact(_scored(spark, rows)).collect()[0]
    pos = [s for _, s, y in rows if y == 1]
    neg = [s for _, s, y in rows if y == 0]
    gt = sum(1 for p in pos for n in neg if p > n)
    eq = sum(1 for p in pos for n in neg if p == n)
    assert (got.n_pos, got.n_neg) == (len(pos), len(neg))
    assert (got.pairs_gt, got.pairs_eq) == (gt, eq)
    assert got.auc_ppm == (1_000_000 * (2 * gt + eq)) // (
        2 * len(pos) * len(neg)
    )


def test_auc_perfect_and_inverted_rankers(spark):
    perfect = [(i, i, 1 if i >= 5 else 0) for i in range(10)]
    assert auc_exact(_scored(spark, perfect)).collect()[0].auc_ppm == 1_000_000
    inverted = [(i, -i, 1 if i >= 5 else 0) for i in range(10)]
    assert auc_exact(_scored(spark, inverted)).collect()[0].auc_ppm == 0


def test_auc_all_ties_is_half(spark):
    rows = [(i, 7, i % 2) for i in range(10)]
    assert auc_exact(_scored(spark, rows)).collect()[0].auc_ppm == 500_000


def test_score_deciles_partition_ansi(spark):
    # 23 rows, 10 buckets: first 3 buckets get 3 rows, the rest 2
    rows = [(i, i * 10, int(i >= 12)) for i in range(23)]
    out = {
        r.bucket: r for r in score_deciles(_scored(spark, rows)).collect()
    }
    sizes = [out[b].n_rows for b in range(1, 11)]
    assert sizes == [3, 3, 3, 2, 2, 2, 2, 2, 2, 2]
    assert sum(r.n_pos for r in out.values()) == 11
    # monotone score spans: bucket k's max <= bucket k+1's min
    for b in range(1, 10):
        assert out[b].score_max <= out[b + 1].score_min


def test_unimax_budget_conserved_and_capped(spark):
    rows = [(f"d{i}", j) for i, n in enumerate([3, 5, 8, 40]) for j in range(n)]
    df = spark.createDataFrame(rows, "g string, x int")
    out = {r.g: r for r in unimax_alloc(df, "g", budget=40, max_epochs=2).collect()}
    assert sum(r.alloc for r in out.values()) == 40
    for r in out.values():
        assert 0 <= r.alloc <= r.cap
        assert r.epochs_ppm <= 2_000_000
    # small domains run at cap; the big one absorbs the remainder
    assert out["d0"].alloc == 6 and out["d1"].alloc == 10
    assert out["d3"].alloc == 40 - 6 - 10 - out["d2"].alloc


def test_unimax_budget_above_caps_returns_caps(spark):
    rows = [(f"d{i}", j) for i in range(3) for j in range(4)]
    df = spark.createDataFrame(rows, "g string, x int")
    out = unimax_alloc(df, "g", budget=1000, max_epochs=2).collect()
    assert all(r.alloc == r.cap == 8 for r in out)


def test_quantile_normalize_equalizes_distributions(spark):
    # two sources with disjoint score scales; after normalization the
    # per-source normalized MULTISETS must draw from the same global
    # quantile ladder, and same-size sources must match exactly
    rows = [(i, "a", 1000 + i) for i in range(8)] + [
        (100 + i, "b", i) for i in range(8)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, score long")
    out = quantile_normalize(df, "source", "score").collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r.norm_score)
    assert sorted(by_src["a"]) == sorted(by_src["b"])
    # ranks preserved within source
    a = sorted(
        (r for r in out if r.source == "a"), key=lambda r: r.src_rank
    )
    assert [r.norm_score for r in a] == sorted(r.norm_score for r in a)


def test_preference_pairs_argmax_argmin(spark):
    rows = [
        (1, "s1", 10),
        (2, "s1", 30),
        (3, "s1", 20),
        # s2 is an all-tied group: doc 4 wins BOTH ends under the
        # (score, id ASC) tie-break, so the pair collapses and s2
        # must not emit a row
        (4, "s2", 7),
        (5, "s2", 7),
        (6, "s3", 1),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, score long")
    out = {
        r.source: r
        for r in preference_pairs(df, "source", "score").collect()
    }
    assert out["s1"].chosen_id == 2 and out["s1"].rejected_id == 1
    assert out["s1"].margin == 20
    assert "s3" not in out  # singleton group: no pair
    assert "s2" not in out  # tie collapses to the same row on both ends
