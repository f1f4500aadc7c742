"""Unit tests for operators/collocations.py: PMI phrase mining and
per-domain KL divergence (goldens on constructed corpora + layout
invariance — the integer-sum portability property)."""

from __future__ import annotations

import math

from sea_express_customs_etl_spark.operators.collocations import (
    domain_divergence,
    pmi_collocations,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "source", "text"])


def test_pmi_top_pair_is_the_collocation(spark):
    # "new york" always co-occurs; filler words pair with everything
    rows = [
        (i, "s", f"visit new york the w{i} and the w{i + 1} end")
        for i in range(8)
    ]
    out = pmi_collocations(
        _docs(spark, rows), k=5, min_count=2
    ).collect()
    assert out[0].a == "new" and out[0].b == "york"
    assert out[0].pair_count == 8
    assert out[0].pmi_u6 > 0


def test_pmi_value_matches_formula(spark):
    rows = [(i, "s", "a b a b c") for i in range(3)]
    out = {
        (r.a, r.b): r for r in pmi_collocations(
            _docs(spark, rows), k=10, min_count=1
        ).collect()
    }
    # bigram stream per doc: (a,b),(b,a),(a,b),(b,c) -> N = 12
    r = out[("a", "b")]
    assert r.pair_count == 6
    # c(a,.)=6, c(.,b)=6  ->  PMI = ln(6*12/(6*6)) = ln 2
    assert r.pmi_u6 == round(math.log(6 * 12 / (6 * 6)) * 1e6)


def test_pmi_layout_invariance(spark):
    rows = [
        (i, "s", f"alpha beta w{i % 7} gamma delta w{i % 5} alpha beta")
        for i in range(40)
    ]
    df = _docs(spark, rows)
    a = pmi_collocations(df, k=20, min_count=2).collect()
    b = pmi_collocations(df.repartition(7), k=20, min_count=2).collect()
    assert a == b


def test_kl_identical_domains_equal_and_small(spark):
    rows = [(i, f"d{i % 2}", "the quick brown fox jumps") for i in range(20)]
    out = {r.domain: r for r in domain_divergence(_docs(spark, rows)).collect()}
    assert set(out) == {"d0", "d1"}
    assert out["d0"].kl_u9 == out["d1"].kl_u9
    # identical distributions: only smoothing-grain divergence remains
    assert abs(out["d0"].kl_u9) < 0.01 * 1e9


def test_kl_divergent_domain_ranks_higher(spark):
    rows = [(i, "plain", "the quick brown fox jumps over it") for i in range(30)]
    rows += [(100 + i, "code", "def foo(bar): return baz != qux") for i in range(10)]
    rows += [(200 + i, "mixed", "the quick fox def foo return it") for i in range(10)]
    out = {r.domain: r for r in domain_divergence(_docs(spark, rows)).collect()}
    assert out["code"].kl_u9 > out["mixed"].kl_u9 > out["plain"].kl_u9


def test_kl_layout_invariance(spark):
    rows = [
        (i, f"s{i % 3}", f"tok{i % 11} tok{i % 5} common words here")
        for i in range(60)
    ]
    df = _docs(spark, rows)
    a = sorted(map(tuple, domain_divergence(df).collect()))
    b = sorted(map(tuple, domain_divergence(df.repartition(9)).collect()))
    assert a == b


def test_source_vocab_overlap_golden(spark):
    from sea_express_customs_etl_spark.operators.collocations import (
        source_vocab_overlap,
    )

    docs = [
        (1, "a b c", "s1"),
        (2, "b c d", "s2"),      # s1 ∩ s2 = {b, c}, union = {a,b,c,d}
        (3, "x y", "s3"),        # disjoint from s1
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text", "source"])
    got = {
        (r.src_a, r.src_b): (r.n_common, r.n_union, r.jac_ppm)
        for r in source_vocab_overlap(df).collect()
    }
    assert got[("s1", "s2")] == (2, 4, 500_000)
    # zero-intersection pairs produce no row (inner join on tokens)
    assert ("s1", "s3") not in got and ("s2", "s3") not in got
