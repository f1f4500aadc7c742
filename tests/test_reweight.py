"""Tests for multiplicative-weights domain reweighting
(operators/reweight.py): exact ppm normalization every round,
directionality (high-loss domains gain weight), uniform fixed point,
and layout invariance of the trajectory."""

from sea_express_customs_etl_spark.operators.reweight import (
    domain_reweight_mw,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["source", "text"])


def test_weights_sum_to_one_million_every_round(spark):
    rows = [("a", "x x x y"), ("b", "y z w q r s t u v"), ("c", "x y")]
    for t in (1, 3, 5):
        out = domain_reweight_mw(_docs(spark, rows), rounds=t).collect()
        assert sum(r.w_ppm for r in out) == 1_000_000


def test_high_loss_domain_upweighted(spark):
    # domain "rare" is all hapax tokens (max surprisal); domain
    # "common" repeats one token. rare must end above uniform,
    # common below.
    rows = [
        ("common", "the the the the the the the the"),
        ("rare", "q1 q2 q3 q4 q5 q6 q7 q8"),
    ]
    out = {
        r.source if hasattr(r, "source") else r.domain: r
        for r in domain_reweight_mw(_docs(spark, rows), rounds=4).collect()
    }
    assert out["rare"].loss_u6 > out["common"].loss_u6
    assert out["rare"].w_ppm > 500_000 > out["common"].w_ppm


def test_equal_losses_stay_uniform(spark):
    # symmetric domains: identical losses -> weights stay uniform
    rows = [("a", "p q"), ("b", "r s")]
    out = domain_reweight_mw(_docs(spark, rows), rounds=5).collect()
    assert {r.w_ppm for r in out} == {500_000}


def test_trajectory_layout_invariance(spark):
    rows = [
        ("s%d" % (i % 5), " ".join("w%d" % ((i * j) % 17) for j in range(6)))
        for i in range(40)
    ]
    a = sorted(
        map(tuple, domain_reweight_mw(_docs(spark, rows), rounds=3).collect())
    )
    b = sorted(
        map(
            tuple,
            domain_reweight_mw(
                _docs(spark, rows).repartition(7), rounds=3
            ).collect(),
        )
    )
    assert a == b
