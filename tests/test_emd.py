"""Golden + invariant tests for 1-D earth-mover drift
(operators/emd.py): hand-computed Wasserstein-1 values on a tiny
grid, the degenerate single-support case, and layout invariance."""

from sea_express_customs_etl_spark.operators.emd import length_emd_drift


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["source", "n_chars"])


def test_emd_golden(spark):
    # corpus: {1:1, 3:2}, N=3; grid gaps: (1->3)=2
    # a (N=2): |cum_a(1)*3 - cum_c(1)*2| * 2 = |3-2|*2 = 2 -> 2/6
    # b (N=1): |0*3 - 1*1| * 2 = 2 -> 2/3
    rows = [("a", 1), ("a", 3), ("b", 3)]
    out = {
        r.source: r for r in length_emd_drift(_docs(spark, rows)).collect()
    }
    assert out["a"].n_docs == 2 and out["a"].emd_u6 == 333333
    assert out["b"].n_docs == 1 and out["b"].emd_u6 == 666666


def test_emd_identical_source_is_zero(spark):
    # a source matching the corpus distribution exactly has EMD 0
    rows = [("a", 10), ("a", 20), ("b", 10), ("b", 20)]
    out = {
        r.source: r.emd_u6
        for r in length_emd_drift(_docs(spark, rows)).collect()
    }
    assert out == {"a": 0, "b": 0}


def test_emd_single_support_empty(spark):
    # one distinct length: no gaps, no rows on either engine
    rows = [("a", 7), ("b", 7)]
    assert length_emd_drift(_docs(spark, rows)).count() == 0


def test_emd_magnitude_sensitivity(spark):
    # same KL-style support mismatch, different magnitude: a source
    # shifted FAR from the corpus mode must score higher than one
    # shifted near it (the information KL on disjoint support loses).
    near = [("n", 100), ("c", 101), ("c", 101)]
    far = [("n", 100), ("c", 1000), ("c", 1000)]
    near_u6 = {
        r.source: r.emd_u6
        for r in length_emd_drift(_docs(spark, near)).collect()
    }["n"]
    far_u6 = {
        r.source: r.emd_u6
        for r in length_emd_drift(_docs(spark, far)).collect()
    }["n"]
    assert far_u6 > near_u6


def test_emd_layout_invariance(spark):
    rows = [("s%d" % (i % 4), 10 + (i * 13) % 97) for i in range(80)]
    a = sorted(
        map(tuple, length_emd_drift(_docs(spark, rows)).collect())
    )
    b = sorted(
        map(
            tuple,
            length_emd_drift(_docs(spark, rows).repartition(7)).collect(),
        )
    )
    assert a == b
