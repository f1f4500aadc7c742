"""Golden + invariant tests for the privacy release audits
(operators/privacy.py): hand-computed k-anonymity / l-diversity values
on a tiny QI table, band-edge behavior for negative balances, and
layout invariance."""

from sea_express_customs_etl_spark.operators.privacy import (
    k_anonymity_audit,
)


def _cust(spark, rows):
    return spark.createDataFrame(
        rows, ["c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment"]
    )


def test_k_anonymity_golden(spark):
    # Class (1, band(500)) -> 3 rows, 2 segments; class (2, band(500))
    # -> 1 row, 1 segment. band(500.00) = (50000+100000)//100000 = 1.
    rows = [
        (1, 1, 500.0, "A"),
        (2, 1, 510.0, "A"),
        (3, 1, 520.0, "B"),
        (4, 2, 500.0, "A"),
    ]
    r = k_anonymity_audit(_cust(spark, rows)).collect()[0]
    assert r.n_classes == 2 and r.n_rows == 4
    assert r.k_min == 1
    assert r.classes_below_k == 2 and r.rows_below_k == 4
    assert r.l_min_div == 1 and r.classes_below_l == 2


def test_negative_balance_bands_floor_safely(spark):
    # -999.99 -> cents -99999, shifted 1 -> band 0; +0.01 -> band 1.
    # Distinct bands, so two classes of one row each.
    rows = [(1, 1, -999.99, "A"), (2, 1, 0.01, "A")]
    r = k_anonymity_audit(_cust(spark, rows)).collect()[0]
    assert r.n_classes == 2 and r.k_min == 1


def test_k_threshold_boundary(spark):
    # Exactly k=5 rows in one class: NOT below k.
    rows = [(i, 1, 100.0 + i / 100.0, "S") for i in range(5)]
    r = k_anonymity_audit(_cust(spark, rows)).collect()[0]
    assert r.n_classes == 1 and r.k_min == 5
    assert r.classes_below_k == 0 and r.rows_below_k == 0
    # one distinct segment -> fails distinct-3-diversity
    assert r.l_min_div == 1 and r.classes_below_l == 1


def test_layout_invariance(spark):
    rows = [(i, i % 3, float(i * 37 % 900), "ABC"[i % 3]) for i in range(60)]
    a = k_anonymity_audit(_cust(spark, rows)).collect()[0]
    b = k_anonymity_audit(_cust(spark, rows).repartition(7)).collect()[0]
    assert a.asDict() == b.asDict()
