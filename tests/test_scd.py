"""Unit tests for SCD2 snapshot diffing (operators/scd.py)."""

from __future__ import annotations

import datetime


def test_scd2_all_four_cases(spark):
    from sea_express_customs_etl_spark.operators.scd import scd2_from_snapshots

    old = spark.createDataFrame(
        [(1, "A", 10), (2, "B", 20), (3, "C", 30)], "k long, s string, p long"
    )
    new = spark.createDataFrame(
        [(1, "A", 10), (2, "B", 25), (4, "D", 40)], "k long, s string, p long"
    )
    rows = scd2_from_snapshots(
        old, new, "k", ["s", "p"], "2024-01-01", "2024-02-01"
    ).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.k, []).append(r)

    d1, d2 = datetime.date(2024, 1, 1), datetime.date(2024, 2, 1)
    (u,) = by_key[1]  # unchanged: one open row from d1
    assert (u.change, u.valid_from, u.valid_to, u.is_current) == (
        "unchanged", d1, None, True,
    )
    upd = sorted(by_key[2], key=lambda r: r.valid_from)  # updated: 2 rows
    assert [r.p for r in upd] == [20, 25]
    assert (upd[0].valid_to, upd[0].is_current) == (d2, False)
    assert (upd[1].valid_from, upd[1].valid_to, upd[1].is_current) == (
        d2, None, True,
    )
    (dele,) = by_key[3]  # deleted: closed at d2
    assert (dele.change, dele.valid_to, dele.is_current) == ("deleted", d2, False)
    (ins,) = by_key[4]  # inserted: open from d2
    assert (ins.change, ins.valid_from, ins.is_current) == ("inserted", d2, True)
    assert len(rows) == 5
