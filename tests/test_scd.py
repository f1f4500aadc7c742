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


def test_pit_join_all_version_windows(spark):
    """PIT semantics across v1 window, v2 window, deleted gap, and
    pre-history facts — including the null-valid_to payload case that
    a per-column ignorenulls carry would corrupt."""
    import datetime as dt

    from sea_express_customs_etl_spark.operators.scd import (
        pit_join,
        scd2_from_snapshots,
    )

    old = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "k long, p long")
    new = spark.createDataFrame([(1, 11), (3, 30)], "k long, p long")
    hist = scd2_from_snapshots(old, new, "k", ["p"], "2024-01-01", "2024-02-01")
    facts = spark.createDataFrame(
        [(1, dt.date(2024, 1, 15), "v1"), (1, dt.date(2024, 3, 1), "v2"),
         (2, dt.date(2024, 1, 15), "alive"), (2, dt.date(2024, 3, 1), "gone"),
         (3, dt.date(2024, 3, 1), "stable"), (1, dt.date(2023, 1, 1), "pre")],
        "k long, d date, tag string",
    )
    got = {r.tag: r for r in pit_join(facts, hist, "k", "d", ["p"]).collect()}
    assert got["v1"].pit_p == 10 and got["v2"].pit_p == 11  # version switch
    assert got["alive"].pit_p == 20
    assert "gone" not in got  # deleted gap: no valid version
    assert "pre" not in got  # before history starts
    assert got["stable"].pit_p == 30 and got["stable"].pit_valid_from == dt.date(2024, 1, 1)
