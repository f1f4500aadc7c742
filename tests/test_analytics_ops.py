"""Property/golden tests for the round-6 analytics operators:
Markov transition matrix, closed-form integer OLS, 2-D skyline —
each pinned against a pure-Python reference on hand fixtures."""

from __future__ import annotations

import datetime as dt
import itertools

import pyspark.sql.functions as F

from sea_express_customs_etl_spark.operators.markov import transition_matrix
from sea_express_customs_etl_spark.operators.profiling import ols_by_group
from sea_express_customs_etl_spark.operators.skyline import skyline_2d


def _ts(i: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i)


def test_markov_transitions_golden(spark):
    # user 1: a->b->a->a   user 2: b->b
    rows = [
        (1, _ts(0), 1, "a"),
        (2, _ts(1), 1, "b"),
        (3, _ts(2), 1, "a"),
        (4, _ts(3), 1, "a"),
        (5, _ts(0), 2, "b"),
        (6, _ts(5), 2, "b"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"]
    )
    got = {
        (r.from_type, r.to_type): (r.n, r.p_ppm)
        for r in transition_matrix(df).collect()
    }
    # from a: a->b (1), a->a (1)  => 500000 each; from b: b->a (1), b->b (1)
    assert got == {
        ("a", "b"): (1, 500000),
        ("a", "a"): (1, 500000),
        ("b", "a"): (1, 500000),
        ("b", "b"): (1, 500000),
    }


def test_markov_row_ppm_bounded_and_layout_invariant(spark):
    rows = [
        (i, _ts(i), i % 7, ["a", "b", "c"][(i * i) % 3]) for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"]
    )
    base = sorted(map(tuple, transition_matrix(df).collect()))
    reparted = sorted(
        map(tuple, transition_matrix(df.repartition(7, "event_id")).collect())
    )
    assert base == reparted
    # row-normalized: each from_type's ppm sums to <= 1e6 (floor loss)
    sums: dict[str, int] = {}
    for f, _t, _n, p in base:
        sums[f] = sums.get(f, 0) + p
    assert all(1_000_000 - 10 <= s <= 1_000_000 for s in sums.values())


def test_ols_exact_line_and_negative_slope(spark):
    # y = 2x + 300 exactly -> slope_ppm = 2_000_000, intercept_c = 300
    pos = [("g1", x, 2 * x + 300) for x in range(1, 50)]
    # y = -3x + 5000 exactly -> slope_ppm = -3_000_000
    neg = [("g2", x, -3 * x + 5000) for x in range(1, 50)]
    df = spark.createDataFrame(pos + neg, ["g", "x", "y"])
    got = {r.g: r for r in ols_by_group(df, "x", "y", ["g"]).collect()}
    assert got["g1"].slope_ppm == 2_000_000
    assert got["g1"].intercept_c == 300
    assert got["g1"].r2_ppm >= 999_000
    assert got["g2"].slope_ppm == -3_000_000
    assert got["g2"].intercept_c == 5_000
    assert got["g2"].r2_ppm >= 999_000


def test_ols_constant_x_degenerate(spark):
    df = spark.createDataFrame(
        [("g", 5, y) for y in range(10)], ["g", "x", "y"]
    )
    row = ols_by_group(df, "x", "y", ["g"]).collect()[0]
    assert (row.slope_ppm, row.intercept_c, row.r2_ppm) == (0, 0, 0)


def _brute_skyline(pts):
    """Non-dominated under (min x, max y), duplicates all kept."""

    def dominates(a, b):
        return (
            a[0] <= b[0]
            and a[1] >= b[1]
            and (a[0] < b[0] or a[1] > b[1])
        )

    return sorted(
        p for p in pts if not any(dominates(q, p) for q in pts if q != p)
    )


def test_skyline_matches_brute_force(spark):
    # includes equal-x ties, equal-y ties, and an exact duplicate pair
    pts = [
        (10, (3 * i * i + 7 * i) % 40, (5 * i * i + i) % 30) for i in range(60)
    ]
    pts += [(100, 0, 29), (101, 0, 29)]  # duplicate skyline point
    df = spark.createDataFrame(pts, ["pid", "x", "y"])
    got = sorted(
        (r.x, r.y) for r in skyline_2d(df, "x", "y", ["pid"]).collect()
    )
    coords = [(x, y) for _, x, y in pts]
    want = _brute_skyline(coords)
    assert got == want
    # every skyline member is pairwise non-dominated
    for a, b in itertools.combinations(set(got), 2):
        assert not (a[0] <= b[0] and a[1] >= b[1])
        assert not (b[0] <= a[0] and b[1] >= a[1])


def test_skyline_layout_invariance(spark):
    pts = [(i, (i * 13) % 50, (i * 29) % 50) for i in range(300)]
    df = spark.createDataFrame(pts, ["pid", "x", "y"])
    a = sorted(map(tuple, skyline_2d(df, "x", "y", ["pid"]).collect()))
    b = sorted(
        map(
            tuple,
            skyline_2d(
                df.repartition(11, "pid"), "x", "y", ["pid"], num_partitions=3
            ).collect(),
        )
    )
    assert a == b


def test_mad_outliers_golden(spark):
    from sea_express_customs_etl_spark.operators.quantiles import (
        mad_outliers,
    )

    # group g: values 10..19 plus one spike; median=15 (lower of 14/15
    # -> ceil(11/2)=6th of sorted [10..19,1000] = 15), MAD from devs
    rows = [(i, "g", 10 + i) for i in range(10)] + [(99, "g", 1000)]
    df = spark.createDataFrame(rows, ["event_id", "event_type", "value_c"])
    got = mad_outliers(
        df, "value_c", ("event_type",), ("event_id",), k_tenths=30
    ).collect()
    assert [(r.event_id, r.value_c) for r in got] == [(99, 1000)]
    r = got[0]
    # devs from med=15: [5,4,3,2,1,0,1,2,3,4,985] sorted -> 6th = 3
    assert (r.med_c, r.mad_c) == (15, 3)


def test_mad_outliers_robust_to_spike_mass(spark):
    from sea_express_customs_etl_spark.operators.quantiles import (
        mad_outliers,
    )

    # 3 huge spikes out of 20: a sigma gate's sigma balloons; MAD holds
    rows = [(i, "g", 100) for i in range(17)] + [
        (90, "g", 10_000),
        (91, "g", 10_000),
        (92, "g", 10_000),
    ]
    df = spark.createDataFrame(rows, ["event_id", "event_type", "value_c"])
    got = sorted(
        r.event_id
        for r in mad_outliers(
            df, "value_c", ("event_type",), ("event_id",), 30
        ).collect()
    )
    assert got == [90, 91, 92]  # MAD=0 degenerate: every deviator flags


def test_benford_digits_golden(spark):
    from sea_express_customs_etl_spark.operators.profiling import (
        BENFORD_PPM,
        benford_first_digit,
    )

    # 2^k is a classic Benford-conformant sequence
    rows = [(2**k,) for k in range(40)] + [(0,)]  # 0 excluded (< 1)
    df = spark.createDataFrame(rows, ["v"])
    got = {r.digit: r for r in benford_first_digit(df, "v").collect()}
    assert sum(r.n for r in got.values()) == 40
    assert got[1].exp_ppm == BENFORD_PPM[0] == 301030
    # first digits of 2^k: digit 1 appears 12/40 times -> 300000 ppm
    assert got[1].n == 12 and got[1].obs_ppm == 300000
    assert got[1].dev_ppm == abs(300000 - 301030)
    assert all(r.dev_ppm == abs(r.obs_ppm - r.exp_ppm) for r in got.values())


def test_path_counts_golden(spark):
    from sea_express_customs_etl_spark.operators.markov import path_counts

    rows = [
        (1, _ts(0), 1, "a"), (2, _ts(1), 1, "b"), (3, _ts(2), 1, "c"),
        (4, _ts(3), 1, "a"), (5, _ts(0), 2, "a"), (6, _ts(1), 2, "b"),
        (7, _ts(2), 2, "c"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    got = {(r.s1, r.s2, r.s3): r.n for r in path_counts(df, k=10).collect()}
    # user 1: abc, bca; user 2: abc -> abc appears twice
    assert got == {("a", "b", "c"): 2, ("b", "c", "a"): 1}


def test_profile_drift_detects_changes(spark):
    from sea_express_customs_etl_spark.operators.profiling import (
        profile_drift,
    )

    old = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, None)], ["k", "s"]
    )
    new = spark.createDataFrame(
        [(1, "x"), (9, "y"), (9, "y"), (9, "z")], ["k", "s"]
    )
    got = {r.column: r for r in profile_drift(old, new, ["k", "s"]).collect()}
    k = got["k"]
    assert (k.n_rows_old, k.n_rows_new) == (3, 4)
    # distinct old {1,2,3} = 3, new {1,9} = 2 -> delta -1
    assert k.ndv_delta == -1
    assert k.hi_changed  # max 3 -> 9
    assert not k.lo_changed  # min 1 both sides
    s = got["s"]
    assert s.null_ppm_old == (1_000_000 * 1) // 3
    assert s.null_ppm_new == 0
    assert s.hi_changed  # 'y' -> 'z'
