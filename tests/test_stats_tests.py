"""Golden + invariant tests for the nonparametric statistics layer
(operators/stats_tests.py): hand-computed KS / Mann-Whitney / Spearman
/ autocorrelation / CUSUM values on tiny frames, plus layout
invariance (the aggregation-order-exactness claim)."""

import datetime as dt

import pyspark.sql.functions as F

from sea_express_customs_etl_spark.operators.stats_tests import (
    cusum_level_shift,
    ks_two_sample,
    lag1_autocorr,
    mann_whitney_u,
    spearman_by_group,
)


def _two_groups(spark):
    rows = [("a", v) for v in [1, 2, 3]] + [("b", v) for v in [2, 3, 4]]
    return spark.createDataFrame(rows, ["g", "v"])


def test_ks_golden(spark):
    # cum_a = 1,2,3,3; cum_b = 0,1,2,3 over merged {1,2,3,4}; n=3 each
    # d = max|cum_a*3 - cum_b*3| = 3 -> ppm = 3e6 // 9
    out = ks_two_sample(_two_groups(spark), "g", F.col("v")).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.g_a, r.g_b, r.n_a, r.n_b) == ("a", "b", 3, 3)
    assert r.d_num == 3 and r.ks_ppm == 333333


def test_ks_identical_distributions_zero(spark):
    rows = [("a", v) for v in [1, 2, 2]] + [("b", v) for v in [1, 2, 2]]
    df = spark.createDataFrame(rows, ["g", "v"])
    r = ks_two_sample(df, "g", F.col("v")).collect()[0]
    assert r.d_num == 0 and r.ks_ppm == 0


def test_ks_layout_invariance(spark):
    df = _two_groups(spark)
    a = sorted(map(tuple, ks_two_sample(df, "g", F.col("v")).collect()))
    b = sorted(
        map(
            tuple,
            ks_two_sample(df.repartition(7), "g", F.col("v")).collect(),
        )
    )
    assert a == b


def test_mwu_golden_with_ties(spark):
    # A=[1,2], B=[2,3]: rank(1)=1, rank(2)=avg(2,3)=2.5, rank(3)=4
    # R_a = 3.5 -> x2 = 7; U_a = 0.5 -> x2 = 1; U_b x2 = 2*2*2 - 1 = 7
    rows = [("a", 1), ("a", 2), ("b", 2), ("b", 3)]
    df = spark.createDataFrame(rows, ["g", "v"])
    r = mann_whitney_u(df, "g", F.col("v")).collect()[0]
    assert (r.u_a_x2, r.u_b_x2) == (1, 7)


def test_mwu_identity_holds_on_events_shape(spark):
    # U_a + U_b = n_a * n_b (x2-scaled: sum = 2*n_a*n_b) on random-ish data
    rows = [("a", i * 7 % 5) for i in range(20)] + [
        ("b", i * 3 % 6) for i in range(30)
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    r = mann_whitney_u(df, "g", F.col("v")).collect()[0]
    assert r.u_a_x2 + r.u_b_x2 == 2 * r.n_a * r.n_b
    assert r.n_a == 20 and r.n_b == 30


def test_spearman_perfect_monotone(spark):
    rows = [("u", 1, 10), ("u", 2, 20), ("u", 3, 30)] + [
        ("d", 1, 30), ("d", 2, 20), ("d", 3, 10)
    ]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    got = {r.g: r.rho_spearman for r in
           spearman_by_group(df, "g", "x", "y").collect()}
    assert got == {"u": 1.0, "d": -1.0}


def test_spearman_tie_handling(spark):
    # x = [1, 2, 2, 3], y = [1, 2, 3, 4]: avg ranks x = 1, 2.5, 2.5, 4
    # Spearman = Pearson on (2,5,5,8) vs (2,4,6,8) = 18/sqrt(18*20)
    rows = [("g", 1, 1), ("g", 2, 2), ("g", 2, 3), ("g", 3, 4)]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    r = spearman_by_group(df, "g", "x", "y").collect()[0]
    assert abs(r.rho_spearman - round(18 / (18 * 20) ** 0.5, 6)) < 1e-9


def test_lag1_autocorr_alternating_is_minus_one(spark):
    rows = [
        (1, "t", i, i, v)
        for i, v in enumerate([1, 2, 1, 2, 1])
    ]
    df = spark.createDataFrame(
        rows, ["user_id", "event_type", "ts_us", "event_id", "v"]
    )
    r = lag1_autocorr(
        df, ["user_id", "event_type"], ["ts_us", "event_id"],
        F.col("v"), "event_type",
    ).collect()[0]
    assert r.n_pairs == 4 and r.lag1_corr == -1.0


def test_lag1_autocorr_series_scoped(spark):
    # two users: the boundary between their series must NOT form a pair
    rows = [(1, "t", 0, 0, 5), (1, "t", 1, 1, 6), (2, "t", 2, 2, 7)]
    df = spark.createDataFrame(
        rows, ["user_id", "event_type", "ts_us", "event_id", "v"]
    )
    r = lag1_autocorr(
        df, ["user_id", "event_type"], ["ts_us", "event_id"],
        F.col("v"), "event_type",
    ).collect()[0]
    assert r.n_pairs == 1  # only user 1's (5, 6)


def test_cusum_locates_level_shift(spark):
    # one event per hour, values 0,0,0,10,10,10: |T| peaks at the last
    # pre-shift bucket (hour 2), negative sign (series below its mean)
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(hours=h), 1, "a", float(v), "{}")
        for i, (h, v) in enumerate(
            [(0, 0), (1, 0), (2, 0), (3, 10), (4, 10), (5, 10)]
        )
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    r = cusum_level_shift(df).collect()[0]
    assert r.n_buckets == 6
    assert r.peak_hour == int(base.timestamp()) // 3600 + 2
    assert r.t_abs == 90000 and r.shift_sign == -1
