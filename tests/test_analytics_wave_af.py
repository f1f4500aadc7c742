"""Wave-AF goldens: consistent-hash minimal movement (every moved key
goes TO the new shard), sequence-pattern golden counts."""

import datetime as dt

import pyspark.sql.functions as F

from sea_express_customs_etl_spark.operators.seqmatch import (
    sequence_pattern_counts,
    user_event_strings,
)
from sea_express_customs_etl_spark.operators.sharding import (
    consistent_hash_rebalance,
)


def test_consistent_hash_moves_only_to_new_shard(spark):
    keys = spark.range(1, 400).select(F.col("id").alias("k"))
    out = consistent_hash_rebalance(keys, "k", n_before=8, n_after=9).collect()
    total = sum(r.n_keys for r in out)
    assert total == 399
    moved = [r for r in out if r.shard_before != r.shard_after]
    assert moved, "ring growth should steal some keys"
    # the consistent-hash guarantee: growth only reassigns keys to the
    # NEW shard — nothing shuffles between surviving shards
    assert all(r.shard_after == 8 for r in moved)
    n_moved = sum(r.n_keys for r in moved)
    assert n_moved < total // 3  # ≈ 1/9 expected, far below mod-hash's 8/9


def test_user_event_strings_ordered(spark):
    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            (1, t0 + dt.timedelta(seconds=2), 20, "click"),
            (1, t0, 10, "view"),
            (1, t0 + dt.timedelta(seconds=5), 30, "purchase"),
            (2, t0, 11, "error"),
        ],
        ["user_id", "ts", "event_id", "event_type"],
    )
    got = {r.key: r.seq_str for r in user_event_strings(ev).collect()}
    assert got == {1: "vcp", 2: "e"}


def test_sequence_pattern_counts_golden(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: v c p ; user 2: v p ; user 3: c v p
    seqs = {1: ["view", "click", "purchase"],
            2: ["view", "purchase"],
            3: ["click", "view", "purchase"]}
    eid = 0
    for u, names in seqs.items():
        for i, n in enumerate(names):
            eid += 1
            rows.append((u, t0 + dt.timedelta(seconds=i), eid, n))
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "event_type"])
    got = {r.pattern: r.n_users for r in
           sequence_pattern_counts(ev, ["v.*c.*p", "v.*p", "c.*v"]).collect()}
    assert got == {"v.*c.*p": 1, "v.*p": 3, "c.*v": 1}


def test_mann_kendall_hand_cases(spark):
    """Strictly rising series → S = n(n-1)/2, significant once n is
    large enough; constant series → var_num = 0 guard, insignificant;
    ties reduce var_num by the exact correction term."""
    import datetime as dt

    from sea_express_customs_etl_spark.operators.stats_tests import (
        mann_kendall_trend,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    # 'up': 12 hourly buckets with strictly increasing values
    for h in range(12):
        rows.append(("up", base + dt.timedelta(hours=h), float(h + 1)))
    # 'flat': constant value in 6 buckets -> all-tie, var_num = 0
    for h in range(6):
        rows.append(("flat", base + dt.timedelta(hours=h), 2.0))
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )
    out = {r.event_type: r for r in mann_kendall_trend(df).collect()}
    up = out["up"]
    n = 12
    assert up.s_stat == n * (n - 1) // 2 == 66
    assert up.var_num == n * (n - 1) * (2 * n + 5)  # no ties
    assert up.trend == 1
    # z^2 = 18*66^2/8364 = 9.37 >= 3.8416 -> significant
    assert up.significant == 1
    flat = out["flat"]
    assert (flat.s_stat, flat.var_num, flat.trend, flat.significant) == (
        0,
        0,
        0,
        0,
    )


def test_theil_sen_hand_case(spark):
    """Perfect line -> slope exactly 3000*1e6 (milli-units/hour);
    one outlier hour leaves the MEDIAN slope untouched where the OLS
    slope would shatter; lower-median spec on even pair counts."""
    import datetime as dt

    from sea_express_customs_etl_spark.operators.theilsen import (
        theil_sen_slope,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    # 'line': value = 3*h exactly, 9 buckets
    for h in range(9):
        rows.append(("line", base + dt.timedelta(hours=h), float(3 * h)))
    # 'outl': same line but hour 4 spiked 1000x
    for h in range(9):
        v = 3000.0 if h == 4 else float(3 * h)
        rows.append(("outl", base + dt.timedelta(hours=h), v))
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )
    out = {r.event_type: r for r in theil_sen_slope(df).collect()}
    line = out["line"]
    assert line.n_buckets == 9 and line.n_pairs == 36
    assert line.slope_u6 == 3000 * 1_000_000  # 3.0/hour in milli-u6
    # robustness: 16 of 36 pairs touch the outlier, median survives
    assert out["outl"].slope_u6 == 3000 * 1_000_000
