"""Wave-Z goldens: KMV digest vs a hashlib recomputation, decile
migration bucket arithmetic, DiD rational identity."""

import hashlib

import pyspark.sql.functions as F

from sea_express_customs_etl_spark.operators.deciles import (
    decile_migration,
    decile_of,
)
from sea_express_customs_etl_spark.operators.kmv import kmv_distinct


def _h60(key: str, salt: str = "kmv|") -> int:
    return int(hashlib.md5((salt + key).encode()).hexdigest()[:15], 16)


def test_kmv_digest_matches_hashlib(spark):
    keys = list(range(1, 31))
    df = spark.createDataFrame(
        [("g", k) for k in keys] * 2, ["grp", "key"]  # dups must not count
    )
    row = kmv_distinct(df, "grp", "key", k=8).collect()[0]
    hs = sorted(_h60(str(k)) for k in keys)
    assert row.k_used == 8
    assert row.kth_min_h == hs[7]
    assert row.est_distinct == (7 * (1 << 60)) // hs[7]


def test_kmv_small_group_uses_all_keys(spark):
    df = spark.createDataFrame([("g", 1), ("g", 2)], ["grp", "key"])
    row = kmv_distinct(df, "grp", "key", k=16).collect()[0]
    hs = sorted(_h60(str(k)) for k in (1, 2))
    assert row.k_used == 2 and row.kth_min_h == hs[1]


def test_decile_of_bucket_arithmetic(spark):
    # 20 keys, spend == key: rank 1 is key 20 → bucket 0; rank 20 is
    # key 1 → bucket (19*10) DIV 20 = 9
    df = spark.createDataFrame(
        [(k, k * 100) for k in range(1, 21)], ["cust", "sp"]
    )
    buckets = {r.cust: r.bucket for r in decile_of(df, "cust", "sp").collect()}
    assert buckets[20] == 0 and buckets[19] == 0
    assert buckets[1] == 9 and buckets[2] == 9
    assert buckets[11] == 4  # rank 10 → (9*10) DIV 20 = 4


def test_decile_migration_reversal(spark):
    # period 2 reverses the spend order: top decile keys land in the
    # bottom decile and vice versa
    rows = [(k, 1, k * 100) for k in range(1, 21)] + [
        (k, 2, (21 - k) * 100) for k in range(1, 21)
    ]
    df = spark.createDataFrame(rows, ["cust", "period", "sp"])
    out = {(r.decile_from, r.decile_to): r.n_keys
           for r in decile_migration(df, "cust", "period", "sp", 1, 2).collect()}
    assert out[(0, 9)] == 2  # keys 20, 19
    assert out[(9, 0)] == 2  # keys 1, 2
    assert sum(out.values()) == 20


def test_did_lift_rational_identity(spark):
    import datetime as dt

    from sea_express_customs_etl_spark.operators.abtest import did_lift

    pre, post = dt.datetime(2024, 1, 10), dt.datetime(2024, 1, 20)
    rows = []
    for uid in range(1, 30):
        rows.append((uid, pre, float(uid)))
        rows.append((uid, post, float(2 * uid)))
    ev = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    r = did_lift(ev, "2024-01-16").collect()[0]
    # exact identity: did_num == (sy_T - sx_T)·n_C - (sy_C - sx_C)·n_T
    assert int(r.did_num) == (
        (r.sum_post_treat_c - r.sum_pre_treat_c) * r.n_ctrl
        - (r.sum_post_ctrl_c - r.sum_pre_ctrl_c) * r.n_treat
    )
    assert int(r.did_den) == r.n_treat * r.n_ctrl
    assert r.n_treat + r.n_ctrl == 29


def _gini_score_u6(pairs):
    # brute-force mirror of the integer split score
    import itertools

    xs = sorted({x for x, _ in pairs})
    nn = len(pairs)
    pp = sum(y for _, y in pairs)
    best = None
    for t in xs:
        left = [(x, y) for x, y in pairs if x <= t]
        n_l, p_l = len(left), sum(y for _, y in left)
        n_r, p_r = nn - n_l, pp - p_l
        if n_r == 0:
            continue
        g_l = n_l * n_l - p_l * p_l - (n_l - p_l) ** 2
        g_r = n_r * n_r - p_r * p_r - (n_r - p_r) ** 2
        s = (1_000_000 * (g_l * n_r + g_r * n_l)) // (n_l * n_r * nn)
        if best is None or (s, t) < best:
            best = (s, t)
    return best


def test_tree_depth2_matches_bruteforce(spark):
    from sea_express_customs_etl_spark.operators.stump import tree_depth2

    pairs = [(x, 1 if x in (1, 2, 7, 8, 9) else 0) for x in range(1, 13)
             for _ in range(x % 3 + 1)]
    df = spark.createDataFrame(pairs, ["x", "y"])
    rows = {r.node: r for r in
            tree_depth2(df, F.col("x"), F.col("y")).collect()}
    s_root, t_root = _gini_score_u6(pairs)
    assert rows["root"].split_value == t_root
    assert rows["root"].score_u6 == s_root
    left = [(x, y) for x, y in pairs if x <= t_root]
    right = [(x, y) for x, y in pairs if x > t_root]
    for node, sub in (("left", left), ("right", right)):
        exp = _gini_score_u6(sub)
        if exp is None:
            assert node not in rows
        else:
            assert rows[node].split_value == exp[1]
            assert rows[node].score_u6 == exp[0]
    assert rows["root"].n_left == len(left)
    assert rows["root"].n_right == len(right)
