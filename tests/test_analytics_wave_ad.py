"""Wave-AD goldens: prefix filter losslessness vs a python brute
force, 2-hop reach on a hand graph."""

import itertools

import pyspark.sql.functions as F

from sea_express_customs_etl_spark.operators.ppjoin import (
    prefix_jaccard_join,
)
from sea_express_customs_etl_spark.operators.reach import two_hop_reach


def test_prefix_join_matches_bruteforce(spark):
    texts = {
        1: "alpha beta gamma delta",
        2: "alpha beta gamma epsilon",      # J(1,2) = 3/5 -> kept
        3: "alpha beta gamma delta",        # exact dup of 1 -> collapsed
        4: "zeta eta theta iota",           # disjoint
        5: "alpha beta gamma delta kappa",  # J(1,5) = 4/5 -> kept
        6: "alpha zeta eta theta",          # J(4,6) = 3/5 -> kept
    }
    docs = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    got = {(r.id_a, r.id_b): (r.n_inter, r.n_union)
           for r in prefix_jaccard_join(docs).collect()}
    reps = {}
    for i, t in sorted(texts.items()):
        reps.setdefault(t, i)
    sets = {i: set(t.split()) for t, i in reps.items()}
    exp = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if 5 * inter >= 3 * union:
            exp[(a, b)] = (inter, union)
    assert got == exp
    assert (1, 2) in got and (1, 5) in got and (4, 6) in got
    assert all(3 not in k for k in got)  # dup collapsed to rep 1


def test_two_hop_reach_golden(spark):
    # path graph 1-2-3-4 plus edge 2-5
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (2, 5)], ["src", "dst"]
    )
    rows = {r.node: r for r in two_hop_reach(e).collect()}
    assert rows[1].n_1hop == 1 and rows[1].n_2hop == 3  # {2,3,5}
    assert rows[2].n_1hop == 3 and rows[2].n_2hop == 4  # {1,3,5,4}
    assert rows[3].n_1hop == 2 and rows[3].n_2hop == 4  # {2,4,1,5}
    assert rows[5].n_1hop == 1 and rows[5].n_2hop == 3  # {2,1,3}


def test_time_decay_shares_sum_and_weights(spark):
    import datetime as dt

    from sea_express_customs_etl_spark.operators.attribution import (
        time_decay_attribution,
    )

    conv_ts = dt.datetime(2024, 1, 2, 12, 0, 0)
    # touches at 1h, 7h, 23h before -> buckets 0, 1, 3 -> weights 8,4,1
    rows = [
        (1, conv_ts, 100, 1_000_003, conv_ts - dt.timedelta(hours=1), 11),
        (1, conv_ts, 100, 1_000_003, conv_ts - dt.timedelta(hours=7), 12),
        (1, conv_ts, 100, 1_000_003, conv_ts - dt.timedelta(hours=23), 13),
    ]
    pairs = spark.createDataFrame(
        rows,
        ["user_id", "ts", "event_id", "value_u6", "prior_ts",
         "prior_event_id"],
    )
    out = {r.prior_event_id: r for r in
           time_decay_attribution(pairs, "event_id", "value_u6").collect()}
    assert [out[i].decay_bucket for i in (11, 12, 13)] == [0, 1, 3]
    total = 1_000_003
    w = {11: 8, 12: 4, 13: 1}
    base = {i: (total * wi) // 13 for i, wi in w.items()}
    rem = total - sum(base.values())
    base[11] += rem  # most recent touch gets the remainder
    assert {i: out[i].share_u6 for i in w} == base
    assert sum(r.share_u6 for r in out.values()) == total


def test_trimmed_sums_golden(spark):
    from sea_express_customs_etl_spark.operators.quantiles import (
        trimmed_sums,
    )

    vals = list(range(1, 21))  # n=20, trim 2 each side -> keep 3..18
    df = spark.createDataFrame(
        [("a", i, v) for i, v in enumerate(vals)], ["g", "id", "v"]
    )
    row = trimmed_sums(df, "g", "v", "id").collect()[0]
    assert row.n_rows == 20 and row.n_kept == 16
    assert row.sum_kept_u6 == sum(range(3, 19))
