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
