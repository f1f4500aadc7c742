"""Unit tests for operators/fuzzy.py: blocked Levenshtein linkage."""

from __future__ import annotations

from sea_express_customs_etl_spark.operators.fuzzy import (
    best_match,
    fuzzy_join,
)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "almond antique blue"), (2, "burnished steel rose"), (3, "cornflower navy")],
        ["lid", "t"],
    )
    right = spark.createDataFrame(
        [
            (10, "almond antique blue"),   # exact -> dist 0
            (11, "amond antique blue"),    # front deletion -> suffix block
            (12, "burnished steel rosy"),  # tail substitution -> prefix block
            (13, "zzzz completely other"),  # no match
        ],
        ["rid", "qt"],
    )
    return left, right


def test_fuzzy_join_finds_front_and_tail_edits(spark):
    left, right = _frames(spark)
    m = fuzzy_join(left, right, "lid", "rid", "t", "qt", max_dist=2)
    got = {(r.lid, r.rid): r.dist for r in m.collect()}
    assert got[(1, 10)] == 0
    assert got[(1, 11)] == 1  # caught by the reverse-prefix pass
    assert got[(2, 12)] == 1  # caught by the leading-prefix pass
    assert not any(rid == 13 for (_, rid) in got)


def test_fuzzy_join_documented_blocking_miss(spark):
    # edits at BOTH ends escape both blocking passes — the stated
    # recall contract, pinned so a future blocking change is noticed
    left = spark.createDataFrame([(1, "abcdefghij")], ["lid", "t"])
    right = spark.createDataFrame([(20, "XbcdefghiY")], ["rid", "qt"])
    m = fuzzy_join(left, right, "lid", "rid", "t", "qt", max_dist=2)
    assert m.count() == 0


def test_best_match_tiebreak_is_deterministic(spark):
    left = spark.createDataFrame(
        [(5, "house"), (7, "house"), (9, "mouse")], ["lid", "t"]
    )
    right = spark.createDataFrame([(1, "house")], ["rid", "qt"])
    m = fuzzy_join(left, right, "lid", "rid", "t", "qt", max_dist=2)
    top = best_match(m, "rid", "lid").collect()
    assert len(top) == 1
    # dist 0 beats dist 1; equal-dist ties resolve to the lower lid
    assert top[0].lid == 5 and top[0].dist == 0


def test_fuzzy_join_layout_invariance(spark):
    left = spark.createDataFrame(
        [(i, f"token number {i % 13} payload") for i in range(60)], ["lid", "t"]
    )
    right = spark.createDataFrame(
        [(i, f"token number {i % 13} payloaX") for i in range(60)], ["rid", "qt"]
    )
    a = sorted(
        map(tuple, fuzzy_join(left, right, "lid", "rid", "t", "qt").collect())
    )
    b = sorted(
        map(
            tuple,
            fuzzy_join(
                left.repartition(7), right.repartition(5), "lid", "rid", "t", "qt"
            ).collect(),
        )
    )
    assert a == b and len(a) > 0


def test_fuzzy_best_link_equals_best_match_of_fuzzy_join(spark):
    """The fused dictionary-grained top-1 must equal the compositional
    form — including on repeated texts (where the fusion matters) and
    distance/id tie-breaks."""
    from sea_express_customs_etl_spark.operators.fuzzy import fuzzy_best_link

    left = spark.createDataFrame(
        [(7, "house"), (3, "house"), (5, "mouse"), (9, "spouse"),
         (11, "zebra")],
        ["lid", "t"],
    )
    right = spark.createDataFrame(
        [(1, "house"), (2, "housef"), (4, "house"), (6, "qqqqq")],
        ["rid", "qt"],
    )
    composed = {
        (r.rid, r.lid, r.dist)
        for r in best_match(
            fuzzy_join(left, right, "lid", "rid", "t", "qt", max_dist=2),
            "rid",
            "lid",
        ).select("rid", "lid", "dist").collect()
    }
    fused = {
        (r.rid, r.lid, r.dist)
        for r in fuzzy_best_link(
            left, right, "lid", "rid", "t", "qt", max_dist=2
        ).collect()
    }
    assert fused == composed
    assert (1, 3, 0) in fused  # repeated 'house': min lid 3 wins
    assert (6, 11, 2) not in fused and not any(r[0] == 6 for r in fused)


def test_snm_pairs_match_reference(spark):
    """Sorted-neighborhood candidates vs a pure-Python sweep."""
    import random as _random

    from sea_express_customs_etl_spark.operators.fuzzy import snm_pairs

    def _lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    rnd = _random.Random(31)
    vals = list(
        {
            "".join(rnd.choice("abcd") for _ in range(rnd.randrange(3, 7)))
            for _ in range(40)
        }
    )
    rows = [(v.upper() if i % 2 else v,) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["t"])
    for window, max_dist in ((3, 2), (2, 1)):
        got = {
            (r.name_a, r.name_b, r.dist)
            for r in snm_pairs(df, "t", window=window, max_dist=max_dist).collect()
        }
        s = sorted(set(v.lower() for v in vals))
        ref = {
            (s[i], s[j], _lev(s[i], s[j]))
            for i in range(len(s))
            for j in range(i + 1, min(i + window, len(s) - 1) + 1)
            if _lev(s[i], s[j]) <= max_dist
        }
        assert got == ref, (window, max_dist)
