"""Goldens for wave L: min-plus shortest paths, CF holdout eval,
positional phrase search, hour-of-day seasonal profile."""

import datetime as dt

import pyspark.sql.functions as F


def _paths(spark, edges, seeds, rounds):
    from sea_express_customs_etl_spark.operators.graph import min_plus_paths

    e = spark.createDataFrame(edges, ["src", "dst", "w_cost"])
    s = spark.createDataFrame([(x,) for x in seeds], ["node"])
    return {
        r.node: r.cost for r in min_plus_paths(e, s, rounds=rounds).collect()
    }


def test_min_plus_relaxation_beats_direct_edge(spark):
    edges = [(1, 2, 5), (2, 3, 1), (1, 3, 10)]
    assert _paths(spark, edges, [1], 3) == {1: 0, 2: 5, 3: 6}


def test_min_plus_round_bound(spark):
    # with a single sweep only the direct edge is relaxed
    edges = [(1, 2, 5), (2, 3, 1), (1, 3, 10)]
    assert _paths(spark, edges, [1], 1) == {1: 0, 2: 5, 3: 10}


def test_min_plus_unreachable_absent_multi_seed(spark):
    edges = [(1, 2, 3), (4, 5, 7)]
    got = _paths(spark, edges, [1, 4], 2)
    assert got == {1: 0, 2: 3, 4: 0, 5: 7}  # no node 99, no cross paths


def test_cf_holdout_eval_invariants(spark):
    from sea_express_customs_etl_spark.operators.cf import cf_holdout_eval

    rows = [
        (u, i)
        for u in range(30)
        for i in range(20)
        if (u * 7 + i * 3) % 4 != 0
    ]
    df = spark.createDataFrame(rows, ["user_id", "item_id"])
    r = cf_holdout_eval(df, test_fraction=0.5, min_cooc=2, k=5).collect()[0]
    assert 0 <= r.n_hits <= r.n_recs
    assert r.hit_ppm == (1_000_000 * r.n_hits) // r.n_recs
    assert r.n_recs <= r.n_users * 5


def test_cf_holdout_eval_empty_test_split(spark):
    from sea_express_customs_etl_spark.operators.cf import cf_holdout_eval

    rows = [(u, i) for u in range(6) for i in range(4)]
    df = spark.createDataFrame(rows, ["user_id", "item_id"])
    r = cf_holdout_eval(df, test_fraction=0.0, min_cooc=2, k=3).collect()[0]
    assert (r.n_users, r.n_recs, r.n_hits) == (0, 0, 0)
    assert r.hit_ppm is None


def test_phrase_match_adjacency_not_cooccurrence(spark):
    from sea_express_customs_etl_spark.operators.textstats import (
        phrase_match_topk,
    )

    docs = [
        (1, "a b x a b"),   # 2 adjacent occurrences
        (2, "a x b"),       # co-occur but not adjacent
        (3, "b a"),         # wrong order
        (4, "a b"),         # 1 occurrence
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r.doc_id: r.n_hits for r in
           phrase_match_topk(df, ["a", "b"], k=10).collect()}
    assert got == {1: 2, 4: 1}


def test_phrase_match_three_terms_and_k(spark):
    from sea_express_customs_etl_spark.operators.textstats import (
        phrase_match_topk,
    )

    docs = [(i, "u v w " * (i + 1)) for i in range(5)] + [(9, "u w v")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = phrase_match_topk(df, ["u", "v", "w"], k=3).collect()
    assert [(r.doc_id, r.n_hits) for r in out] == [(4, 5), (3, 4), (2, 3)]


def test_seasonal_profile_flat_series_is_unity(spark):
    from sea_express_customs_etl_spark.operators.timeseries import (
        seasonal_hour_profile,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(hours=i), 1, "t", 2.5, "{}")
        for i in range(48)
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = seasonal_hour_profile(df).collect()
    assert len(out) == 24
    assert all(r.seasonal_ppm == 1_000_000 and r.n_events == 2 for r in out)


def test_seasonal_profile_hot_hour_index(spark):
    from sea_express_customs_etl_spark.operators.timeseries import (
        seasonal_hour_profile,
    )

    base = dt.datetime(2024, 1, 1)
    # hour 0: value 30, hour 1: value 10 -> type mean 20;
    # indexes 1.5e6 and 0.5e6
    rows = [
        (0, base, 1, "t", 30.0, "{}"),
        (1, base + dt.timedelta(hours=1), 1, "t", 10.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    got = {r.hour_of_day: r.seasonal_ppm
           for r in seasonal_hour_profile(df).collect()}
    assert got == {0: 1_500_000, 1: 500_000}
