"""Goldens for wave O: truss peel, Lindley balance, centroid
affinity."""

import pyspark.sql.functions as F


def test_truss_peel_cascades(spark):
    from sea_express_customs_etl_spark.operators.graph import truss_peel

    # triangle 1-2-3 plus pendant triangle-chain: edge (3,4) has
    # support 1 via triangle 3-4-5; but after round 1 nothing drops
    # (all listed edges sit in >= 1 triangle) except the bridge (5,6).
    # Round 2: with (5,6) gone the graph is unchanged otherwise.
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5), (5, 6)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {(r.a, r.b): r.support for r in
           truss_peel(df, k=3, rounds=2).collect()}
    assert got == {
        (1, 2): 1, (2, 3): 1, (1, 3): 1,
        (3, 4): 1, (4, 5): 1, (3, 5): 1,
    }


def test_truss_peel_second_round_drop(spark):
    from sea_express_customs_etl_spark.operators.graph import truss_peel

    # K4 minus one edge (1-2, 1-3, 1-4, 2-3, 2-4): triangles 123, 124.
    # k=4 (support >= 2): round 1 keeps only edges in 2 triangles:
    # (1,2) has support 2; all others 1 -> dropped. Round 2: (1,2)
    # alone has no triangle -> support table empty.
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    assert truss_peel(df, k=4, rounds=2).count() == 0


def test_floored_balance_lindley(spark):
    from sea_express_customs_etl_spark.operators.timeseries import (
        floored_running_balance,
    )

    rows = [(1, i, d) for i, d in enumerate([5, -10, 3, -1, 4])]
    df = spark.createDataFrame(rows, ["u", "i", "d"])
    out = floored_running_balance(df, ["u"], ["i"], F.col("d")).collect()
    got = [(r.balance, r.high_water) for r in sorted(out, key=lambda r: r.i)]
    # clamped: 5, 0, 3, 2, 6 ; high water: 5,5,5,5,6
    assert got == [(5, 5), (0, 5), (3, 5), (2, 5), (6, 6)]


def test_floored_balance_series_independent(spark):
    from sea_express_customs_etl_spark.operators.timeseries import (
        floored_running_balance,
    )

    rows = [(1, 0, -5), (2, 0, 7)]
    df = spark.createDataFrame(rows, ["u", "i", "d"])
    got = {r.u: r.balance for r in
           floored_running_balance(df, ["u"], ["i"], F.col("d")).collect()}
    assert got == {1: 0, 2: 7}


def test_centroid_affinity_signs(spark):
    from sea_express_customs_etl_spark.operators.graph import (
        centroid_affinity,
    )

    rows = [
        (1, [1.0, 0.0], 0), (2, [1.0, 0.0], 0),     # centroid (1000, 0)
        (3, [0.0, 1.0], 1),                          # centroid (0, 1000)
        (4, [-1.0, 0.0], 2),                         # centroid (-1000, 0)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    got = {(r.g_a, r.g_b): (r.dot_sign, r.cos2_ppm)
           for r in centroid_affinity(df).collect()}
    assert got[(0, 1)] == (0, 0)           # orthogonal
    assert got[(0, 2)] == (-1, 1_000_000)  # antipodal: cos² = 1, sign -
    assert got[(1, 2)] == (0, 0)


def test_centroid_affinity_floor_mean_negative(spark):
    from sea_express_customs_etl_spark.operators.graph import (
        centroid_affinity,
    )

    # component sum -1 over n=2 -> floor mean = -1 (floor(-0.5) = -1,
    # NOT trunc 0): the shifted-DIV floor semantics pinned explicitly
    rows = [(1, [0.0005], 0), (2, [-0.0015], 0), (3, [1.0], 1)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    r = centroid_affinity(df).collect()[0]
    # centroid_0 = floor((1 + -2)/2) = -1; centroid_1 = 1000
    assert (r.g_a, r.g_b, r.dot_sign) == (0, 1, -1)
