"""Split-conformal coverage (operators/conformal.py): exact-k rank
selection, the finite-sample guarantee on an exchangeable synthetic,
and the D-scale residual arithmetic against a pure-Python replica."""

from sea_express_customs_etl_spark.operators.conformal import (
    split_conformal_coverage,
)


def _rows(n=400):
    """y = 3x + noise, noise deterministic pseudo-random and
    id-exchangeable (depends on a hash-ish mix, not on parity)."""
    rows = []
    for i in range(n):
        x = (i * 37 % 100) + 1
        noise = ((i * 2654435761) % 1000) - 500
        y = 3 * x + noise
        rows.append((i, x, y))
    return rows


def _pure(rows, alpha_ppm=100_000):
    cal = [(i, x, y) for i, x, y in rows if i % 2 == 0]
    test = [(i, x, y) for i, x, y in rows if i % 2 == 1]
    n = len(cal)
    s = sum(x for _, x, _ in cal)
    t = sum(y for _, _, y in cal)
    sxy = sum(x * y for _, x, y in cal)
    sxx = sum(x * x for _, x, _ in cal)
    cxy, cxx = n * sxy - s * t, n * sxx - s * s

    def rs(x, y):
        return abs(n * cxx * y - (n * cxy * x + (t * cxx - s * cxy)))

    cal_rs = sorted((rs(x, y), i) for i, x, y in cal)
    k = min(n, ((n + 1) * (1_000_000 - alpha_ppm) + 999_999) // 1_000_000)
    q = cal_rs[k - 1][0]
    covered = sum(1 for i, x, y in test if rs(x, y) <= q)
    return {
        "n_cal": n,
        "n_test": len(test),
        "k_rank": k,
        "qhat_c": q // (n * cxx),
        "covered": covered,
        "coverage_ppm": 1_000_000 * covered // len(test),
    }


def test_matches_pure_python_replica(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, "uid int, x_c bigint, y_c bigint")
    got = split_conformal_coverage(df, "x_c", "y_c", "uid").collect()[0]
    exp = _pure(rows)
    for key, val in exp.items():
        assert getattr(got, key) == val, key


def test_coverage_guarantee_holds(spark):
    rows = _rows(1000)
    df = spark.createDataFrame(rows, "uid int, x_c bigint, y_c bigint")
    got = split_conformal_coverage(df, "x_c", "y_c", "uid").collect()[0]
    # finite-sample marginal guarantee: >= 1 - alpha in expectation;
    # allow the usual sampling slack below, none needed above
    assert got.coverage_ppm >= 870_000
    assert got.k_rank == min(
        got.n_cal, ((got.n_cal + 1) * 900_000 + 999_999) // 1_000_000
    )


def test_label_sets_match_pure_replica(spark):
    from sea_express_customs_etl_spark.operators.conformal_cls import (
        conformal_label_sets,
    )

    rows = []
    for i in range(300):
        truth = 1 if (i * 7 % 10) < 4 else 0
        # weak signal + deterministic noise
        score = (40 if truth else -40) + ((i * 2654435761) % 200) - 100
        rows.append((i, score, truth))
    df = spark.createDataFrame(rows, "doc_id int, score int, truth int")
    got = conformal_label_sets(df).collect()[0]

    cal = sorted(
        (-(2 * t - 1) * s, i) for i, s, t in rows if i % 2 == 0
    )
    n = len(cal)
    k = min(n, ((n + 1) * 900_000 + 999_999) // 1_000_000)
    q = cal[k - 1][0]
    test = [(s, t) for i, s, t in rows if i % 2 == 1]
    covered = sum(
        1 for s, t in test if -(2 * t - 1) * s <= q
    )
    n_both = sum(1 for s, _ in test if -s <= q and s <= q)
    n_none = sum(1 for s, _ in test if -s > q and s > q)
    assert got.n_cal == n and got.k_rank == k and got.q_score == q
    assert got.covered == covered
    assert got.n_both == n_both and got.n_empty == n_none
    assert got.n_single == len(test) - n_both - n_none
    assert got.coverage_ppm == 1_000_000 * covered // len(test)
    assert got.coverage_ppm >= 870_000  # the guarantee, with slack
