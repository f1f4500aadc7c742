"""Wave-AB goldens: business-day closed form vs a python loop,
memorization scores vs a hashlib/python mirror, EWMA lag polynomial."""

import datetime as dt
import hashlib

import pyspark.sql.functions as F

from sea_express_customs_etl_spark.operators.calendar import (
    business_days_between,
)
from sea_express_customs_etl_spark.operators.memorization import (
    memorization_scores,
)
from sea_express_customs_etl_spark.operators.sampling import hex_threshold


def _bizdays_loop(a: dt.date, b: dt.date) -> int:
    sign = 1
    if b < a:
        a, b, sign = b, a, -1
    n, d = 0, a
    while d < b:
        if d.weekday() < 5:
            n += 1
        d += dt.timedelta(days=1)
    return sign * n


def test_business_days_matches_loop(spark):
    cases = [
        (dt.date(2024, 1, 1), dt.date(2024, 1, 8)),   # Mon -> Mon: 5
        (dt.date(2024, 1, 6), dt.date(2024, 1, 7)),   # Sat -> Sun: 0
        (dt.date(2024, 1, 5), dt.date(2024, 1, 9)),   # Fri -> Tue: 2
        (dt.date(2024, 2, 29), dt.date(2024, 3, 15)),
        (dt.date(1995, 7, 3), dt.date(2001, 8, 1)),
        (dt.date(2024, 1, 9), dt.date(2024, 1, 5)),   # reversed: -2
    ]
    df = spark.createDataFrame(cases, ["a", "b"])
    got = [
        r.bd
        for r in df.select(
            business_days_between(F.col("a"), F.col("b")).alias("bd")
        ).collect()
    ]
    assert got == [_bizdays_loop(a, b) for a, b in cases]


def _py_shingles(text: str, n: int = 3) -> set:
    toks = text.strip().split()
    return {
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    } if len(toks) >= n else set()


def test_memorization_matches_python_mirror(spark):
    texts = {
        i: f"alpha beta gamma delta shard{i % 4} epsilon zeta"
        for i in range(1, 25)
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], ["doc_id", "text"]
    )
    t7 = hex_threshold(0.7)
    split = {
        i: "train"
        if hashlib.md5(f"memo{i}".encode()).hexdigest()[:8] < t7
        else "eval"
        for i in texts
    }
    train_sh = set()
    for i, t in texts.items():
        if split[i] == "train":
            train_sh |= _py_shingles(t)
    expected = {}
    for i, t in texts.items():
        if split[i] != "eval":
            continue
        sh = _py_shingles(t)
        seen = len(sh & train_sh)
        expected[i] = (len(sh), seen, (1_000_000 * (len(sh) - seen)) // len(sh))
    got = {
        r.doc_id: (r.n_shingles, r.n_seen, r.novelty_ppm)
        for r in memorization_scores(docs).collect()
    }
    assert got == expected
    assert expected  # the split actually produced eval docs


def test_ewma_hourly_golden(spark):
    from sea_express_customs_etl_spark.operators.timeseries import (
        ewma_hourly,
    )

    base = dt.datetime(2024, 1, 1)
    # one type, three consecutive nonempty hours with values 1, 2, 4
    rows = [
        ("a", base, 1.0),
        ("a", base + dt.timedelta(hours=1), 2.0),
        ("a", base + dt.timedelta(hours=2), 4.0),
    ]
    ev = spark.createDataFrame(rows, ["event_type", "ts", "value"])
    got = {r.hour_id: r.ewma_u6
           for r in ewma_hourly(ev, lags=16).collect()}
    hours = sorted(got)
    v = [1_000_000, 2_000_000, 4_000_000]
    # head: single term, full weight -> ewma == value
    assert got[hours[0]] == v[0]
    # second: (v1*2^15 + v0*2^14) DIV (2^15 + 2^14)
    assert got[hours[1]] == (v[1] * (1 << 15) + v[0] * (1 << 14)) // (
        (1 << 15) + (1 << 14)
    )
    assert got[hours[2]] == (
        v[2] * (1 << 15) + v[1] * (1 << 14) + v[0] * (1 << 13)
    ) // ((1 << 15) + (1 << 14) + (1 << 13))


def test_reservoir_nested_and_uniform_shape(spark):
    from sea_express_customs_etl_spark.operators.sampling import (
        group_reservoir_sample,
    )

    df = spark.createDataFrame(
        [("g", i) for i in range(100)] + [("h", i) for i in range(3)],
        ["grp", "k"],
    )
    s5 = {(r.grp, r.k) for r in
          group_reservoir_sample(df, "grp", "k", k=5).collect()}
    s10 = {(r.grp, r.k) for r in
           group_reservoir_sample(df, "grp", "k", k=10).collect()}
    assert s5 <= s10  # nested-sample property
    assert len([1 for g, _ in s10 if g == "g"]) == 10
    assert len([1 for g, _ in s10 if g == "h"]) == 3  # small group whole


def test_exact_group_median_golden(spark):
    from sea_express_customs_etl_spark.operators.quantiles import (
        exact_group_median,
    )

    rows = [("a", i, v) for i, v in enumerate([5, 1, 9, 3, 7])] + [
        ("b", i + 10, v) for i, v in enumerate([4, 2, 8, 6])
    ]
    df = spark.createDataFrame(rows, ["g", "id", "v"])
    got = {r.g: (r.n_rows, r.median_value)
           for r in exact_group_median(df, "g", "v", "id").collect()}
    assert got == {"a": (5, 5), "b": (4, 4)}  # lower median for even n
