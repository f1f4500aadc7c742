"""Unit tests for linear attribution (operators/attribution.py)."""

from __future__ import annotations


def test_linear_attribution_exact_split_and_remainder(spark):
    from sea_express_customs_etl_spark.operators.attribution import (
        linear_attribution,
    )

    pairs = spark.createDataFrame(
        [  # conversion 1: value 10 over 3 touches -> 4, 3, 3
            (1, 10, 100, 5), (1, 10, 200, 3), (1, 10, 300, 9),
            # conversion 2: single touch takes everything
            (2, 7, 150, 1),
        ],
        "conv long, value_u long, touch_ts long, touch_id long",
    )
    got = linear_attribution(
        pairs, "conv", "value_u", ["touch_ts", "touch_id"]
    ).collect()
    by_conv = {}
    for r in got:
        by_conv.setdefault(r.conv, []).append(r)
    c1 = sorted(by_conv[1], key=lambda r: r.touch_ts)
    # earliest touch (ts=100) gets floor + remainder: 3 + 1 = 4
    assert [r.share_u for r in c1] == [4, 3, 3]
    assert sum(r.share_u for r in c1) == 10  # exact
    assert all(r.n_touches == 3 for r in c1)
    (c2,) = by_conv[2]
    assert (c2.share_u, c2.n_touches) == (7, 1)
