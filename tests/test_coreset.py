"""Unit tests for operators/coreset.py: python brute-force mirror of
the greedy facility-location trajectory, plus the coverage property
(greedy's total coverage is optimal here by exhaustive check)."""

from __future__ import annotations

import itertools
import math

import pyspark.sql.functions as F

from sea_express_customs_etl_spark.operators.coreset import (
    facility_location_select,
)


def _sim(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return max(0, int(math.floor(1_000_000 * dot / (na * nb) + 0.5)))


def _coverage(vecs, pool_ids, sel):
    return sum(
        max((_sim(v, vecs[c]) for c in sel), default=0)
        for v in vecs.values()
    )


def test_matches_brute_force_greedy_and_covers(spark):
    # three directions: greedy must pick one exemplar per direction
    # before a second from any direction
    vecs = {
        0: [1.0, 0.0, 0.05, 0.0],
        1: [0.95, 0.02, 0.0, 0.0],
        2: [0.0, 1.0, 0.0, 0.03],
        3: [0.02, 0.97, 0.0, 0.0],
        4: [0.0, 0.0, 1.0, 0.02],
        5: [0.01, 0.0, 0.98, 0.0],
        6: [0.5, 0.5, 0.0, 0.0],
    }
    pool_ids = [0, 2, 4, 6]
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], ["vec_id", "embedding"]
    )
    got = sorted(
        (r.sel_rank, r.vec_id, r.gain_u6)
        for r in facility_location_select(
            df, df.filter(F.col("vec_id") < 7).filter(
                F.col("vec_id").isin(pool_ids)
            ), k=3,
        ).collect()
    )
    # python greedy mirror with identical integer semantics
    cover = {i: 0 for i in vecs}
    sel = []
    want = []
    for step in range(1, 4):
        best = None
        for c in pool_ids:
            if c in sel:
                continue
            gain = sum(
                max(0, _sim(v, vecs[c]) - cover[i])
                for i, v in vecs.items()
            )
            key = (gain, -c)
            if best is None or key > best[0]:
                best = (key, c, gain)
        sel.append(best[1])
        want.append((step, best[1], best[2]))
        for i, v in vecs.items():
            cover[i] = max(cover[i], _sim(v, vecs[best[1]]))
    assert got == sorted(want)
    # coverage behavior: the diagonal 6 covers two directions at once
    # and wins first; the orthogonal direction 4 must be picked (no
    # other exemplar covers it)
    assert sel[0] == 6 and 4 in sel and len(set(sel)) == 3
    # Nemhauser bound vs the exhaustive optimum: greedy >= (1-1/e)·OPT
    # (this instance shows genuine suboptimality — greedy takes the
    # two-direction diagonal first and lands at ~96% of OPT, exactly
    # the behavior the bound prices in)
    best_cov = max(
        _coverage(vecs, pool_ids, s)
        for s in itertools.combinations(pool_ids, 3)
    )
    got_cov = _coverage(vecs, pool_ids, sel)
    assert got_cov * 1000 >= 632 * best_cov
    assert got_cov < best_cov  # and the instance is genuinely hard
