"""Unit tests for operators/mmr.py: python brute-force mirror of the
greedy integer trajectory, and the diversity property MMR exists for."""

from __future__ import annotations

import pyspark.sql.functions as F

from sea_express_customs_etl_spark.operators.mmr import mmr_rerank


def _cos_u6(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = sum(x * x for x in a) ** 0.5
    nb = sum(x * x for x in b) ** 0.5
    v = 1_000_000 * dot / (na * nb)
    import math

    return int(math.floor(v + 0.5))  # HALF_UP, both engines


def _brute_mmr(vecs, qid, k_cand, k_out):
    rel = sorted(
        ((_cos_u6(vecs[qid], v), -i) for i, v in vecs.items() if i != qid),
        reverse=True,
    )[:k_cand]
    cand = [(-negi, r) for r, negi in rel]
    picked = []
    for step in range(k_out):
        best = None
        for cid, r in cand:
            if any(cid == p[0] for p in picked):
                continue
            if picked:
                score = r - max(
                    _cos_u6(vecs[cid], vecs[p[0]]) for p in picked
                )
            else:
                score = r
            key = (score, -cid)
            if best is None or key > best[0]:
                best = (key, cid, r, score)
        picked.append((best[1], step + 1, best[2], best[3]))
    return picked


def test_matches_python_mirror_and_diversifies(spark):
    # two tight clusters + the query near cluster A: pure top-2 stays
    # inside A; MMR's second pick must cross to cluster B
    vecs = {
        0: [1.0, 0.05, 0.0, 0.0],   # query
        1: [1.0, 0.0, 0.01, 0.0],   # cluster A
        2: [1.0, 0.01, 0.0, 0.01],  # cluster A
        3: [1.0, 0.02, 0.02, 0.0],  # cluster A
        4: [0.2, 1.0, 0.0, 0.0],    # cluster B
        5: [0.21, 1.0, 0.01, 0.0],  # cluster B
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], ["vec_id", "embedding"]
    )
    got = {
        (r.query_id, r.mmr_rank): (r.neighbor_id, r.rel_u6, r.score_u6)
        for r in mmr_rerank(
            df, df.filter(F.col("vec_id") == 0), k_cand=5, k_out=3
        ).collect()
    }
    want = _brute_mmr(vecs, 0, 5, 3)
    for cid, rank, rel, score in want:
        assert got[(0, rank)] == (cid, rel, score), (rank, got)
    # the diversity property: picks 1 and 2 span both clusters
    first_two = {got[(0, 1)][0], got[(0, 2)][0]}
    assert first_two & {1, 2, 3} and first_two & {4, 5}
    # pure relevance top-2 would NOT have crossed
    by_rel = sorted(
        ((_cos_u6(vecs[0], v), -i) for i, v in vecs.items() if i != 0),
        reverse=True,
    )
    assert {-by_rel[0][1], -by_rel[1][1]} <= {1, 2, 3}
