"""Wave-E operator tests: CMS join-size estimate, classifier
confusion stats, multi-source BFS — pure-Python references."""

from __future__ import annotations

import hashlib

from sea_express_customs_etl_spark.operators.graph import bfs_hops
from sea_express_customs_etl_spark.operators.perceptron import confusion_stats
from sea_express_customs_etl_spark.operators.sketches import cms_join_size


def _py_cms(values, d=4, w=256):
    cells: dict[tuple[int, int], int] = {}
    for v in values:
        for i in range(d):
            h = int(
                hashlib.md5(f"{i}|{v}".encode()).hexdigest()[:12], 16
            )
            cells[(i, h % w)] = cells.get((i, h % w), 0) + 1
    return cells


def test_cms_join_size_matches_python_and_dominates_truth(spark):
    la = [(i % 40,) for i in range(200)]
    lb = [((i * 3) % 55,) for i in range(300)]
    a = spark.createDataFrame(la, ["k"])
    b = spark.createDataFrame(lb, ["k"])
    got = cms_join_size(a, b, "k", "k").collect()[0].est_pairs
    ca, cb = _py_cms([v for v, in la]), _py_cms([v for v, in lb])
    want = min(
        sum(
            ca[(i, c)] * cb.get((i, c), 0)
            for (r, c) in ca
            if r == i
        )
        for i in range(4)
    )
    assert got == want
    # one-sided error: the estimate never undershoots the true size
    from collections import Counter

    na, nb = Counter(v for v, in la), Counter(v for v, in lb)
    true = sum(na[k] * nb.get(k, 0) for k in na)
    assert got >= true


def test_confusion_stats_golden(spark):
    rows = (
        [(1, 1)] * 6   # tp
        + [(1, 0)] * 2  # fp
        + [(0, 1)] * 1  # fn
        + [(0, 0)] * 11  # tn
    )
    df = spark.createDataFrame(rows, ["pred", "truth"])
    r = confusion_stats(df, "pred", "truth").collect()[0]
    assert (r.tp, r.fp, r.fn, r.tn) == (6, 2, 1, 11)
    assert r.precision_ppm == (10**6 * 6) // 8
    assert r.recall_ppm == (10**6 * 6) // 7
    assert r.accuracy_ppm == (10**6 * 17) // 20


def test_confusion_stats_no_positive_predictions(spark):
    df = spark.createDataFrame([(0, 1), (0, 0)], ["pred", "truth"])
    r = confusion_stats(df, "pred", "truth").collect()[0]
    assert r.precision_ppm == 0 and r.recall_ppm == 0


def _py_bfs(edges, seeds, max_hops):
    adj: dict[int, set[int]] = {}
    for s, t in edges:
        adj.setdefault(s, set()).add(t)
    nodes = set(adj)
    dist = {s: 0 for s in seeds if s in nodes}
    frontier = set(dist)
    for h in range(1, max_hops + 1):
        nxt = set()
        for n in frontier:
            for m in adj.get(n, ()):
                if m not in dist:
                    nxt.add(m)
        for m in nxt:
            dist[m] = h
        frontier = nxt
    return dist


def test_bfs_hops_matches_python(spark):
    # chain with a branch and a far tail beyond max_hops; symmetric
    und = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (2, 7), (8, 9)]
    edges = und + [(b, a) for a, b in und]
    e = spark.createDataFrame(edges, ["src", "dst"])
    seeds = spark.createDataFrame([(1,), (99,)], ["node"])  # 99 not in graph
    got = {r.node: r.hop for r in bfs_hops(e, seeds, max_hops=3).collect()}
    want = _py_bfs(edges, [1, 99], 3)
    assert got == want
    assert got[1] == 0 and got[2] == 1 and got[7] == 2 and got[4] == 3
    assert 5 not in got and 8 not in got and 99 not in got


def _py_skipgrams(texts, window, min_count):
    from collections import Counter

    c: Counter = Counter()
    for t in texts:
        toks = t.lower().split()
        for i, a in enumerate(toks):
            for off in range(1, window + 1):
                if i + off < len(toks):
                    c[(a, toks[i + off])] += 1
    return {k: v for k, v in c.items() if v >= min_count}


def test_skipgram_pairs_match_python(spark):
    from sea_express_customs_etl_spark.operators.collocations import (
        skipgram_pairs,
    )

    texts = [
        "a b c a b c",
        "a b a b a b a",
        "c c c",
        "x",          # single token: no pairs, guarded sequence branch
        "",           # empty: filtered array, no pairs
    ] * 3
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        (r.a, r.b): r.n
        for r in skipgram_pairs(df, window=2, min_count=3, k=100).collect()
    }
    assert got == _py_skipgrams(texts, 2, 3)


def test_top_terms_per_doc_rare_term_wins(spark):
    from sea_express_customs_etl_spark.operators.textstats import (
        top_terms_per_doc,
    )

    # "rare" appears once in doc 1 only; "common" is everywhere —
    # idf must rank rare above common despite equal tf
    docs = [(1, "common rare"), (2, "common x"), (3, "common y")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r.doc_id, r.term): r.score
        for r in top_terms_per_doc(df, k=1).collect()
    }
    assert set(got) == {(1, "rare"), (2, "x"), (3, "y")}
    assert got[(1, "rare")] == 1 * ((3 * 1000) // 1)


def test_edge_churn_golden(spark):
    from sea_express_customs_etl_spark.operators.graph import edge_churn

    # A: {1-2, 2-3, 3-4}   B: {2-3, 3-4, 4-5, 5-6} -> kept 2, new 2, lost 1
    ea = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 4)], ["src", "dst"]
    )
    eb = spark.createDataFrame(
        [(3, 2), (4, 3), (4, 5), (6, 5), (5, 6)], ["src", "dst"]
    )
    r = edge_churn(ea, eb).collect()[0]
    assert (r.n_kept, r.n_new, r.n_lost) == (2, 2, 1)
    assert r.jaccard_ppm == (1_000_000 * 2) // 5


def test_categorical_lift_golden(spark):
    from sea_express_customs_etl_spark.operators.featsel import (
        categorical_lift,
    )

    # perfect affinity: x only with p, y only with q -> lift 2.0; off-
    # diagonal pairs absent (no row emitted, not lift 0)
    rows = [("x", "p")] * 5 + [("y", "q")] * 5
    df = spark.createDataFrame(rows, ["seg", "prio"])
    got = {
        (r.a, r.b): r.lift_ppm
        for r in categorical_lift(df, "seg", "prio").collect()
    }
    assert got == {("x", "p"): 2_000_000, ("y", "q"): 2_000_000}
    # independence: uniform cross -> every cell exactly 1e6
    rows2 = [(s, p) for s in "xy" for p in "pq" for _ in range(3)]
    df2 = spark.createDataFrame(rows2, ["seg", "prio"])
    got2 = {
        (r.a, r.b): r.lift_ppm
        for r in categorical_lift(df2, "seg", "prio").collect()
    }
    assert set(got2.values()) == {1_000_000}
