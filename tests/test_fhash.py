"""Feature-hashing vectorizer vs a pure-Python reference, and the
float-free cosine ranking vs true cosine order."""

from __future__ import annotations

import hashlib
import math
import random


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _ref_vec(text: str, hex_chars: int = 2) -> dict[str, int]:
    v: dict[str, int] = {}
    for tok in text.split():
        h = _md5(tok)
        b = h[:hex_chars]
        s = -1 if h[hex_chars] in "89abcdef" else 1
        v[b] = v.get(b, 0) + s
    return {b: x for b, x in v.items() if x != 0}


def _rand_doc(rnd: random.Random, n: int) -> str:
    return " ".join(f"t{rnd.randrange(60)}" for _ in range(n))


def test_vectors_match_reference(spark):
    from sea_express_customs_etl_spark.operators.fhash import (
        feature_hash_vectors,
    )

    rnd = random.Random(3)
    docs = [(i, _rand_doc(rnd, rnd.randrange(1, 25))) for i in range(30)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got: dict[int, dict[str, int]] = {}
    for r in feature_hash_vectors(df).collect():
        got.setdefault(r.doc_id, {})[r.bucket] = r.val
    ref = {i: v for i, t in docs if (v := _ref_vec(t))}
    assert got == ref


def test_topk_order_matches_true_cosine(spark):
    """The integer sign(dot)·(1e12·dot²) DIV (na·nb) rank must order
    candidates exactly as true float cosine does (it is monotone in
    cosine), with id tie-breaks."""
    from sea_express_customs_etl_spark.operators.fhash import (
        hashed_doc_topk,
    )

    rnd = random.Random(17)
    docs = [(i, _rand_doc(rnd, 20)) for i in range(1, 40)] + [(0, _rand_doc(rnd, 20))]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = [
        (r.neighbor_id, r.score_ppt)
        for r in hashed_doc_topk(df, query_mod=1000, k=5)
        .filter("query_id = 0")
        .orderBy("score_ppt", ascending=False)
        .collect()
    ]
    vecs = {i: _ref_vec(t) for i, t in docs}
    qv = vecs[0]

    def cos(a: dict, b: dict) -> float:
        d = sum(a[k] * b[k] for k in a.keys() & b.keys())
        return d / math.sqrt(
            sum(x * x for x in a.values()) * sum(x * x for x in b.values())
        )

    cands = sorted(
        ((i, cos(qv, v)) for i, v in vecs.items()
         if i != 0 and qv.keys() & v.keys()),
        key=lambda t: (-t[1], t[0]),
    )[:5]
    assert [i for i, _ in got] == [i for i, _ in cands]
    # scores agree with the closed form computed in exact integers
    for (i, ppt), (_, c) in zip(got, cands):
        assert abs(ppt - math.copysign(round(1e12 * c * c), c)) <= 1, (i, ppt, c)


def test_hashed_doc_clusters_group_structure(spark):
    """Planted vocabulary groups separate; identical texts co-cluster;
    a repartitioned re-run is bit-identical (determinism)."""
    from sea_express_customs_etl_spark.operators.fhash import (
        hashed_doc_clusters,
    )

    rnd = random.Random(61)
    docs = []
    for i in range(40):
        g = i % 2
        vocab = [f"g{g}w{j}" for j in range(8)]
        docs.append(
            (i, " ".join(rnd.choice(vocab) for _ in range(25)))
        )
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r.doc_id: r.cluster
        for r in hashed_doc_clusters(df, k=2, iters=2).collect()
    }
    assert len(got) == 40
    # the two planted vocabularies land in different clusters
    c0 = {got[i] for i in range(0, 40, 2)}
    c1 = {got[i] for i in range(1, 40, 2)}
    assert len(c0) == 1 and len(c1) == 1 and c0 != c1
    again = {
        r.doc_id: r.cluster
        for r in hashed_doc_clusters(df.repartition(7), k=2, iters=2).collect()
    }
    assert again == got
