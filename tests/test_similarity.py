"""Unit tests for similarity search (brute-force cosine, IVF)."""

from __future__ import annotations

import pyspark.sql.functions as F

from sea_express_customs_etl_spark.operators.similarity import (
    brute_force_topk,
    ivf_assign,
    ivf_topk,
    kmeans_fit,
)

VECS = [
    (0, [1.0, 0.0, 0.0]),
    (1, [1.0, 0.01, 0.0]),  # nearly parallel to 0
    (2, [0.0, 1.0, 0.0]),
    (3, [0.0, 1.0, 0.01]),
    (4, [-1.0, 0.0, 0.0]),  # anti-parallel to 0
]


def _emb(spark):
    return spark.createDataFrame(VECS, "vec_id long, embedding array<float>")


def test_brute_force_topk_ranking(spark):
    emb = _emb(spark)
    got = brute_force_topk(emb, emb.filter(F.col("vec_id") == 0), k=4).collect()
    order = [r.neighbor_id for r in sorted(got, key=lambda r: -r.cosine)]
    assert order[0] == 1  # most similar first
    assert order[-1] == 4  # anti-parallel last
    assert got[0].query_id == 0 and len(got) == 4


def test_ivf_assign_clusters(spark):
    emb = _emb(spark)
    cents = emb.filter(F.col("vec_id").isin(0, 2))
    got = {r.vec_id: r.cluster for r in ivf_assign(emb, cents).collect()}
    assert got[1] == 0  # near x-axis → centroid 0
    assert got[3] == 2  # near y-axis → centroid 2
    assert got[0] == 0 and got[2] == 2


def test_ivf_topk_stays_in_cluster(spark):
    emb = _emb(spark)
    cents = emb.filter(F.col("vec_id").isin(0, 2))
    queries = emb.filter(F.col("vec_id") == 0)
    got = ivf_topk(emb, cents, queries, k=3).collect()
    # cluster 0 holds {0, 1, 4 is anti-parallel → cluster? -1·x → cos -1 vs 0 for c2 → c2 wins? no: cos(4,c0)=-1, cos(4,c2)=0 → cluster 2}
    neighbors = {r.neighbor_id for r in got}
    assert 1 in neighbors
    assert 2 not in neighbors and 3 not in neighbors  # other cluster unseen


def test_ivf_topk_nprobe_widens_search(spark):
    emb = _emb(spark)
    cents = emb.filter(F.col("vec_id").isin(0, 2))
    queries = emb.filter(F.col("vec_id") == 0)
    # nprobe=2 probes both clusters → sees the y-axis vectors too
    got = ivf_topk(emb, cents, queries, k=4, nprobe=2).collect()
    assert {r.neighbor_id for r in got} >= {1, 2, 3}
    # nprobe=1 result is a prefix-equivalent subset semantics-wise:
    # everything found at nprobe=1 is found at nprobe=2
    n1 = {(r.query_id, r.neighbor_id) for r in ivf_topk(emb, cents, queries, k=2).collect()}
    n2 = {(r.query_id, r.neighbor_id) for r in ivf_topk(emb, cents, queries, k=4, nprobe=2).collect()}
    assert n1 <= n2


def _blob_corpus(spark, blobs=4, per_blob=40, dim=8):
    """Deterministic well-separated blobs: blob b points along axis b
    with small structured jitter."""
    rows = []
    for b in range(blobs):
        for i in range(per_blob):
            v = [0.05 * ((i * 7 + d * 3) % 5) for d in range(dim)]
            v[b] = 1.0 + 0.01 * (i % 3)
            rows.append((b * per_blob + i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kmeans_recovers_blobs(spark):
    emb = _blob_corpus(spark)
    cents = kmeans_fit(emb, k=4, max_iter=5)
    # every trained centroid points dominantly along one blob axis, and
    # all four blob axes are covered
    rows = cents.collect()
    assert len(rows) == 4
    axes = {max(range(8), key=lambda d: r.embedding[d]) for r in rows}
    assert axes == {0, 1, 2, 3}
    # assignment under the trained centroids groups blobs together
    assigned = ivf_assign(emb, cents).collect()
    by_blob: dict[int, set] = {}
    for r in assigned:
        by_blob.setdefault(r.vec_id // 40, set()).add(r.cluster)
    assert all(len(cl) == 1 for cl in by_blob.values())  # blobs intact


def test_kmeans_layout_invariant_assignment(spark):
    """Trained model must not depend on physical layout (float means
    are tolerance-stable here because blobs are tight)."""
    emb = _blob_corpus(spark)
    a = ivf_assign(emb, kmeans_fit(emb, k=4, max_iter=3)).collect()
    b = ivf_assign(
        emb.repartition(13), kmeans_fit(emb.repartition(13), k=4, max_iter=3)
    ).collect()
    pa = {r.vec_id: r.cluster for r in a}
    pb = {r.vec_id: r.cluster for r in b}
    assert pa == pb


def test_kmeans_ivf_recall_floor(spark):
    """VERDICT r1 #6 'done' bar: recall@k of kmeans-trained IVF vs the
    brute-force baseline ≥ a stated floor (0.9 on blob data, nprobe=2)."""
    emb = _blob_corpus(spark)
    queries = emb.filter(F.col("vec_id") % 40 < 2)  # 2 per blob
    exact = brute_force_topk(emb, queries, k=10).collect()
    cents = kmeans_fit(emb, k=4, max_iter=5)
    approx = ivf_topk(emb, cents, queries, k=10, nprobe=2).collect()
    truth: dict[int, set] = {}
    for r in exact:
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    got: dict[int, set] = {}
    for r in approx:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
    total = sum(len(v) for v in truth.values())
    assert hits / total >= 0.9, f"recall {hits}/{total}"


def test_refine_exact_topk_recovers_exact_ranking(spark):
    """The refine stage's contract: when the candidate set CONTAINS the
    exact top-k, re-ranking returns exactly the brute-force result —
    recall limited only by candidate coverage (VERDICT r5 #2)."""
    from sea_express_customs_etl_spark.operators.similarity import (
        refine_exact_topk,
    )

    emb = _blob_corpus(spark)
    queries = emb.filter(F.col("vec_id") % 40 < 1)  # 1 per blob
    exact = brute_force_topk(emb, queries, k=5).collect()
    # candidate set = every (query, neighbor) pair in the query's own
    # blob — a superset of the exact top-5 (blobs are tight)
    cand = (
        queries.select(F.col("vec_id").alias("query_id"))
        .join(emb.select(F.col("vec_id").alias("neighbor_id")))
        .filter(
            (F.col("neighbor_id") != F.col("query_id"))
            & (
                F.floor(F.col("neighbor_id") / 40)
                == F.floor(F.col("query_id") / 40)
            )
        )
    )
    got = refine_exact_topk(emb, cand, k=5).collect()
    want = {(r.query_id, r.neighbor_id, r.cosine) for r in exact}
    have = {(r.query_id, r.neighbor_id, r.cosine) for r in got}
    assert have <= want or have == want  # subset only if blob < 5+1
    assert {(r.query_id, r.neighbor_id) for r in got} == {
        (r.query_id, r.neighbor_id) for r in exact
    }
