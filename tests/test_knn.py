"""Holdout kNN label classifier (operators/knn.py): perfect accuracy
on a separable fixture, train/test disjointness, and the
deterministic vote tie-break."""

import math

from sea_express_customs_etl_spark.operators.knn import knn_label_vote


def _blobs(n_per=20, dim=8):
    """Two well-separated clusters; label = cluster. Deterministic
    small offsets keep every vector distinct."""
    rows = []
    for i in range(2 * n_per):
        # label alternates in PAIRS so both parities (train = even id,
        # test = odd id) contain both classes
        lab = (i // 2) % 2
        center = 0.4 if lab == 0 else -0.4
        vec = [
            center + 0.01 * math.sin(13 * (i + 1) * (j + 2))
            for j in range(dim)
        ]
        rows.append((i, [float(x) for x in vec], lab))
    return rows


def test_separable_blobs_classify_perfectly(spark):
    df = spark.createDataFrame(
        _blobs(), "vec_id int, embedding array<float>, label int"
    )
    out = knn_label_vote(df, k=5, n_centroids=2, nprobe=1).collect()
    assert len(out) == 20  # every odd id classified
    assert all(r.vec_id % 2 == 1 for r in out)  # holdout side only
    assert all(r.correct == 1 for r in out)
    assert all(r.pred_label == r.true_label for r in out)


def test_vote_tie_breaks_to_lowest_label(spark):
    # test vector 1 sits exactly between one label-3 and one label-7
    # train vector; k=2 → 1-1 tie → prediction must be label 3
    rows = [
        (0, [1.0, 0.0], 7),
        (2, [-1.0, 0.0], 3),
        (1, [0.0, 0.5], 9),
    ]
    df = spark.createDataFrame(
        rows, "vec_id int, embedding array<float>, label int"
    )
    out = knn_label_vote(df, k=2, n_centroids=1, nprobe=1).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.vec_id, r.pred_label, r.true_label, r.correct) == (1, 3, 9, 0)


def test_kmeans_label_ari_perfect_and_formula(spark):
    """Two tight separable blobs with labels = blob: integer k-means
    (k=2) recovers the partition exactly -> ARI = 1e6; and the pair
    sums match the hand contingency."""
    from sea_express_customs_etl_spark.operators.clustereval import (
        kmeans_label_ari,
    )

    rows = [
        (i, vec, lab)
        for i, vec, lab in (
            (j, [0.4 + 0.001 * j if lab == 0 else -0.4 + 0.001 * j] * 8, lab)
            for j, lab in ((j, (j // 2) % 2) for j in range(40))
        )
    ]
    df = spark.createDataFrame(
        rows, "vec_id int, embedding array<float>, label int"
    )
    got = kmeans_label_ari(df, k=2, iters=2).collect()[0]
    assert got.n == 40 and got.k_clusters == 2 and got.n_labels == 2
    # perfect agreement: Sij = Sa = Sb = 2*C(20,2)
    assert got.s_ij == got.s_a == got.s_b == 2 * (20 * 19 // 2)
    assert got.ari_u6 == 1_000_000
