"""Unit tests for similarity search (brute-force cosine, IVF)."""

from __future__ import annotations

import pyspark.sql.functions as F

from sea_express_customs_etl_spark.operators.similarity import (
    brute_force_topk,
    ivf_assign,
    ivf_topk,
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
