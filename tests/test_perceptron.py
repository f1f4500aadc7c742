"""Unit tests for operators/perceptron.py (integer full-batch
perceptron training)."""

from __future__ import annotations

import pyspark.sql.functions as F

from sea_express_customs_etl_spark.operators.perceptron import (
    train_perceptron_q,
)


def _score(cnt_rows, weights):
    w = {b: v for b, v in weights}
    return sum(w.get(b, 0) * c for b, c in cnt_rows)


def test_separable_corpus_learns_the_signal(spark):
    """Disjoint vocabularies: after 3 full-batch epochs the learned
    weights score every positive doc above every negative doc."""
    pos_words = "alpha beta gamma"
    neg_words = "delta epsilon zeta"
    rows = [(i, f"{pos_words} extra{i % 2}", "en") for i in range(10)]
    rows += [(i + 10, f"{neg_words} extra{i % 2}", "de") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    w = [
        (r.bucket, r.w)
        for r in train_perceptron_q(
            df, F.col("lang") == "en", buckets=64, epochs=3
        ).collect()
    ]
    # re-derive each doc's bucket counts through the same hashing
    from sea_express_customs_etl_spark.operators.dsir import token_buckets

    cnt = (
        token_buckets(df, buckets=64)
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    by_doc: dict[int, list] = {}
    for r in cnt:
        by_doc.setdefault(r.doc_id, []).append((r.bucket, r.c))
    pos = [_score(by_doc[i], w) for i in range(10)]
    neg = [_score(by_doc[i + 10], w) for i in range(10)]
    assert min(pos) > 0 >= max(neg)


def test_trajectory_is_layout_invariant(spark):
    rows = [
        (i, f"tok{i % 7} tok{(i * 3) % 5} filler", "en" if i % 3 else "de")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    a = sorted(
        map(
            tuple,
            train_perceptron_q(df, F.col("lang") == "en", epochs=3).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            train_perceptron_q(
                df.repartition(7), F.col("lang") == "en", epochs=3
            ).collect(),
        )
    )
    assert a == b and len(a) > 3
