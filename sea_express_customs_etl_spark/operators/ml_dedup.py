"""Spark ML pipeline variant of near-dup detection — the platform's
own LSH implementation (``pyspark.ml.feature.MinHashLSH``) wired as
Tokenizer → NGram → CountVectorizer → MinHashLSH →
``approxSimilarityJoin``.

Complements ``operators/dedup.py``: the hand-rolled md5 MinHash is
oracle-checkable cross-engine; this one leans on the platform (fitted
models, persistable pipelines, approxSimilarityJoin's internal
optimizations) and is verified by property tests instead (its hash
seeds aren't portable to DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

try:
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import CountVectorizer, MinHashLSH, NGram, Tokenizer

    _HAS_ML = True
except ImportError:  # pragma: no cover
    _HAS_ML = False


def ml_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hash_tables: int = 8,
    max_distance: float = 0.5,
    min_vocab_doc_freq: int = 1,
) -> DataFrame:
    """Near-duplicate (a < b) pairs with Jaccard distance ≤
    ``max_distance`` via the fitted ML pipeline. Output: id_a, id_b,
    jaccard_distance."""
    if not _HAS_ML:  # pragma: no cover
        raise NotImplementedError("pyspark.ml unavailable")
    pipe = Pipeline(
        stages=[
            Tokenizer(inputCol=text_col, outputCol="_tok"),
            NGram(n=n, inputCol="_tok", outputCol="_ng"),
            CountVectorizer(
                inputCol="_ng", outputCol="_feat", minDF=min_vocab_doc_freq, binary=True
            ),
            MinHashLSH(inputCol="_feat", outputCol="_hashes", numHashTables=num_hash_tables, seed=42),
        ]
    )
    # docs with < n words have no n-grams → empty vectors are invalid
    # for MinHashLSH; drop them (they can't be near-dups of anything)
    candidates = df.filter(F.size(F.split(F.trim(F.col(text_col)), r"\s+")) >= n)
    model = pipe.fit(candidates)
    feats = model.transform(candidates)
    lsh = model.stages[-1]
    joined = lsh.approxSimilarityJoin(feats, feats, max_distance, distCol="jaccard_distance")
    return (
        joined.filter(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.round("jaccard_distance", 4).alias("jaccard_distance"),
        )
        .distinct()
    )
