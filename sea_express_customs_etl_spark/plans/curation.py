"""End-to-end training-data curation pipeline — the composed flagship
for the extension operators, mirroring how a real pretraining corpus is
prepared (the reference's analogue is its insert-if-new knowledge-base
refresh, ``src/batch_train.py:66-80``, at single-table scale):

    quality gate  →  exact dedup  →  near-dup clusters  →  split

1. Gopher-rule gate (:func:`...textstats.quality_gate`) — drop
   documents failing length / word-shape / repetition rules.
2. Exact dedup (content md5, keep the minimum id per group).
3. MinHash-LSH candidate pairs, n-gram-Jaccard verification, then
   connected-component resolution (:func:`...dedup.dedup_clusters`) —
   keep only each component's canonical member.
4. Deterministic hash split (:func:`...sampling.hash_split`).

Every stage is a deterministic Catalyst plan, so the WHOLE pipeline is
oracle-checkable end-to-end — one recursive-CTE DuckDB statement
reproduces it bit-for-bit (``plans/oracles_ext.CURATION_PIPELINE_SQL``).

Scale: stages only ever narrow the corpus; the gate is map-only, both
dedups shuffle on content digests / band buckets (never all-pairs),
cluster resolution touches the pair GRAPH (tiny vs the corpus), and
the split is map-only. Nothing in the composition adds a shuffle the
standalone operators don't already have.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from .cache import tracked_persist

from sea_express_customs_etl_spark.operators.dedup import (
    dedup_clusters,
    jaccard_verify_profiles,
    lsh_bands,
    lsh_candidate_pairs,
    shingle_profiles,
)
from sea_express_customs_etl_spark.operators.sampling import hash_split
from sea_express_customs_etl_spark.operators.textstats import quality_gate


def curation_pipeline(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """Run the full curation flow; returns the SURVIVING documents as
    (id, split) — the manifest a trainer would consume."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}

    passed = docs.join(
        quality_gate(docs, text_col, id_col)
        .filter(F.col("passed"))
        .select(id_col),
        id_col,
    )

    # Materialize the gate+exact-dedup survivor set: downstream the LSH
    # chain references it four times (signatures + both jaccard sides +
    # sizes) and cluster resolution once more — without staging, the
    # gate's array expressions would recompute at every reference. This
    # is the standard phase boundary a production corpus pipeline writes
    # to a staging table; persist() is its in-session form
    # (MEMORY_AND_DISK, so at cluster scale it spills instead of
    # evicting). A window-over-digest formulation of the exact dedup
    # was measured SLOWER here (full-row sort shuffle vs digest agg +
    # AQE broadcast join), so the agg+join stays.
    exact_kept = tracked_persist(passed.join(
        passed.groupBy(F.md5(F.col(text_col)).alias("_h"))
        .agg(F.min(F.col(id_col)).alias(id_col))
        .select(id_col),
        id_col,
    ))

    # the fused shingle-profile frame (sets + minhashes from one
    # explode + one groupBy, r4) is referenced three times (bands +
    # both Jaccard sides) — stage it, the second phase-boundary table
    # a production LSH pipeline materializes (MEMORY_AND_DISK: spills
    # at corpus scale rather than evicting). Doc-grained (one row per
    # survivor), far smaller than the r3 exploded shingle frame.
    prof = tracked_persist(shingle_profiles(exact_kept, text_col, id_col))
    pairs = jaccard_verify_profiles(
        lsh_candidate_pairs(lsh_bands(prof)), prof
    ).select("id_a", "id_b")
    kept = (
        dedup_clusters(exact_kept, pairs, id_col)
        .filter(F.col("keep") == 1)
        .select(id_col)
    )

    return hash_split(kept, weights, key_col=id_col)
