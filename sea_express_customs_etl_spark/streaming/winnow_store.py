"""Incremental winnowing-fingerprint store — the cross-batch wiring
for :mod:`..operators.fingerprint` (the ``incremental_dedup.py``
pattern applied to the MOSS index).

The expensive stage of winnowing is per-document and embarrassingly
parallel (token explode + per-doc window minima); fingerprints of one
document never depend on another. So the production loop appends each
micro-batch's fingerprints to a grow-only store — history is NEVER
re-winnowed — and the match query (df-cap + fingerprint-keyed pair
join) runs over the committed store on demand. Because the store is
exactly the union corpus's fingerprint set,
``pairs_from_fingerprints(committed_fingerprints(...))`` is
hash-identical to a one-shot ``winnow_dup_pairs`` over all documents
(the parity the gate checks); the df cap stays corpus-global and
correct because it is applied at READ time, not fold time.

Exactly-once: the ``incremental_dedup.py`` commit-marker fence — rows
carry their ``batch_id``, a marker table records committed batches,
replayed batch ids are skipped, and crash-window partial appends are
exact duplicates (deterministic recomputation) collapsed by the
committed reader's distinct. Reference anchor: the move-to-processed
commit discipline of ``/root/reference/src/import_xml_history.py:181``.

Scale shape: per-batch cost is ∝ |new documents| (map-only fingerprint
+ one bucketed append); the store is bucketed by ``fp`` so the
on-demand pair join is bucket-local on the store side.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from sea_express_customs_etl_spark.operators.fingerprint import (
    winnow_fingerprints,
)
from sea_express_customs_etl_spark.sinks.bucketed import append_bucketed


def winnow_batch_writer(
    table_prefix: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
    num_buckets: int = 8,
) -> Callable[[DataFrame, int], None]:
    """A ``foreachBatch`` callable folding each micro-batch of
    documents into the fingerprint store (also usable directly on
    plain DataFrame batches — the one-code-path batch/stream parity
    kept engine-wide)."""
    f_tab = f"{table_prefix}_fps"
    m_tab = f"{table_prefix}_batches"

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark: SparkSession = batch_df.sparkSession
        if spark.catalog.tableExists(m_tab) and (
            spark.table(m_tab)
            .filter(F.col("batch_id") == batch_id)
            .limit(1)
            .count()
            > 0
        ):
            return  # replayed batch — already committed, skip
        fps = winnow_fingerprints(
            batch_df, k=k, w=w, text_col=text_col, id_col=id_col
        ).select(
            id_col, "fp", F.lit(int(batch_id)).cast("bigint").alias("batch_id")
        )
        append_bucketed(fps, f_tab, ("fp",), num_buckets)
        # marker LAST (commit fence) — see incremental_dedup.py: a
        # crash before this line replays the batch; replayed rows are
        # bit-identical and the committed reader's distinct collapses
        # them back to exactly-once.
        spark.createDataFrame(
            [(int(batch_id),)], "batch_id bigint"
        ).write.mode("append").format("parquet").saveAsTable(m_tab)

    return write


def committed_fingerprints(
    spark: SparkSession, table_prefix: str, id_col: str = "doc_id"
) -> DataFrame:
    """Exactly-once view of the fingerprint store: committed batches
    only (marker semi-join), crash-window duplicates collapsed."""
    return (
        spark.table(f"{table_prefix}_fps")
        .join(
            F.broadcast(spark.table(f"{table_prefix}_batches")),
            "batch_id",
            "left_semi",
        )
        .select(id_col, "fp")
        .distinct()
    )
