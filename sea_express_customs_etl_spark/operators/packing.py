"""Sequence packing for training-data pipelines: assign documents to
fixed-size token windows (the step between a curated corpus and a
trainer's sampler).

Contiguous-fill packing: documents are laid end-to-end in a
deterministic pseudo-random order (md5 of the key, so the order is
reproducible in any engine AND decorrelated from ingest order) and
every document records the window (``bin_id``) and offset where it
starts. Documents may straddle a window boundary — real packers split
the token stream mid-document; this operator emits the layout
(start window + offset), which is exactly what a loader needs to do
that split.

Scale shape: one window cumsum per SHARD. A single global ordering
would funnel 100 TB through one sort partition, so the operator
requires sharding: ``shard = key % num_shards`` (portable modulo),
window partitioned by shard — ``num_shards`` independent sorts, each
corpus/num_shards sized. Pick ``num_shards`` so a shard fits a healthy
sort spill (e.g. 10k shards at 100 TB → 10 GB sorts). Trainers
consume shard-local window streams; cross-shard window ids never need
to be globally dense.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F


def pack_sequences(
    df: DataFrame,
    seq_len: int = 2048,
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    num_shards: int = 4,
) -> DataFrame:
    """Pack ``(id, n_tokens)`` rows into ``seq_len``-token windows.

    Output: id, shard, bin_id, bin_offset, n_tokens — where ``bin_id``
    is the shard-local window the document STARTS in and ``bin_offset``
    the token offset inside it.
    """
    shard = (F.col(id_col) % num_shards).cast("int")
    order_key = F.md5(F.col(id_col).cast("string"))
    w = (
        Window.partitionBy("shard")
        .orderBy(order_key, F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(tokens_col)).over(w)
    start = cum - F.col(tokens_col)
    return (
        df.withColumn("shard", shard)
        .select(
            F.col(id_col),
            "shard",
            F.floor(start / seq_len).cast("int").alias("bin_id"),
            (start % seq_len).cast("int").alias("bin_offset"),
            F.col(tokens_col).cast("bigint").alias("n_tokens"),
        )
    )


def chunk_documents(
    df: DataFrame,
    chunk_chars: int = 2048,
    overlap: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-width character chunks with overlap
    (the context-window chunking step upstream of embedding / packing).

    Chunk ``i`` covers characters ``[i*stride, i*stride + chunk_chars)``
    where ``stride = chunk_chars - overlap``; the final chunk may be
    short, and a document shorter than one chunk yields exactly one
    chunk (empty text included — chunk_id 0 with '').

    Scale shape: pure Catalyst — ``sequence`` + ``posexplode`` +
    ``substring``; map-only, zero shuffles, fan-out bounded by
    doc_len/stride. Output: id, chunk_id, chunk_start (0-based),
    chunk_text.
    """
    if overlap >= chunk_chars:
        raise ValueError(f"overlap ({overlap}) must be < chunk_chars ({chunk_chars})")
    stride = chunk_chars - overlap
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.length(F.col(text_col)) - F.lit(overlap)) / F.lit(stride)).cast(
            "int"
        ),
    )
    staged = df.select(
        F.col(id_col),
        F.col(text_col).alias("_t"),
        F.sequence(F.lit(0), n_chunks - 1).alias("_ids"),
    )
    return staged.select(
        F.col(id_col),
        F.col("_t"),
        F.posexplode(F.col("_ids")).alias("chunk_id", "_i"),
    ).select(
        F.col(id_col),
        F.col("chunk_id"),
        (F.col("_i") * stride).alias("chunk_start"),
        F.substring(F.col("_t"), F.col("_i") * stride + 1, chunk_chars).alias(
            "chunk_text"
        ),
    )
