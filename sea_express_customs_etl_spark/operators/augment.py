"""Deterministic text augmentation — the T5/BERT-style corruption
pass a pretraining pipeline applies at scale. Randomness is replaced
by positional hashing (md5 of ``id_pos``), the same engine-portable
trick the sampling family uses (``sampling.hash_sample``): the
augmentation is reproducible row-by-row across engines, retries, and
partitionings — a failed task replays to the identical corruption,
and the DuckDB oracle replays it exactly.

Scale shape: map-only. The token array never leaves its row — no
explode, no shuffle; one md5 per token inside an array lambda (the
interpreted-lambda cost is one hash per element, the same class as
the explode+md5 the bucket ops pay, without the explode)."""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from .sampling import hex_threshold


def word_dropout(
    df: DataFrame,
    drop_fraction: float = 0.15,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Drop ~``drop_fraction`` of tokens per document, chosen by the
    md5 of ``salt || id || '_' || position`` (1-based) — deterministic
    word dropout. Output: ``id_col``, n_tokens, n_kept, aug_text
    (kept tokens joined by single spaces).

    Changing ``salt`` yields an independent corruption of the same
    corpus (epoch-wise re-augmentation without storing anything)."""
    thr = hex_threshold(drop_fraction)
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    keep = (
        "filter(transform(_toks, (x, i) -> struct(x AS t, i AS p)), "
        f"s -> substring(md5(concat('{salt}', CAST({id_col} AS STRING), "
        "'_', CAST(s.p + 1 AS STRING))), 1, 8) >= "
        f"'{thr}')"
    )
    return (
        df.select(F.col(id_col), toks.alias("_toks"))
        .select(
            F.col(id_col),
            F.size("_toks").cast("bigint").alias("n_tokens"),
            F.expr(keep).alias("_kept"),
        )
        .select(
            id_col,
            "n_tokens",
            F.size("_kept").cast("bigint").alias("n_kept"),
            F.array_join(F.expr("transform(_kept, s -> s.t)"), " ").alias(
                "aug_text"
            ),
        )
    )
