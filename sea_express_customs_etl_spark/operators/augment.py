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

from pyspark.sql import DataFrame, Window
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


def span_corruption(
    df: DataFrame,
    corrupt_fraction: float = 0.15,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "span",
) -> DataFrame:
    """T5-style span corruption (Raffel et al. JMLR'20 §3.1.4) with
    positional hashing in place of randomness: each token is masked
    i.i.d.-by-hash at ``corrupt_fraction``, consecutive masked tokens
    merge into ONE span (the i.i.d.-then-merge formulation — span
    lengths emerge geometric, exactly the effect T5's objective
    wants), the input keeps one ``<extra_id_k>`` sentinel per span and
    the target lists each sentinel followed by the tokens it hides.
    Deterministic row-by-row across engines/retries/partitionings;
    changing ``salt`` re-corrupts the corpus per epoch for free.

    Output: id, n_tokens, n_masked, n_spans, input_text, target_text.

    Scale shape: one explode + per-document window (documents are
    KB-sized — the partition key is the doc id, never a corpus-global
    window) + one partial-aggregated regroup. The sentinel numbering
    is a per-doc running count of span starts, not a global id."""
    thr = hex_threshold(corrupt_fraction)
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    t = (
        df.select(F.col(id_col), toks.alias("_toks"))
        .select(
            F.col(id_col),
            F.posexplode("_toks").alias("_p0", "tok"),
        )
        .select(
            id_col,
            (F.col("_p0") + 1).alias("pos"),
            "tok",
            (
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(salt),
                            F.col(id_col).cast("string"),
                            F.lit("_"),
                            (F.col("_p0") + 1).cast("string"),
                        )
                    ),
                    1,
                    8,
                )
                < F.lit(thr)
            ).alias("masked"),
        )
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    t = t.withColumn(
        "_start",
        F.col("masked")
        & ~F.coalesce(F.lag("masked").over(w), F.lit(False)),
    ).withColumn(
        "_span",
        F.sum(F.col("_start").cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    sentinel = F.concat(
        F.lit("<extra_id_"), (F.col("_span") - 1).cast("string"), F.lit(">")
    )
    inp = F.when(~F.col("masked"), F.col("tok")).when(F.col("_start"), sentinel)
    tgt = F.when(
        F.col("masked") & F.col("_start"),
        F.concat(sentinel, F.lit(" "), F.col("tok")),
    ).when(F.col("masked"), F.col("tok"))
    joined = lambda c: F.array_join(  # noqa: E731
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", c.alias("piece")))),
            lambda s: s["piece"],
        ),
        " ",
    )
    return t.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum(F.col("masked").cast("long")).alias("n_masked"),
        F.sum(F.col("_start").cast("long")).alias("n_spans"),
        joined(inp).alias("input_text"),
        joined(tgt).alias("target_text"),
    )
