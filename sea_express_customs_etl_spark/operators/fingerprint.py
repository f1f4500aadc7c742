"""Winnowing document fingerprinting (Schleimer, Wilkerson, Aiken,
SIGMOD 2003 — the MOSS algorithm): rolling k-gram hashes thinned by a
sliding window-minimum so every document keeps a small, position-robust
fingerprint set with a hard guarantee — any shared run of at least
``w + k - 1`` tokens between two documents shares at least one
fingerprint.

Reference parity anchor: the reference pipeline's only dedup is a DB
UNIQUE key (``/root/reference/training.log:19``); winnowing is the
local-fingerprint sibling of the MinHash family
(:mod:`.dedup`) a 100 TB curation pipeline adds for *substring*-level
(not whole-document) duplication — MinHash bounds Jaccard over the
whole shingle set, winnowing localizes: a boilerplate paragraph pasted
into an otherwise-unique page still collides.

Portability: the k-gram hash is ``md5`` hex and the window minimum is
a plain ``min`` over those hex strings — lowercase-hex lexicographic
order is identical in Spark, DuckDB, and Python, so the selected
fingerprints (and therefore every downstream pair) are bit-portable
and oracle-checkable with no integer conversion anywhere.

Scale shape: shingle hashing is map-only; the window minimum is a
per-document window (partitioned by doc id — corpus-parallel, frames
are ``w`` rows); the pair join is keyed on fingerprint value with an
absolute document-frequency cap (``df_max``) bounding every posting
list, so candidate fan-out is Σ df² ≤ (#kept fingerprints)·df_max² —
corpus-size-independent per fingerprint, the same dial
``tfidf_cosine_pairs`` uses. Nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

from ..plans.cache import tracked_persist


def positional_shingles(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per (id, position, md5(k-gram)) — NOT distinct: winnowing
    needs every position. Documents with fewer than ``k`` tokens
    produce no rows. Output: id, _i (1-based), _h, _n_sh (shingle
    count, carried so callers can filter to full windows map-side).
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    parts = [F.element_at(F.col("_toks"), F.col("_i") + j) for j in range(k)]
    return (
        df.select(F.col(id_col), toks.alias("_toks"))
        .filter(F.size("_toks") >= k)
        .select(
            id_col,
            F.explode(
                F.sequence(F.lit(1), F.size("_toks") - (k - 1))
            ).alias("_i"),
            (F.size("_toks") - (k - 1)).alias("_n_sh"),
            "_toks",
        )
        .select(
            F.col(id_col),
            F.col("_i"),
            F.col("_n_sh"),
            F.md5(F.concat_ws(" ", *parts)).alias("_h"),
        )
    )


def winnow_fingerprints(
    df: DataFrame,
    k: int = 3,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distinct winnowed fingerprints per document: the set of
    window-minima of the k-gram hash sequence over every full window
    of ``w`` consecutive shingles. Output: id, fp (md5 hex).

    Guarantee (the paper's §2): two documents sharing any run of
    ``w + k - 1`` tokens share ≥ 1 fingerprint; density expectation is
    2/(w+1) of the shingle count. Documents shorter than
    ``k + w - 1`` tokens have no full window and produce no
    fingerprints (mirrors :func:`..dedup.shingles`' min-length rule).

    The window frame is rows-between CURRENT and ``w-1`` FOLLOWING
    partitioned by document — per-doc bounded work, corpus-parallel;
    the trailing ``w-1`` clipped frames are dropped by the
    ``_i ≤ n_sh - w + 1`` filter so both engines see only full
    windows.
    """
    sh = positional_shingles(df, k=k, text_col=text_col, id_col=id_col)
    win = Window.partitionBy(id_col).orderBy("_i").rowsBetween(0, w - 1)
    return (
        sh.select(
            F.col(id_col),
            F.col("_i"),
            F.col("_n_sh"),
            F.min("_h").over(win).alias("fp"),
        )
        .filter(F.col("_i") <= F.col("_n_sh") - (w - 1))
        .select(id_col, "fp")
        .distinct()
    )


def winnow_dup_pairs(
    df: DataFrame,
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    df_max: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-duplicate pairs by shared winnowed fingerprints: every
    (id_a < id_b) sharing ≥ ``min_shared`` fingerprints, after
    dropping fingerprints appearing in more than ``df_max`` documents
    (boilerplate — shared templates would otherwise propose
    quadratically many spurious candidates AND blow the posting-list
    join; the absolute cap is the 100 TB dial, same role as
    ``tfidf_cosine_pairs.df_max``). Output: id_a, id_b, n_shared.

    The fingerprint frame feeds three consumers (the df count and both
    self-join sides) → pinned via ``tracked_persist``.
    """
    fps = tracked_persist(
        winnow_fingerprints(df, k=k, w=w, text_col=text_col, id_col=id_col)
    )
    return pairs_from_fingerprints(
        fps, min_shared=min_shared, df_max=df_max, id_col=id_col
    )


def pairs_from_fingerprints(
    fps: DataFrame,
    min_shared: int = 2,
    df_max: int = 50,
    id_col: str = "doc_id",
) -> DataFrame:
    """The match stage alone, over an existing (id, fp) fingerprint
    frame — fingerprints are per-document (no cross-doc dependency),
    so an incrementally-maintained store queried through this function
    is hash-identical to a one-shot :func:`winnow_dup_pairs` over the
    union corpus (the ``streaming/winnow_store.py`` parity). Caller
    owns persisting ``fps`` (it feeds the df count and both join
    sides)."""
    dfc = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("_dfc"))
    keep = fps.join(dfc.filter(F.col("_dfc") <= df_max), "fp").select(
        id_col, "fp"
    )
    a, b = keep.alias("a"), keep.alias("b")
    return (
        a.join(b, "fp")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
