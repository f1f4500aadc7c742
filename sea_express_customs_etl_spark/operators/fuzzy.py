"""Fuzzy record linkage: blocked edit-distance matching.

The reference links records by EXACT scrubbed waybill keys
(`/root/reference/src/batch_train.py:84-87` — remove ``[\\s/-]``,
upper-case, concat); a key with a real typo silently drops the
waybill. This module adds the approximate sibling every entity-
resolution pipeline needs: candidate generation by MULTI-PASS
BLOCKING (prefix of the string and prefix of its reverse — a deletion
or substitution near one end still collides on the other end's
block), then an exact Levenshtein verify restricted to candidates, and
a deterministic best-match-per-probe pick.

This is the short-string (names / keys / identifiers) linkage tool.
For document-length text the right machinery is the LSH family in
``operators/dedup.py`` — Levenshtein is O(len²) per pair and block
sizes on long free text degenerate.

Scale shape: blocking is one explode (2 keys/row) + one shuffled
equi-join on the block key — Σ|block|² candidate pairs, never |L|·|R|.
Candidates carry the two short strings with them, so the verify is
map-side on the join output (no corpus re-join). Block-size growth is
the dial: longer prefixes, an added length-band term, or q-gram/LSH
blocking when a block outgrows the skew budget (AQE's skew-join
splitting handles residual hot blocks). The best-match window
partitions by probe id — per-key state is the probe's candidate list,
bounded by block sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F


def _block_keys(df: DataFrame, id_col: str, text_col: str, prefix: int) -> DataFrame:
    """(id, text, _bk) with two block keys per row: ``p:<prefix>`` and
    ``s:<prefix-of-reverse>``. ``substring`` returns the whole string
    when shorter than ``prefix`` in both Spark and DuckDB, so short
    strings block on themselves — no length guard needed."""
    t = F.col(text_col)
    return df.select(
        id_col,
        text_col,
        F.explode(
            F.array(
                F.concat(F.lit("p:"), F.substring(t, 1, prefix)),
                F.concat(F.lit("s:"), F.substring(F.reverse(t), 1, prefix)),
            )
        ).alias("_bk"),
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_text: str,
    right_text: str,
    max_dist: int = 2,
    prefix: int = 4,
) -> DataFrame:
    """Candidate pairs within ``max_dist`` Levenshtein edits, found via
    two-pass blocking. Output: left_id, right_id, left_text,
    right_text, dist.

    Recall contract: a pair is found iff it shares a leading-``prefix``
    block on the string or its reverse — edits that rewrite BOTH ends
    of the string can escape (the standard blocking tradeoff, stated
    rather than hidden). The pair set is deduplicated across the two
    passes BEFORE the O(len²) verify runs."""
    l = _block_keys(left, left_id, left_text, prefix)
    r = _block_keys(right, right_id, right_text, prefix)
    cand = (
        l.join(r, "_bk")
        .select(left_id, right_id, left_text, right_text)
        .distinct()
    )
    dist = F.levenshtein(F.col(left_text), F.col(right_text))
    return cand.withColumn("dist", dist).filter(F.col("dist") <= max_dist)


def best_match(
    matches: DataFrame, probe_id: str, cand_id: str
) -> DataFrame:
    """Deterministic top-1 per probe: min distance, ties broken by
    candidate id ASC (the OP-AGG-VOTE tie-break discipline —
    `/root/reference/src/batch_train.py:138`'s first-seen tie-break is
    row-order-dependent and cannot survive distribution)."""
    w = Window.partitionBy(probe_id).orderBy(
        F.col("dist").asc(), F.col(cand_id).asc()
    )
    return (
        matches.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
