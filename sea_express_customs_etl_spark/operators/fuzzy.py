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


def _block_keys(df: DataFrame, text_col: str, prefix: int) -> DataFrame:
    """(text, _bk) with two block keys per row: ``p:<prefix>`` and
    ``s:<prefix-of-reverse>``. ``substring`` returns the whole string
    when shorter than ``prefix`` in both Spark and DuckDB, so short
    strings block on themselves — no length guard needed."""
    t = F.col(text_col)
    return df.select(
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
    right_text, dist. ``left_text``/``right_text`` must be distinct
    column names (both survive into the output).

    Recall contract: a pair is found iff it shares a leading-``prefix``
    block on the string or its reverse — edits that rewrite BOTH ends
    of the string can escape (the standard blocking tradeoff, stated
    rather than hidden).

    DICTIONARY-ENCODED: blocking and the O(len²) verify run over the
    DISTINCT text values of each side, and the verified text-pair
    table joins back to the id rows afterward — the bpe_encode rule
    (expensive kernel once per distinct value, never once per row)
    applied to linkage. Real entity columns repeat heavily (names,
    brands, cities), and repeated values explode blocked PAIRS
    quadratically: on the sf0.1 part-name query (20k rows over 64
    distinct names) row-grained blocking emits 50M pairs and 65 s of
    Levenshtein; the distinct-grained form verifies ≤64² and runs the
    whole query in ~2 s. Worst case (all values unique) it degrades to
    exactly the row-grained cost plus two hash joins. A LENGTH BAND
    (``|len(l) − len(r)| ≤ max_dist``, a Levenshtein lower bound)
    prunes candidates map-side before the verify.

    Grain contract: output is ID-PAIR grained — fully duplicated
    (id, text) input rows yield duplicated output pairs (one per input
    row combination), unlike the pre-r4 row-grained form which
    deduplicated id pairs. Callers needing distinct id pairs should
    `.distinct()` the result (id-pair frame, far smaller than the
    verify work) or dedup inputs first."""
    if left_text == right_text:
        raise ValueError(
            "left_text and right_text must be distinct column names "
            f"(both survive into the output); got {left_text!r} twice — "
            "alias one side before calling fuzzy_join"
        )
    text_pairs = _text_pairs(left, right, left_text, right_text, max_dist, prefix)
    return (
        left.select(left_id, left_text)
        .join(text_pairs, left_text)
        .join(right.select(right_id, right_text), right_text)
        .select(left_id, right_id, left_text, right_text, "dist")
    )


def _text_pairs(
    left: DataFrame,
    right: DataFrame,
    left_text: str,
    right_text: str,
    max_dist: int,
    prefix: int,
) -> DataFrame:
    """Verified DISTINCT-text pairs: block → length-band prune →
    cross-pass dedup → Levenshtein verify. (left_text, right_text,
    dist)."""
    l = _block_keys(left.select(left_text).distinct(), left_text, prefix)
    r = _block_keys(right.select(right_text).distinct(), right_text, prefix)
    return (
        l.join(r, "_bk")
        .filter(
            F.abs(F.length(left_text) - F.length(right_text)) <= max_dist
        )
        .select(left_text, right_text)
        .distinct()
        .withColumn(
            "dist", F.levenshtein(F.col(left_text), F.col(right_text))
        )
        .filter(F.col("dist") <= max_dist)
    )


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


def fuzzy_best_link(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_text: str,
    right_text: str,
    max_dist: int = 2,
    prefix: int = 4,
) -> DataFrame:
    """``best_match(fuzzy_join(...))`` fused at DICTIONARY grain: one
    row per right (probe) row — its best left candidate by
    ``(dist ASC, left_id ASC)`` — without ever materializing the
    id-level pair table. When text values repeat r times per side,
    ``fuzzy_join`` legitimately emits r² id-pairs per text pair
    (~10M rows on the sf0.1 part-name query, 17 s of shuffle); for
    top-1 linkage all of them lose to the same winner, so this
    operator resolves the winner per TEXT first:

      1. verified text pairs (|distinct|-grained, as ``fuzzy_join``);
      2. per left text, its minimal left_id (one tiny aggregate);
      3. per right text, ``min(struct(dist, best_left_id))`` — the
         lexicographic (dist, id) order of ``best_match``;
      4. one hash join back onto the right rows.

    Probes whose text matches nothing are dropped (inner), exactly as
    ``best_match`` over an inner ``fuzzy_join``. Output: right_id,
    left_id, dist."""
    text_pairs = _text_pairs(left, right, left_text, right_text, max_dist, prefix)
    lmin = left.groupBy(left_text).agg(F.min(left_id).alias("_blid"))
    best_per_text = (
        text_pairs.join(lmin, left_text)
        .groupBy(right_text)
        .agg(
            F.min(
                F.struct(F.col("dist").alias("d"), F.col("_blid").alias("i"))
            ).alias("_b")
        )
        .select(
            right_text,
            F.col("_b.i").alias(left_id),
            F.col("_b.d").alias("dist"),
        )
    )
    return right.select(right_id, right_text).join(
        best_per_text, right_text
    ).select(right_id, left_id, "dist")


def snm_pairs(
    df: DataFrame,
    text_col: str,
    window: int = 3,
    max_dist: int = 2,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo, SIGMOD 1995):
    sort the DISTINCT values of ``text_col`` lexicographically and
    verify only pairs within ``window`` positions of each other —
    the third blocking strategy of the linkage family (prefix/suffix
    blocks in :func:`fuzzy_join`, LSH in :mod:`.dedup`, and now the
    sort-based sweep: candidate volume is EXACTLY n·window regardless
    of value distribution, the property block-based schemes lose when
    one block goes hot). Output: name_a < name_b (lexicographic, the
    sort order), dist (Levenshtein, ≤ ``max_dist``).

    Scale shape: values dedupe to dictionary grain first (the
    ``fuzzy_join`` discipline — repeated values never multiply pair
    work); the global sort position comes from the two-phase
    ``ranking.global_rank`` (range partition + per-partition window +
    |partitions|-row offsets — never a single-partition funnel); the
    neighbor join is an EQUI-join on exploded rank keys (each value
    emits ``window`` probe keys rn+1..rn+window) so Spark plans a
    hash join, not a range BNLJ; the Levenshtein verify is map-side on
    the join output. The classic SNM caveat holds here too: a typo in
    the FIRST character defeats sort adjacency — production multi-pass
    SNM re-runs with a second sort key (e.g. the reversed string),
    exactly the two-pass trick ``fuzzy_join``'s blocks encode.
    """
    from .ranking import global_rank

    names = df.select(F.trim(F.lower(F.col(text_col))).alias("_t")).distinct()
    # rank_col must not be named "_rn" — global_rank's internal
    # per-partition row_number uses that name and drops it on exit
    ranked = global_rank(names, [F.col("_t")], rank_col="_pos")
    probes = ranked.select(
        F.col("_t").alias("name_a"),
        F.explode(
            F.sequence(F.col("_pos") + 1, F.col("_pos") + window)
        ).alias("_pos"),
    )
    cand = probes.join(
        ranked.select(F.col("_t").alias("name_b"), "_pos"), "_pos"
    )
    return (
        cand.select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("int").alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
    )
