"""Event-sequence pattern matching — the MATCH_RECOGNIZE-lite shape:
encode each user's time-ordered event history as a symbol string
(one char per event type) and count users whose history matches each
regex pattern. Subsequence patterns like ``v.*c.*p`` ("viewed, later
clicked, later purchased") express the funnel/journey questions that
would otherwise take k-way self-joins; the encode-once-match-many
form amortizes the per-user ordering across every pattern.

Exactness: the symbol string is built from an ``array_sort`` over
(ts, event_id, symbol) structs — a total order, so the string is
deterministic; regex stays in the Java∩RE2 common dialect (literals,
``.*`` only). Per-user state is the bounded history string — one
groupBy shuffle, then a map-side rlike per pattern over the
|users|-row frame.

Beyond reference parity: the reference has no sequence layer; this
adds the journey-pattern front end over the same per-user ordering
the Markov/funnel operators use.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

DEFAULT_SYMBOLS: Mapping[str, str] = {
    "view": "v",
    "click": "c",
    "purchase": "p",
    "signup": "s",
    "error": "e",
}


def user_event_strings(
    events: DataFrame,
    symbols: Mapping[str, str] = DEFAULT_SYMBOLS,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """(key, seq_str): each key's history as an ordered symbol string.
    Unknown event types map to '?' (kept — a dropped symbol would
    silently change adjacency semantics)."""
    sym = None
    for name, ch in symbols.items():
        cond = F.col(type_col) == name
        sym = (
            F.when(cond, F.lit(ch)) if sym is None else sym.when(cond, F.lit(ch))
        )
    sym = sym.otherwise(F.lit("?")) if sym is not None else F.lit("?")
    packed = events.select(
        F.col(key_col).alias("key"),
        F.struct(
            F.col(ts_col).alias("ts"),
            F.col(id_col).alias("id"),
            sym.alias("ch"),
        ).alias("_e"),
    )
    return (
        packed.groupBy("key")
        .agg(F.array_sort(F.collect_list("_e")).alias("_es"))
        .select(
            "key",
            F.concat_ws(
                "", F.transform("_es", lambda e: e.getField("ch"))
            ).alias("seq_str"),
        )
    )


def sequence_pattern_counts(
    events: DataFrame,
    patterns: Sequence[str],
    symbols: Mapping[str, str] = DEFAULT_SYMBOLS,
    **kw,
) -> DataFrame:
    """Users matching each regex pattern over their history string.
    Output: pattern, n_users — one bounded-state groupBy + one
    map-side rlike scan per pattern (unioned, |patterns| is human-
    sized)."""
    from ..plans.cache import tracked_persist

    strings = tracked_persist(user_event_strings(events, symbols, **kw))
    out = None
    for p in patterns:
        one = strings.agg(
            F.sum(F.when(F.col("seq_str").rlike(p), 1).otherwise(0))
            .cast("bigint")
            .alias("n_users")
        ).select(F.lit(p).alias("pattern"), "n_users")
        out = one if out is None else out.unionByName(one)
    return out
