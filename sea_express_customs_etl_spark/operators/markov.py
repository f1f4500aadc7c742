"""First-order Markov transition mining over per-user event
sequences — the "what happens after a click" model behind next-event
prediction, funnel design, and bot detection (a user whose
view→view→view self-loop probability is 0.99 is a crawler).

Reference parity anchor: the reference sequences rows per member at
parse time (``/root/reference/src/import_xml_history.py:118-136``,
the ``item_no`` counter) but never analyzes the resulting order; this
is the analysis layer over exactly that kind of per-key ordering.

Semantics: for every user, events are totally ordered by
``(ts, event_id)`` (the id tie-break makes the order total — the
global_rank discipline); each adjacent pair contributes one
``(from_type, to_type)`` observation. Output is the transition matrix
with exact-integer row-normalized probabilities:

    p_ppm = (10⁶ · n(from, to)) DIV Σ_to' n(from, to')

— nonnegative operands, so Spark ``DIV`` (truncating) and DuckDB
``//`` (flooring) agree (the CLAUDE.md sign rule).

Scale shape: the lead() window partitions BY USER — per-user
sequences are session-bounded in any real event stream, so window
state is bounded and the work distributes across users (never a
global sort). The pair counts partial-aggregate map-side; the
row-total join-back frame is |event types|² at most — model-sized,
hint-free (AQE broadcasts it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F


def transition_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """Per-(from_type, to_type) transition counts and exact ppm
    probabilities over per-user event sequences. Columns:
    ``from_type, to_type, n, p_ppm``; self-loops are real transitions
    and kept."""
    w = Window.partitionBy(user_col).orderBy(
        *[F.col(c) for c in order_cols]
    )
    pairs = (
        events.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("_tot"))
    return pairs.join(totals, "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.expr("(1000000 * n) DIV _tot").cast("bigint").alias("p_ppm"),
    )


def path_counts(
    events: DataFrame,
    k: int = 20,
    user_col: str = "user_id",
    type_col: str = "event_type",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """Top-``k`` 3-step event paths (s1 → s2 → s3) across all user
    sequences — the second-order extension of
    :func:`transition_matrix`, the "what journeys actually happen"
    path-analysis query behind funnel DESIGN (the funnel operators
    check a path you already chose; this surfaces the paths to
    choose). Two lead() windows over the same per-user bounded
    partition, one partial-aggregated triple count,
    TakeOrderedAndProject top-k (n DESC, then lexicographic — total
    order, deterministic). Output: s1, s2, s3, n."""
    w = Window.partitionBy(user_col).orderBy(
        *[F.col(c) for c in order_cols]
    )
    paths = (
        events.select(
            F.col(type_col).alias("s1"),
            F.lead(type_col, 1).over(w).alias("s2"),
            F.lead(type_col, 2).over(w).alias("s3"),
        )
        .filter(F.col("s3").isNotNull())
        .groupBy("s1", "s2", "s3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    return paths.orderBy(F.col("n").desc(), "s1", "s2", "s3").limit(k)
