"""Slowly-changing-dimension (type 2) history from table snapshots.

The reference's warehouse story is replace-with-backup
(/root/reference/src/database.py swap + timestamped snapshot — our
``sinks/jdbc_sink.py`` / ``parquet_sink.py`` re-expressions): each load
DESTROYS yesterday's values. SCD2 is the standard warehouse upgrade —
keep every version with a validity interval — and falls out of one
full-outer join per snapshot pair, which is how a Spark lakehouse
builds history without CDC: diff consecutive snapshots.

Semantics for ``scd2_from_snapshots(old, new, key, attrs, d_old,
d_new)`` — one row per surviving version:

* key in both, attrs equal     → (d_old, NULL,  current, 'unchanged')
* key in both, attrs differ    → (d_old, d_new, closed,  'updated')
                                 + (d_new, NULL, current, 'updated')
* key only in old (deleted)    → (d_old, d_new, closed,  'deleted')
* key only in new (inserted)   → (d_new, NULL,  current, 'inserted')

Scale shape: ONE full-outer shuffle join on the business key (the
minimum possible — any diff must co-locate the two versions), change
detection as a null-safe struct comparison (map-side), and the two
rows of an update produced by an explode of a prebuilt 1-or-2 element
array — no second join, no window. Chain calls left-fold over a
snapshot sequence; at 100 TB, partition the history table by
``valid_from`` so time-travel reads prune.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F


def scd2_from_snapshots(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    attr_cols: Sequence[str],
    d_old: str,
    d_new: str,
) -> DataFrame:
    """Diff two snapshots into SCD2 rows. ``d_old``/``d_new`` are the
    snapshot dates as ISO strings (become DateType columns). Output:
    key, *attrs, valid_from, valid_to (NULL = open), is_current,
    change ('unchanged' | 'updated' | 'deleted' | 'inserted')."""
    o = old.select(
        F.col(key_col), F.struct(*[F.col(c) for c in attr_cols]).alias("_ao")
    )
    n = new.select(
        F.col(key_col), F.struct(*[F.col(c) for c in attr_cols]).alias("_an")
    )
    j = o.join(n, key_col, "full_outer")
    from_old, from_new = F.lit(d_old).cast("date"), F.lit(d_new).cast("date")
    null_date = F.lit(None).cast("date")

    def version(attrs: Column, vf: Column, vt: Column, cur: bool) -> Column:
        return F.struct(
            attrs.alias("a"),
            vf.alias("vf"),
            vt.alias("vt"),
            F.lit(cur).alias("cur"),
        )

    versions = (
        F.when(
            F.col("_an").isNull(),  # deleted
            F.array(version(F.col("_ao"), from_old, from_new, False)),
        )
        .when(
            F.col("_ao").isNull(),  # inserted
            F.array(version(F.col("_an"), from_new, null_date, True)),
        )
        .when(
            F.col("_ao").eqNullSafe(F.col("_an")),  # unchanged
            F.array(version(F.col("_ao"), from_old, null_date, True)),
        )
        .otherwise(  # updated: closed old version + open new version
            F.array(
                version(F.col("_ao"), from_old, from_new, False),
                version(F.col("_an"), from_new, null_date, True),
            )
        )
    )
    change = (
        F.when(F.col("_an").isNull(), F.lit("deleted"))
        .when(F.col("_ao").isNull(), F.lit("inserted"))
        .when(F.col("_ao").eqNullSafe(F.col("_an")), F.lit("unchanged"))
        .otherwise(F.lit("updated"))
    )
    exploded = j.select(
        key_col, change.alias("change"), F.explode(versions).alias("_v")
    )
    return exploded.select(
        key_col,
        *[F.col(f"_v.a.{c}").alias(c) for c in attr_cols],
        F.col("_v.vf").alias("valid_from"),
        F.col("_v.vt").alias("valid_to"),
        F.col("_v.cur").alias("is_current"),
        "change",
    )


def pit_join(
    facts: DataFrame,
    history: DataFrame,
    key_col: str,
    fact_ts_col: str,
    payload_cols: Sequence[str],
) -> DataFrame:
    """Point-in-time (temporal) join — the canonical SCD2 consumer:
    attach to every fact row the dimension version valid AT the fact's
    timestamp (``valid_from <= ts`` and ``ts < valid_to``, open
    ``valid_to`` = still current). Facts with no valid version at
    their time (before the first version, or in a deleted gap) are
    dropped — inner temporal semantics.

    Implementation: versions per key are CONTIGUOUS by construction
    (each ``valid_from`` closes the previous version), so the
    nearest-prior-``valid_from`` as-of join finds the candidate in ONE
    key-partitioned shuffle (the union + last-ignorenulls form of
    ``asof_join`` — never a per-key range blow-up), and the
    ``valid_to`` bound is a residual filter catching the deleted-gap
    case. Output: all fact columns + ``pit_<payload>`` +
    ``pit_valid_from``."""
    from sea_express_customs_etl_spark.operators.asof import asof_join

    versions = history.select(
        F.col(key_col),
        F.col("valid_from").alias(fact_ts_col),
        F.col("valid_to"),
        *[F.col(c) for c in payload_cols],
    )
    joined = asof_join(
        facts,
        versions,
        key_cols=[key_col],
        ts_col=fact_ts_col,
        payload_cols=[*payload_cols, "valid_to"],
        prefix="pit_",
    )
    return (
        joined.filter(
            F.col(f"pit_{fact_ts_col}").isNotNull()
            & (
                F.col("pit_valid_to").isNull()
                | (F.col(fact_ts_col) < F.col("pit_valid_to"))
            )
        )
        .withColumnRenamed(f"pit_{fact_ts_col}", "pit_valid_from")
        .drop("pit_valid_to")
    )


def cdc_apply(
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_cols: Sequence[str],
    op_col: str,
    payload_cols: Sequence[str],
    state: DataFrame | None = None,
) -> DataFrame:
    """Apply an op-coded CDC change stream (the Delta Live Tables
    ``APPLY CHANGES`` / Debezium-sink primitive): rows carry a key, a
    total-order sequence, an op ('U' upsert / 'D' delete) and a
    payload; the result is the final table — for each key, the
    highest-sequence row's payload, ABSENT if that row is a delete.

    Latest-wins is ONE max-struct aggregate (partial-merge map-side,
    no per-key window sort): ``max(struct(seq..., op, payload...))``
    picks the terminal row per key in a single shuffle. Deletes are
    dropped AFTER the argmax, so an earlier delete never shadows a
    later upsert and a terminal delete tombstones the key.

    ``state`` (optional) is a previously-applied snapshot with the
    same key/seq/payload columns: it is folded in as synthetic 'U'
    changes at its stored sequence, so
    ``cdc_apply(batch, state=cdc_apply(prefix))`` ≡
    ``cdc_apply(prefix ∪ batch)`` whenever every batch row sequences
    after the snapshot (the incremental-load invariant; the gate
    hash-checks the equivalence against a full-replay oracle).
    Tombstone note: a snapshot stores no tombstones — sound under the
    same invariant, because a key deleted in the prefix either stays
    absent (no batch row) or is resurrected by a strictly-later batch
    upsert, exactly as full replay would.

    Scale shape: one hash shuffle on the key (the aggregate), state
    unioned in scan-side. At 100 TB the state side is the compacted
    table and the batch is the nightly delta — the shuffle is keyed,
    partial-aggregated, and skew-safe (one row per key survives the
    map-side combine).

    Re-expresses the reference's replace-the-table nightly load
    (/root/reference/src/database.py:17-38 swap) as a keyed merge —
    what that pipeline would need the moment loads become deltas
    rather than full snapshots.
    """
    keys = list(key_cols)
    seqs = list(seq_cols)
    pay = list(payload_cols)
    ch = changes.select(*keys, *seqs, F.col(op_col).alias("_op"), *pay)
    if state is not None:
        ch = ch.unionByName(
            state.select(*keys, *seqs, F.lit("U").alias("_op"), *pay)
        )
    top = ch.groupBy(*keys).agg(
        F.max(F.struct(*seqs, "_op", *pay)).alias("_t")
    )
    return top.select(
        *keys, *[F.col(f"_t.{c}").alias(c) for c in seqs + ["_op"] + pay]
    ).filter(F.col("_op") == F.lit("U")).drop("_op")
