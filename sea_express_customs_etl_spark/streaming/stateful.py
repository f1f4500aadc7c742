"""Custom stateful streaming operator: cross-batch key deduplication
via ``applyInPandasWithState`` — the escape hatch for stateful
semantics the built-in operators don't cover. The built-in
``dropDuplicates`` on a stream is watermark-bounded; this variant keeps
an explicit per-key "seen" flag with a processing-time timeout so state
size is bounded by the active-key horizon, not the stream's lifetime —
the property that matters at 100 TB/day.

(Spark 4's successor API ``transformWithStateInPandas`` needs the
protobuf-based streaming Python runner, which this container can't run
— ``google.protobuf`` is not installed; the legacy API is fully
supported and semantically equivalent for this operator.)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def dedup_stream_within_watermark(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    delay: str = "1 hour",
) -> DataFrame:
    """Built-in watermark-bounded streaming dedup
    (``dropDuplicatesWithinWatermark``): duplicates of a key arriving
    within ``delay`` of each other are guaranteed to collapse to the
    first occurrence, and per-key state is EVICTED once the watermark
    passes — state size is bounded by the duplicate-arrival horizon.

    This is the zero-custom-code path when duplicate lateness is
    bounded (reference analogue: re-submitted customs files arrive
    within hours, `import_xml.log:3-53` retries). For unbounded-horizon
    keys with an explicit TTL policy use :func:`dedup_stream` (custom
    ``applyInPandasWithState``) — the two operators are the built-in /
    custom ends of the same trade.
    """
    return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        [key_col]
    )


def dedup_stream(
    df: DataFrame,
    key_col: str,
    timeout_ms: int | None = 3_600_000,
) -> DataFrame:
    """Emit only the FIRST row seen for each key across all batches of
    the stream; later duplicates are dropped. Per-key state expires
    after ``timeout_ms`` of processing-time inactivity (None → state is
    kept for the lifetime of the query).

    Use ``timeout_ms=None`` for drain-style ``availableNow`` runs: a
    processing-time timeout keeps the query alive indefinitely to fire
    expirations, so the trigger never reports completion.
    """
    schema = df.schema
    use_timeout = timeout_ms is not None

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if use_timeout and state.hasTimedOut:
            state.remove()
            return
        emitted = False
        for pdf in pdfs:
            if not state.exists and len(pdf) and not emitted:
                state.update((True,))
                emitted = True
                yield pdf.iloc[[0]]
        if use_timeout:
            state.setTimeoutDuration(timeout_ms)

    return df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout
        if use_timeout
        else GroupStateTimeout.NoTimeout,
    )
