"""Streaming sketch maintenance parity (streaming/sketch_store.py):
stream-final merged states must equal one global batch pass."""

from __future__ import annotations

import uuid

import pyspark.sql.functions as F

from sea_express_customs_etl_spark.operators.quantiles import (
    histogram_quantiles,
    value_histogram,
)
from sea_express_customs_etl_spark.operators.sketches import hll_registers
from sea_express_customs_etl_spark.plans.standins import load_table
from sea_express_customs_etl_spark.streaming.sketch_store import (
    merged_histogram,
    merged_hll,
    sketch_batch_writer,
)


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value"
    )


def test_stream_final_equals_batch_global(spark, sf_dir):
    """Fold 3 micro-batches through the writer; the merged HLL
    registers and histogram bins must be row-identical to one global
    pass — the mergeability the sketch family exists for."""
    ev = _events(spark, sf_dir)
    prefix = f"sk_{uuid.uuid4().hex[:8]}"
    writer = sketch_batch_writer(prefix)
    for i in range(3):
        writer(ev.filter(F.col("user_id") % 3 == i), i)

    got_hll = sorted(map(tuple, merged_hll(spark, prefix).collect()))
    want_hll = sorted(map(tuple, hll_registers(ev, "user_id").collect()))
    assert got_hll == want_hll and len(got_hll) > 0

    got_h = sorted(map(tuple, merged_histogram(spark, prefix).collect()))
    want_h = sorted(map(tuple, value_histogram(ev).collect()))
    assert got_h == want_h

    # and therefore the derived quantiles agree too
    got_q = sorted(
        map(tuple, histogram_quantiles(merged_histogram(spark, prefix)).collect())
    )
    want_q = sorted(
        map(tuple, histogram_quantiles(value_histogram(ev)).collect())
    )
    assert got_q == want_q


def test_replay_and_crash_window_idempotent(spark, sf_dir):
    """A committed batch replays as a no-op; a crash-window duplicate
    (state rows appended twice, marker once) must not change the merged
    states — exact-duplicate collapse protects even the SUM merge."""
    ev = _events(spark, sf_dir)
    prefix = f"sk_{uuid.uuid4().hex[:8]}"
    writer = sketch_batch_writer(prefix)
    writer(ev.filter(F.col("user_id") % 2 == 0), 0)
    writer(ev.filter(F.col("user_id") % 2 == 1), 1)
    want_h = sorted(map(tuple, merged_histogram(spark, prefix).collect()))

    writer(ev.filter(F.col("user_id") % 2 == 1), 1)  # committed replay
    dup = spark.table(f"{prefix}_hist").filter(F.col("batch_id") == 1)
    dup.write.mode("append").format("parquet").saveAsTable(f"{prefix}_hist")
    assert (
        sorted(map(tuple, merged_histogram(spark, prefix).collect())) == want_h
    )


def test_streaming_end_to_end(spark, sf_dir, tmp_path):
    """True readStream drive: file-source micro-batches through the
    writer == batch-global sketch states."""
    ev = _events(spark, sf_dir).filter(F.col("user_id") < 500)
    src = str(tmp_path / "ev_in")
    ev.filter(F.col("user_id") % 2 == 0).coalesce(1).write.parquet(
        src, mode="append"
    )
    ev.filter(F.col("user_id") % 2 == 1).coalesce(1).write.parquet(
        src, mode="append"
    )
    prefix = f"skstream_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema("user_id bigint, event_type string, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(sketch_batch_writer(prefix))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(map(tuple, merged_hll(spark, prefix).collect())) == sorted(
        map(tuple, hll_registers(ev, "user_id").collect())
    )
    assert sorted(
        map(tuple, merged_histogram(spark, prefix).collect())
    ) == sorted(map(tuple, value_histogram(ev).collect()))


def test_compaction_preserves_states_and_future_appends(spark, sf_dir):
    """Compacting the log folds it to one generation with identical
    merged states; appends after compaction keep merging correctly;
    compaction is idempotent."""
    import pyspark.sql.functions as F

    from sea_express_customs_etl_spark.streaming.sketch_store import (
        compact_sketch_store,
    )

    ev = _events(spark, sf_dir)
    prefix = f"skc_{uuid.uuid4().hex[:8]}"
    writer = sketch_batch_writer(prefix)
    for i in range(3):
        writer(ev.filter(F.col("user_id") % 4 == i), i)
    before = sorted(map(tuple, merged_histogram(spark, prefix).collect()))
    n_rows_before = spark.table(f"{prefix}_hist").count()

    compact_sketch_store(spark, prefix)
    assert sorted(map(tuple, merged_histogram(spark, prefix).collect())) == before
    assert spark.table(f"{prefix}_hist").count() < n_rows_before
    assert spark.table(f"{prefix}_batches").count() == 1

    compact_sketch_store(spark, prefix)  # idempotent
    assert sorted(map(tuple, merged_histogram(spark, prefix).collect())) == before

    writer(ev.filter(F.col("user_id") % 4 == 3), 7)  # post-compaction append
    got = sorted(map(tuple, merged_hll(spark, prefix).collect()))
    want = sorted(map(tuple, hll_registers(ev, "user_id").collect()))
    assert got == want


def test_rebuild_survivors_equals_fresh_build(spark, sf_dir):
    """Takedown = rebuild (max-merge is not invertible): after
    rebuild_sketch_store over the survivors, the merged states must be
    row-identical to a FRESH build that never saw the deleted users —
    and a replayed writer batch must stay fenced (cannot re-introduce
    deleted contributions)."""
    from sea_express_customs_etl_spark.streaming.sketch_store import (
        rebuild_sketch_store,
    )

    ev = _events(spark, sf_dir)
    prefix = f"skreb_{uuid.uuid4().hex[:8]}"
    writer = sketch_batch_writer(prefix)
    writer(ev.filter(F.col("user_id") % 2 == 0), 0)
    writer(ev.filter(F.col("user_id") % 2 == 1), 1)
    surv = ev.filter(F.col("user_id") % 13 != 5)
    rebuild_sketch_store(spark, prefix, surv)

    want_hll = sorted(map(tuple, hll_registers(surv, "user_id").collect()))
    want_h = sorted(map(tuple, value_histogram(surv).collect()))
    assert sorted(map(tuple, merged_hll(spark, prefix).collect())) == want_hll
    assert (
        sorted(map(tuple, merged_histogram(spark, prefix).collect()))
        == want_h
    )

    # replayed add batch: fenced by the surviving markers — deleted
    # users must NOT come back
    writer(ev.filter(F.col("user_id") % 2 == 0), 0)
    assert sorted(map(tuple, merged_hll(spark, prefix).collect())) == want_hll

    # rerun of the rebuild itself is idempotent
    rebuild_sketch_store(spark, prefix, surv)
    assert sorted(map(tuple, merged_hll(spark, prefix).collect())) == want_hll
    assert (
        sorted(map(tuple, merged_histogram(spark, prefix).collect()))
        == want_h
    )
