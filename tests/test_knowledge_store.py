"""Streaming knowledge-base IVM (streaming/knowledge_store.py):
stream-final ≡ full-rebuild parity, commit-marker replay idempotence,
crash-window replay, compaction, and a true foreachBatch drive."""

from __future__ import annotations

import uuid

import pyspark.sql.functions as F

from sea_express_customs_etl_spark.functions.strings import link_key
from sea_express_customs_etl_spark.plans.knowledge import knowledge_base
from sea_express_customs_etl_spark.plans.standins import (
    declared_table,
    official_table,
)
from sea_express_customs_etl_spark.streaming.knowledge_store import (
    committed_vote_state,
    compact_knowledge_store,
    knowledge_batch_writer,
    knowledge_store_kb,
    tagged_knowledge_writer,
)


def _half(df, i: int):
    lk = link_key(F.col("mawb_no"), F.col("hawb_no"))
    return df.filter(F.crc32(lk) % 2 == i)


def _kb_map(df):
    return {
        r.original_description: (
            r.official_description,
            r.ccc_code,
            r.frequency,
        )
        for r in df.collect()
    }


def _want(spark, sf_dir):
    return _kb_map(
        knowledge_base(
            declared_table(spark, sf_dir),
            official_table(spark, sf_dir),
            use_nfkc=False,
        )
    )


def test_store_fold_equals_full_rebuild_and_replay(spark, sf_dir):
    a = declared_table(spark, sf_dir)
    b = official_table(spark, sf_dir)
    prefix = f"kbs_{uuid.uuid4().hex[:8]}"
    writer = knowledge_batch_writer(prefix, use_nfkc=False)
    writer(_half(a, 0), _half(b, 0), 0)
    writer(_half(a, 1), _half(b, 1), 1)

    want = _want(spark, sf_dir)
    assert _kb_map(knowledge_store_kb(spark, prefix)) == want

    # committed replay: marker present -> writer skips, store unchanged
    n_votes = spark.table(f"{prefix}_votes").count()
    writer(_half(a, 1), _half(b, 1), 1)
    assert spark.table(f"{prefix}_votes").count() == n_votes

    # crash-window replay: batch 1's rows re-appended without a second
    # marker (partial first attempt + full replay) — the committed
    # (distinct) view must merge identically
    dup = spark.table(f"{prefix}_votes").filter(F.col("batch_id") == 1)
    dup.write.mode("append").format("parquet").saveAsTable(f"{prefix}_votes")
    assert spark.table(f"{prefix}_votes").count() > n_votes
    assert _kb_map(knowledge_store_kb(spark, prefix)) == want


def test_uncommitted_batch_invisible(spark, sf_dir):
    """Rows of a batch that crashed before its marker must not count."""
    a = declared_table(spark, sf_dir)
    b = official_table(spark, sf_dir)
    prefix = f"kbu_{uuid.uuid4().hex[:8]}"
    writer = knowledge_batch_writer(prefix, use_nfkc=False)
    writer(_half(a, 0), _half(b, 0), 0)
    state_before = committed_vote_state(spark, prefix).agg(
        F.sum("frequency")
    ).first()[0]
    # simulate crash: batch 7's votes written, marker never committed
    spark.table(f"{prefix}_votes").limit(5).withColumn(
        "batch_id", F.lit(7).cast("bigint")
    ).write.mode("append").format("parquet").saveAsTable(f"{prefix}_votes")
    state_after = committed_vote_state(spark, prefix).agg(
        F.sum("frequency")
    ).first()[0]
    assert state_before == state_after


def test_compaction_preserves_kb(spark, sf_dir):
    a = declared_table(spark, sf_dir)
    b = official_table(spark, sf_dir)
    prefix = f"kbc_{uuid.uuid4().hex[:8]}"
    writer = knowledge_batch_writer(prefix, use_nfkc=False)
    writer(_half(a, 0), _half(b, 0), 0)
    writer(_half(a, 1), _half(b, 1), 1)
    # plant a crash-window duplicate before compaction
    dup = spark.table(f"{prefix}_votes").filter(F.col("batch_id") == 0)
    dup.write.mode("append").format("parquet").saveAsTable(f"{prefix}_votes")
    want = _kb_map(knowledge_store_kb(spark, prefix))

    compact_knowledge_store(spark, prefix)
    assert spark.table(f"{prefix}_batches").count() == 1
    assert _kb_map(knowledge_store_kb(spark, prefix)) == want
    # post-compaction loads still fold correctly (batch counter ahead
    # of the folded generation id)
    writer(_half(a, 0).limit(0), _half(b, 0).limit(0), 9)
    assert _kb_map(knowledge_store_kb(spark, prefix)) == want
    # idempotent: compacting a compacted store rewrites it to itself
    compact_knowledge_store(spark, prefix)
    assert _kb_map(knowledge_store_kb(spark, prefix)) == want


def test_streaming_foreachbatch_end_to_end(spark, sf_dir, tmp_path):
    """True Structured Streaming drive: a tagged-union file stream of
    two waybill-complete loads through foreachBatch == full rebuild."""
    a = declared_table(spark, sf_dir)
    b = official_table(spark, sf_dir)
    a_t = dict(a.dtypes)
    b_t = dict(b.dtypes)

    def tagged(i: int):
        ta = _half(a, i).select(
            F.lit("a").alias("side"),
            "mawb_no",
            "hawb_no",
            "item_no",
            "description_original",
            F.lit(None).cast(b_t["item_sequence"]).alias("item_sequence"),
            F.lit(None).cast("string").alias("description_official"),
            F.lit(None).cast("string").alias("ccc_code"),
        )
        tb = _half(b, i).select(
            F.lit("b").alias("side"),
            "mawb_no",
            "hawb_no",
            F.lit(None).cast(a_t["item_no"]).alias("item_no"),
            F.lit(None).cast("string").alias("description_original"),
            "item_sequence",
            "description_official",
            "ccc_code",
        )
        return ta.unionByName(tb)

    src = str(tmp_path / "loads_in")
    # one file per load -> maxFilesPerTrigger=1 gives one micro-batch
    # per waybill-complete load
    tagged(0).coalesce(1).write.parquet(src, mode="append")
    tagged(1).coalesce(1).write.parquet(src, mode="append")

    prefix = f"kbst_{uuid.uuid4().hex[:8]}"
    schema = tagged(0).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            tagged_knowledge_writer(prefix, use_nfkc=False)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert _kb_map(knowledge_store_kb(spark, prefix)) == _want(spark, sf_dir)


def _third(df, i: int):
    lk = link_key(F.col("mawb_no"), F.col("hawb_no"))
    return df.filter(F.crc32(lk) % 3 == i)


def test_retraction_equals_fresh_build_on_surviving_loads(spark, sf_dir):
    """r7 VERDICT #6 parity — vote-state SUBTRACTION: three loads in,
    one retracted out ≡ a fresh build on the two surviving loads, row
    for row (the algebraic Z-relation exactness); retraction replay is
    fenced; retracting EVERYTHING nets the state to empty (zero-count
    keys vanish, never rank); compaction after retraction folds the
    net state and is idempotent."""
    from sea_express_customs_etl_spark.streaming.knowledge_store import (
        knowledge_retract_writer,
    )

    a = declared_table(spark, sf_dir)
    b = official_table(spark, sf_dir)
    prefix = "kbret_test_" + uuid.uuid4().hex[:8]
    writer = knowledge_batch_writer(prefix, use_nfkc=False)
    for i in range(3):
        writer(_third(a, i), _third(b, i), i)
    retract = knowledge_retract_writer(prefix, use_nfkc=False)
    retract(_third(a, 1), _third(b, 1), 3)

    fresh = "kbret_test_" + uuid.uuid4().hex[:8]
    fresh_writer = knowledge_batch_writer(fresh, use_nfkc=False)
    fresh_writer(_third(a, 0), _third(b, 0), 0)
    fresh_writer(_third(a, 2), _third(b, 2), 1)

    got = sorted(
        map(tuple, committed_vote_state(spark, prefix).collect())
    )
    want = sorted(
        map(tuple, committed_vote_state(spark, fresh).collect())
    )
    assert got == want and len(got) > 0
    assert _kb_map(knowledge_store_kb(spark, prefix)) == _kb_map(
        knowledge_store_kb(spark, fresh)
    )

    # retraction replay fenced (marker already committed)
    n_votes = spark.table(f"{prefix}_votes").count()
    retract(_third(a, 1), _third(b, 1), 3)
    assert spark.table(f"{prefix}_votes").count() == n_votes

    # compaction folds the net state; idempotent; kb unchanged
    kb_before = _kb_map(knowledge_store_kb(spark, prefix))
    compact_knowledge_store(spark, prefix)
    assert _kb_map(knowledge_store_kb(spark, prefix)) == kb_before
    compact_knowledge_store(spark, prefix)
    assert _kb_map(knowledge_store_kb(spark, prefix)) == kb_before

    # retract the remaining loads: net state must vanish entirely
    retract(_third(a, 0), _third(b, 0), 10)
    retract(_third(a, 2), _third(b, 2), 11)
    assert committed_vote_state(spark, prefix).count() == 0
    assert knowledge_store_kb(spark, prefix).count() == 0


def test_tagged_stream_retraction_in_flight(spark, sf_dir, tmp_path):
    """Streaming retraction (r8): one tagged stream carries adds AND
    a_del/b_del retraction rows; a micro-batch that simultaneously
    adds load 2 and retracts load 1 commits atomically under one
    marker, and the final store equals a fresh build on the surviving
    loads — the streaming face of knowledge_retract_writer."""
    a = declared_table(spark, sf_dir)
    b = official_table(spark, sf_dir)
    a_t = dict(a.dtypes)
    b_t = dict(b.dtypes)

    def tagged(i: int, kind: str):
        sa, sb = ("a_del", "b_del") if kind == "del" else ("a", "b")
        ta = _third(a, i).select(
            F.lit(sa).alias("side"),
            "mawb_no",
            "hawb_no",
            "item_no",
            "description_original",
            F.lit(None).cast(b_t["item_sequence"]).alias("item_sequence"),
            F.lit(None).cast("string").alias("description_official"),
            F.lit(None).cast("string").alias("ccc_code"),
        )
        tb = _third(b, i).select(
            F.lit(sb).alias("side"),
            "mawb_no",
            "hawb_no",
            F.lit(None).cast(a_t["item_no"]).alias("item_no"),
            F.lit(None).cast("string").alias("description_original"),
            "item_sequence",
            "description_official",
            "ccc_code",
        )
        return ta.unionByName(tb)

    src = str(tmp_path / "loads_in")
    # batch 0: loads 0+1; batch 1: load 2 added AND load 1 retracted
    tagged(0, "add").unionByName(tagged(1, "add")).coalesce(1).write.parquet(
        src, mode="append"
    )
    tagged(2, "add").unionByName(tagged(1, "del")).coalesce(1).write.parquet(
        src, mode="append"
    )

    prefix = f"kbret_{uuid.uuid4().hex[:8]}"
    schema = tagged(0, "add").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    writer = tagged_knowledge_writer(prefix, use_nfkc=False)
    q = (
        stream.writeStream.foreachBatch(writer)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    fresh = f"kbret_{uuid.uuid4().hex[:8]}"
    fw = knowledge_batch_writer(fresh, use_nfkc=False)
    fw(_third(a, 0), _third(b, 0), 0)
    fw(_third(a, 2), _third(b, 2), 1)
    assert _kb_map(knowledge_store_kb(spark, prefix)) == _kb_map(
        knowledge_store_kb(spark, fresh)
    )

    # replayed mixed batch is fenced (single marker covers both sides)
    n = spark.table(f"{prefix}_votes").count()
    writer(
        tagged(2, "add").unionByName(tagged(1, "del")), 1
    )
    assert spark.table(f"{prefix}_votes").count() == n
