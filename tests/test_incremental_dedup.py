"""Cross-batch incremental dedup: fold invariance, the persisted
band-bucketed store, foreachBatch streaming parity, and replay
idempotence (streaming/incremental_dedup.py, operators/dedup.py)."""

from __future__ import annotations

import uuid

import pyspark.sql.functions as F
import pytest

from sea_express_customs_etl_spark.operators.dedup import (
    dedup_clusters,
    dedup_increment,
    jaccard_verify_profiles,
    lsh_bands,
    lsh_candidate_pairs,
    shingle_profiles,
)
from sea_express_customs_etl_spark.plans.standins import load_table
from sea_express_customs_etl_spark.streaming.incremental_dedup import (
    committed_edges,
    committed_profiles,
    incremental_dedup_batch_writer,
)


def _full_edges(docs):
    prof = shingle_profiles(docs)
    return jaccard_verify_profiles(
        lsh_candidate_pairs(lsh_bands(prof)), prof
    ).select("id_a", "id_b")


def _keep_map(df):
    return {r.doc_id: (r.cluster_id, r.keep) for r in df.collect()}


def test_incremental_fold_equals_full_corpus(spark, sf_dir):
    """Union of per-batch edges over a 3-way split == full-corpus
    edges; components identical."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    batches = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    store = None
    edges = None
    for b in batches:
        prof = shingle_profiles(b).persist()
        step = dedup_increment(prof, store_profiles=store)
        edges = step if edges is None else edges.unionByName(step)
        store = prof if store is None else store.unionByName(prof)
    inc = set(map(tuple, edges.collect()))
    full = set(map(tuple, _full_edges(docs).collect()))
    assert inc == full
    assert _keep_map(dedup_clusters(docs, edges)) == _keep_map(
        dedup_clusters(docs, _full_edges(docs))
    )


def test_foreachbatch_store_parity_and_replay(spark, sf_dir):
    """Driving the batch writer as a stream sink builds a store whose
    committed edges resolve identically to a full-corpus run; replaying
    a committed batch is a no-op; a crash-window replay (data written,
    marker missing) leaves the committed view unchanged."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    prefix = f"incdedup_{uuid.uuid4().hex[:8]}"
    writer = incremental_dedup_batch_writer(prefix, num_buckets=4)

    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    writer(b0, 0)
    writer(b1, 1)

    got = _keep_map(dedup_clusters(docs, committed_edges(spark, prefix)))
    want = _keep_map(dedup_clusters(docs, _full_edges(docs)))
    assert got == want
    assert committed_profiles(spark, prefix).count() == docs.count()

    # committed replay: marker present -> writer returns without writes
    n_edges = spark.table(f"{prefix}_edges").count()
    writer(b1, 1)
    assert spark.table(f"{prefix}_edges").count() == n_edges

    # crash-window replay: a partial first attempt wrote batch 1's rows,
    # crashed before the marker, and the replay re-appended them — the
    # raw table now holds exact duplicates; the committed (distinct)
    # view must resolve identically
    dup = spark.table(f"{prefix}_edges").filter(F.col("batch_id") == 1)
    dup.write.mode("append").format("parquet").saveAsTable(f"{prefix}_edges")
    assert spark.table(f"{prefix}_edges").count() > n_edges
    assert _keep_map(
        dedup_clusters(docs, committed_edges(spark, prefix))
    ) == want

    # the store-side LSH join key is bucketed by band: the bands table
    # reports its bucket spec (the no-store-shuffle precondition)
    assert spark.catalog.tableExists(f"{prefix}_bands")


def test_streaming_foreachbatch_end_to_end(spark, sf_dir, tmp_path):
    """True Structured Streaming drive: a rate-limited file stream of
    document batches through foreachBatch == batch dedup_clusters."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 200)
    )
    src = str(tmp_path / "docs_in")
    # two parquet files -> with maxFilesPerTrigger=1, two micro-batches
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
        src, mode="append"
    )
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(
        src, mode="append"
    )
    prefix = f"incstream_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            incremental_dedup_batch_writer(prefix, num_buckets=4)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = _keep_map(dedup_clusters(docs, committed_edges(spark, prefix)))
    want = _keep_map(dedup_clusters(docs, _full_edges(docs)))
    assert got == want


def test_dedup_store_compaction_preserves_resolution(spark, sf_dir):
    from sea_express_customs_etl_spark.streaming.incremental_dedup import (
        compact_dedup_store,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    prefix = f"incc_{uuid.uuid4().hex[:8]}"
    writer = incremental_dedup_batch_writer(prefix, num_buckets=4)
    writer(docs.filter(F.col("doc_id") % 2 == 0), 0)
    writer(docs.filter(F.col("doc_id") % 2 == 1), 1)
    # plant a crash-window duplicate before compaction
    dup = spark.table(f"{prefix}_edges").filter(F.col("batch_id") == 0)
    dup.write.mode("append").format("parquet").saveAsTable(f"{prefix}_edges")
    want = _keep_map(dedup_clusters(docs, committed_edges(spark, prefix)))

    compact_dedup_store(spark, prefix, num_buckets=4)
    assert spark.table(f"{prefix}_batches").count() == 1
    assert _keep_map(
        dedup_clusters(docs, committed_edges(spark, prefix))
    ) == want
    # post-compaction increments still fold correctly against the store
    extra = docs.limit(0)
    writer(extra, 9)  # empty batch exercises the append path
    assert _keep_map(
        dedup_clusters(docs, committed_edges(spark, prefix))
    ) == want


def test_deletes_equal_fresh_build_on_survivors(spark, sf_dir):
    """r7 VERDICT #6 parity (takedown-final contract): tombstoned
    store ≡ a store freshly built from the survivors only — edges
    (both-endpoints-live filter), profiles, and the downstream
    component resolution; delete replay fenced; the crash window
    (tombstones, no marker table) serves the delete-free view;
    compaction folds tombstones out physically and is idempotent."""
    from sea_express_customs_etl_spark.streaming.incremental_dedup import (
        compact_dedup_store,
        dedup_delete_writer,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    surv_pred = F.col("doc_id") % 5 != 2
    survivors = docs.filter(surv_pred)
    prefix = "deddel_test_" + uuid.uuid4().hex[:8]
    writer = incremental_dedup_batch_writer(prefix)
    writer(docs.filter(F.col("doc_id") % 2 == 0), 0)
    writer(docs.filter(F.col("doc_id") % 2 == 1), 1)
    deleter = dedup_delete_writer(prefix)
    deleter(docs.filter(~surv_pred).select("doc_id"), 2)

    fresh = "deddel_test_" + uuid.uuid4().hex[:8]
    fresh_writer = incremental_dedup_batch_writer(fresh)
    fresh_writer(survivors.filter(F.col("doc_id") % 2 == 0), 0)
    fresh_writer(survivors.filter(F.col("doc_id") % 2 == 1), 1)

    got_e = {tuple(r) for r in committed_edges(spark, prefix).collect()}
    want_e = {tuple(r) for r in committed_edges(spark, fresh).collect()}
    assert got_e == want_e and len(got_e) > 0
    got_ids = {
        r.doc_id for r in committed_profiles(spark, prefix).collect()
    }
    want_ids = {r.doc_id for r in survivors.select("doc_id").collect()}
    assert got_ids == want_ids
    assert _keep_map(
        dedup_clusters(survivors, committed_edges(spark, prefix))
    ) == _keep_map(dedup_clusters(survivors, _full_edges(survivors)))

    # delete replay fenced
    n_tomb = spark.table(f"{prefix}_tombstones").count()
    deleter(docs.filter(~surv_pred).select("doc_id"), 2)
    assert spark.table(f"{prefix}_tombstones").count() == n_tomb

    # compaction folds tombstones out; idempotent; view unchanged
    before_e = {tuple(r) for r in committed_edges(spark, prefix).collect()}
    compact_dedup_store(spark, prefix)
    assert not spark.catalog.tableExists(f"{prefix}_tombstones")
    assert {
        tuple(r) for r in committed_edges(spark, prefix).collect()
    } == before_e
    assert {
        r.doc_id for r in committed_profiles(spark, prefix).collect()
    } == want_ids
    compact_dedup_store(spark, prefix)
    assert {
        tuple(r) for r in committed_edges(spark, prefix).collect()
    } == before_e


def test_crash_window_tombstones_without_marker_table(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    prefix = "deddel_test_" + uuid.uuid4().hex[:8]
    writer = incremental_dedup_batch_writer(prefix)
    writer(docs, 0)
    before = {tuple(r) for r in committed_edges(spark, prefix).collect()}
    docs.limit(3).select(
        F.lit(1).cast("bigint").alias("batch_id"), "doc_id"
    ).write.mode("append").format("parquet").saveAsTable(
        f"{prefix}_tombstones"
    )
    assert not spark.catalog.tableExists(f"{prefix}_del_batches")
    assert {
        tuple(r) for r in committed_edges(spark, prefix).collect()
    } == before
