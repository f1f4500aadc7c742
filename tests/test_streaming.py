"""Structured Streaming tests: file-source ingestion with checkpoint
exactly-once, windowed event aggregation, sessionization."""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F

from sea_express_customs_etl_spark.streaming import (
    hourly_event_counts,
    run_availablenow,
    sessionize,
    sessionize_stream,
    stream_xml_history,
)
from sea_express_customs_etl_spark.sources import official_history, read_bid_heads_raw

from test_sources import _bid_head, _xml_doc  # fixture builders


def _write_xml_dir(tmp_path):
    d = tmp_path / "xml_stream"
    d.mkdir()
    (d / "a.xml").write_text(
        _xml_doc(_bid_head(hawb="S1"), _bid_head(hawb="S1"), _bid_head(hawb="S2")),
        encoding="utf-8",
    )
    (d / "b.xml").write_text(_xml_doc(_bid_head(hawb="S3")), encoding="utf-8")
    return d


def test_stream_xml_exactly_once(spark, tmp_path):
    src = _write_xml_dir(tmp_path)
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    stream = stream_xml_history(spark, str(src))
    assert stream.isStreaming
    run_availablenow(stream, sink, ckpt)

    got = spark.read.parquet(sink)
    batch = official_history(read_bid_heads_raw(spark, str(src)))
    assert got.count() == batch.count() == 4

    # same checkpoint, no new files → no duplicates
    run_availablenow(stream_xml_history(spark, str(src)), sink, ckpt)
    assert spark.read.parquet(sink).count() == 4

    # a newly arrived file is picked up incrementally
    (src / "c.xml").write_text(_xml_doc(_bid_head(hawb="S9")), encoding="utf-8")
    run_availablenow(stream_xml_history(spark, str(src)), sink, ckpt)
    assert spark.read.parquet(sink).count() == 5


def test_stream_manifests_matches_batch(spark, tmp_path):
    from sea_express_customs_etl_spark.sources import declared_cargo, read_manifests_raw
    from sea_express_customs_etl_spark.streaming import run_availablenow, stream_manifests
    from test_sources import NEW_CSV, OLD_CSV

    src = tmp_path / "manifests"
    src.mkdir()
    (src / "old_manifest.csv").write_text(OLD_CSV, encoding="utf-8")
    (src / "new_manifest.csv").write_text(NEW_CSV, encoding="utf-8")

    sink = str(tmp_path / "a_sink")
    run_availablenow(stream_manifests(spark, str(src)), sink, str(tmp_path / "ck"))
    got = spark.read.parquet(sink)
    batch = declared_cargo(read_manifests_raw(spark, str(src)))
    assert got.count() == batch.count() == 6
    assert {r.mawb_no for r in got.collect()} == {"old_manifest", "25040104EX"}


def _events(spark):
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (0, base, 7, "click", 1.0),
        (1, base + datetime.timedelta(minutes=10), 7, "click", 2.0),
        (2, base + datetime.timedelta(minutes=65), 7, "view", 4.0),  # new hour+session gap
        (3, base + datetime.timedelta(minutes=70), 8, "click", 8.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_hourly_event_counts_batch(spark):
    got = {
        (r.window_start.hour, r.event_type): (r.n_events, r.sum_value)
        for r in hourly_event_counts(_events(spark)).collect()
    }
    assert got == {(0, "click"): (2, 3.0), (1, "view"): (1, 4.0), (1, "click"): (1, 8.0)}


def test_hourly_event_counts_streaming_matches_batch(spark, tmp_path):
    src = str(tmp_path / "events_pq")
    _events(spark).write.parquet(src)
    stream = (
        spark.readStream.schema(_events(spark).schema).parquet(src)
    )
    agg = hourly_event_counts(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("hourly_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.window_start.hour, r.event_type): (r.n_events, r.sum_value)
        for r in spark.sql("select * from hourly_test").collect()
    }
    batch = {
        (r.window_start.hour, r.event_type): (r.n_events, r.sum_value)
        for r in hourly_event_counts(_events(spark)).collect()
    }
    assert got == batch


def test_sessionize_batch(spark):
    got = {
        (r.user_id, r.session_id): r.n_events
        for r in sessionize(_events(spark), gap_minutes=30).collect()
    }
    # user 7: events 0,1 in one session; 65min gap → new session
    assert got == {(7, 1): 2, (7, 2): 1, (8, 1): 1}


def test_sessionize_stream_smoke(spark, tmp_path):
    src = str(tmp_path / "events_pq2")
    _events(spark).write.parquet(src)
    stream = spark.readStream.schema(_events(spark).schema).parquet(src)
    q = (
        sessionize_stream(stream, gap_minutes=30)
        .writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from sessions_test").collect()
    got = {(r.user_id, r.n_events) for r in rows}
    assert (7, 2) in got and (7, 1) in got and (8, 1) in got
