"""Wave-Y pins: bucketed join plans with zero exchanges on the join,
the partitioned sink prunes at the scan, TextRank edge building stays
map-side and ranks the hub word first."""

import contextlib
import io
import re

import pyspark.sql.functions as F

from sea_express_customs_etl_spark.operators.textrank import (
    textrank_keywords,
    word_cooccurrence_edges,
)


def _formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_join_exchange(spark, tmp_path):
    left = spark.range(0, 200).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("a")
    )
    right = spark.range(0, 200).select(
        F.col("id").alias("k"), (F.col("id") * 5).alias("b")
    )
    from sea_express_customs_etl_spark.sinks.bucketed import write_bucketed

    write_bucketed(left, "wy_bkt_l", ("k",), num_buckets=4, sort_cols=("k",))
    write_bucketed(right, "wy_bkt_r", ("k",), num_buckets=4, sort_cols=("k",))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("wy_bkt_l").join(spark.table("wy_bkt_r"), "k")
        agg = j.groupBy().agg(F.sum(F.col("a") + F.col("b")))
        plan = _formatted_plan(agg)
        # the join subtree is exchange-free; only the final
        # single-group aggregate may exchange
        assert "SortMergeJoin" in plan
        n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
        assert n_exchanges <= 1, plan
        assert not re.search(r"Exchange hashpartitioning\(k#", plan), plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.sql("DROP TABLE IF EXISTS wy_bkt_l")
    spark.sql("DROP TABLE IF EXISTS wy_bkt_r")


def test_partitioned_write_prunes_at_scan(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], ["part_col", "v"]
    )
    path = str(tmp_path / "pp")
    df.write.mode("overwrite").partitionBy("part_col").parquet(path)
    back = spark.read.parquet(path).filter(F.col("part_col") == "a")
    plan = _formatted_plan(back)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "part_col" in m.group(1), plan
    assert back.count() == 2


def test_textrank_edges_golden(spark):
    docs = spark.createDataFrame(
        [(1, "Hub spoke  hub rim"), (2, "hub spoke")], ["doc_id", "text"]
    )
    edges = {(r.src, r.dst): r.w for r in
             word_cooccurrence_edges(docs).collect()}
    # doc1 pairs: hub-spoke, spoke-hub, hub-rim; doc2: hub-spoke
    assert edges[("hub", "spoke")] == 3  # 2 forward + 1 reversed
    assert edges[("spoke", "hub")] == 3
    assert edges[("hub", "rim")] == 1
    assert ("hub", "hub") not in edges


def test_textrank_edge_building_is_map_side(spark):
    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    plan = _formatted_plan(word_cooccurrence_edges(docs))
    # one aggregate exchange only — no token-grain self-join
    assert "Join" not in plan, plan


def test_textrank_hub_word_ranks_first(spark):
    docs = spark.createDataFrame(
        [(i, f"hub w{i}") for i in range(8)], ["doc_id", "text"]
    )
    top = textrank_keywords(docs, top_n=3).collect()
    assert top[0].word == "hub"
    assert top[0].rank_u6 > top[1].rank_u6
