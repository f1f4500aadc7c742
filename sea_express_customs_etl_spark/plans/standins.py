"""Customs-table stand-ins derived from the TPC-H-ish test parquet.

FIXTURES.md §5 maps the customs data model onto the driver's testdata:
``hawb`` ← ``o_orderkey``, items ← ``lineitem`` sequenced by
``l_linenumber``, ``description_original`` ← ``p_name``,
``official_description``/``ccc_code`` ← ``p_brand``/``p_type``, ``mawb``
← an ``o_custkey`` bucket, with dirt (spaces, ``-``, ``/``, case) injected
in the query prologue so the key-scrub operators have real work.

These derivations are mirrored verbatim by the DuckDB oracle SQL in
``sea_express_customs_etl_spark.plans.oracles`` — any change here must
change there too.

Deliberate properties:

* A's keys are dirty (``h-…␣`` / ``H…``), B's differ in case — equal
  only after OP-JOIN-KEY scrubbing.
* B drops items with ``l_linenumber > 5`` → orders with 6-7 items have
  mismatched counts and must be excluded by OP-JOIN-COUNTEQ.
* B's ``item_sequence`` runs in REVERSE line order, so positional
  alignment genuinely permutes items (the i-th declared item pairs with
  the (n+1-i)-th official item) and the majority vote sees conflicting
  targets per source description.
* ``description_original`` gets an ``X/`` prefix on line 1 so
  OP-STR-SPLITLAST merges it back with the plain variant.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

# Session-scoped materialization of the derived customs stand-ins. In
# the reference, ``table_a_raw``/``table_b_history`` are REAL MySQL
# tables (`src/process_excel_order.py:235`, `src/import_xml_history.py:205`)
# — only this test harness derives them from the TPC-H parquet on the
# fly. Persisting the derived tables once per (session, sf_dir) is the
# in-session form of that materialized staging table; every query then
# starts from table state exactly as the reference's queries do.
# Keyed by applicationId so a stopped session's entries are never
# reused (app ids are unique per SparkContext).
_MATERIALIZED: dict[tuple[str, str, str], DataFrame] = {}


def _materialized(
    spark: SparkSession, sf_dir: str, name: str, build: Callable[[], DataFrame]
) -> DataFrame:
    app_id = spark.sparkContext.applicationId
    # evict entries left behind by STOPPED sessions: their DataFrames
    # are unusable (app ids never repeat), and keeping them pins dead
    # persisted-RDD bookkeeping for the life of the process
    for k in [k for k in _MATERIALIZED if k[0] != app_id]:
        del _MATERIALIZED[k]
    key = (app_id, sf_dir, name)
    df = _MATERIALIZED.get(key)
    if df is None:
        df = build().persist()
        _MATERIALIZED[key] = df
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS). Spark ≥4.1
    reads it natively as ``timestamp_ntz`` truncated to microseconds —
    exactly what DuckDB's reader does, so oracle parity is preserved;
    we only re-cast to session-time ``timestamp`` (session tz is pinned
    UTC, so the wall-clock value is unchanged). Older Spark rejects
    NANOS in the vectorized reader; there we read raw nanos
    (``nanosAsLong``) and truncate with integer ``div`` (a double
    division would round at 2^53).
    """
    # timestamp-bearing queries must agree with the (naive-timestamp)
    # DuckDB oracle regardless of the calling session's timezone
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass  # conf removed in newer Spark: native NANOS support
        raw = spark.read.parquet(f"{sf_dir}/events.parquet")
        ts_type = dict(raw.dtypes)["ts"]
        if ts_type == "bigint":  # legacy nanosAsLong path (Spark ≤4.0)
            return raw.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _joined(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name", "p_brand", "p_type")
    # orders (~¼ of lineitem's rows) and part both grow with SF — no
    # pinned broadcast hints: AQE broadcasts them while they fit under
    # the threshold (always at bench scale) and falls back to shuffled
    # joins at 100 TB, where a forced broadcast of a 25 TB orders
    # table would OOM
    return li.join(orders, li.l_orderkey == orders.o_orderkey).join(
        part, li.l_partkey == part.p_partkey
    )


def declared_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``table_a_raw`` stand-in (shipper-declared cargo).

    ``item_no`` is a row_number rather than raw ``l_linenumber`` because
    the synthetic lineitem duplicates line numbers within an order; the
    tie-break on ``p_name`` makes the ordinal deterministic across
    engines (rows still tied after it are attribute-identical, hence
    interchangeable).
    """
    return _materialized(
        spark, sf_dir, "declared", lambda: _declared_build(spark, sf_dir)
    )


def _declared_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    j = _joined(spark, sf_dir)
    okey = F.col("l_orderkey").cast("string")
    item_no = F.row_number().over(
        Window.partitionBy("l_orderkey").orderBy(F.col("l_linenumber"), F.col("p_name"))
    )
    return j.select(
        F.concat(F.lit("M"), (F.col("o_custkey") % 20).cast("string"), F.lit("EX")).alias(
            "mawb_no"
        ),
        F.when(F.col("l_orderkey") % 3 == 0, F.concat(F.lit("h-"), okey, F.lit(" ")))
        .otherwise(F.concat(F.lit("H"), okey))
        .alias("hawb_no"),
        item_no.alias("item_no"),
        F.when(F.col("l_linenumber") == 1, F.concat(F.lit("X/"), F.col("p_name")))
        .otherwise(F.col("p_name"))
        .alias("description_original"),
    )


def official_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``table_b_history`` stand-in (broker-declared items)."""
    return _materialized(
        spark, sf_dir, "official", lambda: _official_build(spark, sf_dir)
    )


def _official_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    j = _joined(spark, sf_dir).filter(F.col("l_linenumber") <= 5)
    seq = F.row_number().over(
        Window.partitionBy("l_orderkey").orderBy(
            F.col("l_linenumber").desc(), F.col("p_brand"), F.col("p_type")
        )
    )
    return j.select(
        F.concat(F.lit("m"), (F.col("o_custkey") % 20).cast("string"), F.lit("ex")).alias(
            "mawb_no"
        ),
        F.concat(F.lit("h"), F.col("l_orderkey").cast("string")).alias("hawb_no"),
        seq.alias("item_sequence"),
        F.col("p_brand").alias("description_official"),
        F.col("p_type").alias("ccc_code"),
    )
