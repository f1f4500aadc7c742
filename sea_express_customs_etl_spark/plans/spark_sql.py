"""The flagship link-and-vote query expressed as pure Spark SQL — the
engine's SQL-API surface. Semantically identical to
``plans/knowledge.py`` (same DuckDB oracle validates both).

Like the reference's analytical query (`src/batch_train.py:66-80`,
``SELECT ... FROM table_a_raw`` / ``table_b_history``), the SQL starts
from the two MATERIALIZED base tables — registered here as temp views
over the session-cached stand-ins — and derives everything else in one
statement. The formulation is the packed-array scale plan (one
``collect_list`` aggregate per side, co-partitioned join, residual
size filter, min-struct vote), i.e. the same physical shape Catalyst
builds for the DataFrame flagship: the SQL front door must not cost
more than the DataFrame front door.

Dialect differences from the DuckDB oracle SQL:

* ``split(x, '/')`` + ``element_at(..., -1)`` instead of
  ``string_split(...)[-1]``
* Spark's ``regexp_replace`` is always global (no ``'g'`` flag)
* the punctuation class is written with Unicode categories
  (``\\p{L}\\p{N}``) because Java's ``\\w`` is ASCII-only — Python/RE2
  ``\\w`` keeps CJK and Spark must too (SURVEY.md §7.3.3)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sea_express_customs_etl_spark.plans.standins import (
    declared_table,
    official_table,
)

_NORM = (
    "coalesce(trim(regexp_replace(regexp_replace("
    "element_at(split(upper({e}), '/'), -1), "
    "'[^\\\\p{{L}}\\\\p{{N}}_\\\\s]', ' '), '\\\\s+', ' ')), '')"
)

_LINK = (
    "upper(regexp_replace({m}, '[\\\\s/-]', '')) || '_' || "
    "upper(regexp_replace({h}, '[\\\\s/-]', ''))"
)

KNOWLEDGE_EXTRACTION_SPARK_SQL = f"""
WITH a AS (
  SELECT {_LINK.format(m='mawb_no', h='hawb_no')} AS link_key,
         item_no,
         {_NORM.format(e='description_original')} AS original_description
  FROM table_a_raw
  WHERE mawb_no IS NOT NULL AND hawb_no IS NOT NULL
    AND description_original IS NOT NULL),
b AS (
  SELECT {_LINK.format(m='mawb_no', h='hawb_no')} AS link_key,
         item_sequence, description_official, ccc_code
  FROM table_b_history
  WHERE mawb_no IS NOT NULL AND hawb_no IS NOT NULL),
-- one aggregate per side packs each waybill's items in ordinal order;
-- the join is then co-partitioned on link_key (exchange reuse) and the
-- count-equality check is a residual size filter, NOT a join key
a_packed AS (
  SELECT link_key,
         sort_array(collect_list(struct(item_no, original_description))) AS ia
  FROM a GROUP BY link_key),
b_packed AS (
  SELECT link_key,
         sort_array(collect_list(
             struct(item_sequence, description_official, ccc_code))) AS ib
  FROM b GROUP BY link_key),
packed AS (
  SELECT ia.original_description AS src_arr,
         ib.description_official AS off_arr,
         ib.ccc_code AS ccc_arr
  FROM a_packed JOIN b_packed USING (link_key)
  WHERE size(ia) - size(ib) = 0),
aligned AS (
  SELECT z.src_arr AS original_description,
         z.off_arr AS official_description,
         z.ccc_arr AS ccc_code
  FROM packed
  LATERAL VIEW explode(arrays_zip(src_arr, off_arr, ccc_arr)) t AS z),
votes AS (
  SELECT original_description, official_description, ccc_code,
         count(*) AS frequency
  FROM aligned
  WHERE original_description <> ''
  GROUP BY 1, 2, 3)
SELECT original_description, official_description, ccc_code, frequency
FROM (SELECT *, row_number() OVER (PARTITION BY original_description
            ORDER BY frequency DESC, official_description, ccc_code) AS rn
      FROM votes)
WHERE rn = 1
"""


def knowledge_extraction_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Register the (materialized) customs base tables and run the
    flagship as one SQL string through Spark's parser/analyzer — same
    Catalyst plan machinery, SQL front door."""
    declared_table(spark, sf_dir).createOrReplaceTempView("table_a_raw")
    official_table(spark, sf_dir).createOrReplaceTempView("table_b_history")
    return spark.sql(KNOWLEDGE_EXTRACTION_SPARK_SQL)
