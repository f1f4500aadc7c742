"""The flagship link-and-vote query expressed as pure Spark SQL — the
engine's SQL-API surface. Semantically identical to
``plans/knowledge.py`` (same DuckDB oracle validates both); dialect
differences from the oracle SQL:

* ``split(x, '/')`` + ``element_at(..., -1)`` instead of
  ``string_split(...)[-1]``
* Spark's ``regexp_replace`` is always global (no ``'g'`` flag)
* the punctuation class is written with Unicode categories
  (``\\p{L}\\p{N}``) because Java's ``\\w`` is ASCII-only — Python/RE2
  ``\\w`` keeps CJK and Spark must too (SURVEY.md §7.3.3)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sea_express_customs_etl_spark.plans.standins import load_table

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
WITH a_raw AS (
  SELECT 'M' || CAST(o.o_custkey % 20 AS STRING) || 'EX' AS mawb_no,
         CASE WHEN l.l_orderkey % 3 = 0
              THEN 'h-' || CAST(l.l_orderkey AS STRING) || ' '
              ELSE 'H' || CAST(l.l_orderkey AS STRING) END AS hawb_no,
         row_number() OVER (PARTITION BY l.l_orderkey
                            ORDER BY l.l_linenumber, p.p_name) AS item_no,
         CASE WHEN l.l_linenumber = 1 THEN 'X/' || p.p_name
              ELSE p.p_name END AS description_original
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey),
b_raw AS (
  SELECT 'm' || CAST(o.o_custkey % 20 AS STRING) || 'ex' AS mawb_no,
         'h' || CAST(l.l_orderkey AS STRING) AS hawb_no,
         row_number() OVER (PARTITION BY l.l_orderkey
             ORDER BY l.l_linenumber DESC, p.p_brand, p.p_type) AS item_sequence,
         p.p_brand AS description_official,
         p.p_type AS ccc_code
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_linenumber <= 5),
a AS (SELECT {_LINK.format(m='mawb_no', h='hawb_no')} AS link_key,
             item_no,
             {_NORM.format(e='description_original')} AS original_description
      FROM a_raw
      WHERE mawb_no IS NOT NULL AND hawb_no IS NOT NULL
        AND description_original IS NOT NULL),
b AS (SELECT {_LINK.format(m='mawb_no', h='hawb_no')} AS link_key,
             item_sequence, description_official, ccc_code
      FROM b_raw
      WHERE mawb_no IS NOT NULL AND hawb_no IS NOT NULL),
valid AS (SELECT ca.link_key
          FROM (SELECT link_key, count(*) AS c FROM a GROUP BY link_key) ca
          JOIN (SELECT link_key, count(*) AS c FROM b GROUP BY link_key) cb
            USING (link_key)
          WHERE ca.c - cb.c = 0),
pa AS (SELECT link_key,
              row_number() OVER (PARTITION BY link_key ORDER BY item_no) AS pos,
              original_description
       FROM a WHERE link_key IN (SELECT link_key FROM valid)),
pb AS (SELECT link_key,
              row_number() OVER (PARTITION BY link_key ORDER BY item_sequence) AS pos,
              description_official, ccc_code
       FROM b WHERE link_key IN (SELECT link_key FROM valid)),
votes AS (SELECT original_description,
                 description_official AS official_description,
                 ccc_code, count(*) AS frequency
          FROM pa JOIN pb USING (link_key, pos)
          WHERE original_description <> ''
          GROUP BY 1, 2, 3)
SELECT original_description, official_description, ccc_code, frequency
FROM (SELECT *, row_number() OVER (PARTITION BY original_description
            ORDER BY frequency DESC, official_description, ccc_code) AS rn
      FROM votes)
WHERE rn = 1
"""


def knowledge_extraction_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Register the base tables and run the flagship as one SQL string
    through Spark's parser/analyzer — same Catalyst plan machinery, SQL
    front door."""
    for t in ("lineitem", "orders", "part"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(KNOWLEDGE_EXTRACTION_SPARK_SQL)
