"""Order-dependent operators (SURVEY.md §2.6) — forward-fill and
per-group sequencing.

Row order is load-bearing in the reference (pandas ``ffill``,
``cumcount``, XML document-order counters) but Spark DataFrames are
unordered; every operator here therefore requires an EXPLICIT order
column, materialized at parse time by the source adapters
(``_row_idx``: per-file 0..n, combined with a file/member id for global
uniqueness — SURVEY.md §7.3.1). ``monotonically_increasing_id`` after a
shuffle is never acceptable.

Scale note: both operators window over ``partition_cols``; with no
partition columns Spark would collapse to a single partition, so
``ffill``/``seq_number`` require at least one (for file-shaped data the
file id — merged-cell runs never cross files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F


def ffill(
    df: DataFrame,
    col: str,
    order_col: str,
    partition_cols: tuple[str, ...],
    out_col: str | None = None,
) -> DataFrame:
    """Forward-fill ``col`` downward in ``order_col`` order within each
    partition — the merged-cell repair (OP-WIN-FFILL; reference
    ``src/process_excel_order.py:94,146``).
    """
    if not partition_cols:
        raise ValueError("ffill requires partition columns (single global partition at scale)")
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(F.col(order_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col or col, F.last(F.col(col), ignorenulls=True).over(w))


def seq_number(
    df: DataFrame,
    partition_cols: tuple[str, ...],
    order_col: str,
    out_col: str = "item_no",
) -> DataFrame:
    """1-based sequence number per group in ``order_col`` order
    (OP-WIN-SEQ; reference ``cumcount()+1``
    ``src/process_excel_order.py:156`` and the per-HAWB XML counter
    ``src/import_xml_history.py:44,56,73``).
    """
    if not partition_cols:
        raise ValueError("seq_number requires partition columns")
    w = Window.partitionBy(*partition_cols).orderBy(F.col(order_col))
    return df.withColumn(out_col, F.row_number().over(w))
