"""Date/time scalar functions (SURVEY.md §2.11, OP-DT-*)."""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F


def iso_date_part(col: Column) -> Column:
    """ISO datetime string → DateType: ``'2025-03-22T00:00:00+08:00'`` →
    ``date'2025-03-22'``; empty / unparseable → NULL.

    Reference: ``src/import_xml_history.py:66-71`` (``split('T')[0]``),
    upgraded to a real DateType instead of a date-shaped string.
    """
    return F.substring_index(col.cast("string"), "T", 1).try_cast("date")


def now_suffix() -> Column:
    """``yyyyMMdd_HHmmss`` timestamp literal for backup-table naming.

    Reference: ``src/batch_train.py:161`` (OP-DT-NOWFMT).
    """
    return F.date_format(F.current_timestamp(), "yyyyMMdd_HHmmss")
