"""Numeric / conditional scalar functions (SURVEY.md §2.10, OP-NUM-*)."""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F


def num_coerce(col: Column, default: float = 0.0) -> Column:
    """Lenient numeric cast: unparseable/NULL → ``default`` (never throws,
    even under ANSI mode — ``try_cast`` + ``coalesce``).

    Reference: ``pd.to_numeric(errors='coerce').fillna(0)``
    (``src/process_excel_order.py:99-109``) and ``float(x) except → 0``
    (``src/import_xml_history.py:78-102``).
    """
    return F.coalesce(F.trim(col.cast("string")).try_cast("double"), F.lit(float(default)))


def guarded_unit_price(amount: Column, qty: Column, scale: int = 4) -> Column:
    """``round(amount/qty, scale)`` when ``qty > 0`` else ``0.0``.

    Reference: ``src/import_xml_history.py:94-98`` (OP-NUM-DIV). Python's
    ``round`` is banker's rounding (HALF_EVEN) → Spark ``bround``; Spark's
    plain ``round`` is HALF_UP and would diverge on every midpoint.

    Known divergence (documented, accepted): Python rounds the exact
    binary value of the double while ``bround`` rounds its shortest
    decimal representation, so a *pseudo-midpoint* like ``0.00125``
    (binary ≈ 0.00125000…026) rounds up in Python but HALF_EVEN-down in
    Spark. Exactly-representable midpoints (e.g. ``0.0625``) agree.
    """
    return F.when(qty > 0, F.bround(amount / qty, scale)).otherwise(F.lit(0.0))
