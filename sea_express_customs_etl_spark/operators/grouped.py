"""Grouped-map operators (``applyInPandas``) — the designated fallback
shape for per-group custom logic Spark expressions can't state
(SURVEY.md §2.13 / §7.2). Used sparingly: everything in the core path
compiles to Catalyst; this module demonstrates the pattern with a
per-group standardization kernel.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def grouped_zscore(
    df: DataFrame, key_cols: list[str], value_col: str, out_col: str = "zscore"
) -> DataFrame:
    """Per-group z-score of ``value_col`` (population std; 0.0 for
    constant/singleton groups). One Arrow batch per group — group sizes
    must fit an executor's memory, which holds for bounded natural keys
    (waybills, users); for unbounded groups use window mean/std
    expressions instead."""
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} double"

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].astype(float)
        std = v.std(ddof=0)
        pdf[out_col] = 0.0 if (pd.isna(std) or std == 0.0) else (v - v.mean()) / std
        return pdf

    return df.groupBy(*key_cols).applyInPandas(kernel, schema)
