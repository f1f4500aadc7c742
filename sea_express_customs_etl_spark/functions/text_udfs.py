"""The engine's genuine Python UDFs — Arrow-vectorized pandas UDFs only.

Unicode NFKC normalization (full-width → half-width, compatibility
decomposition) has no Catalyst builtin; it is the single Python step in
the core query path (reference: ``src/batch_train.py:34``). Everything
else in the engine stays JVM-side.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


@pandas_udf(StringType())
def _nfkc_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda v: unicodedata.normalize("NFKC", v) if v is not None else None)


def nfkc(col: Column) -> Column:
    """Unicode NFKC normalization, Arrow-batched (OP-STR-NFKC)."""
    return _nfkc_udf(col)
