"""Registered Python UDTFs — the LATERAL table-function surface.

SURVEY §2.13's other UDTF shapes are ``mapInPandas`` kernels invoked
from the DataFrame API (zip/xlsx parsers, multimodal decode); this
module covers the remaining front door: a ``@udtf`` class REGISTERED
into the session catalog and invoked FROM SQL with a lateral join —
the Spark 3.5+ form of "user-defined table function" a SQL-first user
reaches for. Arrow-optimized (``useArrow=True``) so rows cross the
Python boundary in batches.

Per-row error containment follows the connector rule: a malformed
payload yields no rows for that input, never a stage failure.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="prop_key string, prop_value bigint", useArrow=True)
class ParseProps:
    """Explode a flat JSON-object string into (key, integer value)
    rows; non-integer values and malformed JSON are skipped per-row."""

    def eval(self, props: str):  # noqa: D102 — UDTF contract
        if not props:
            return
        try:
            obj = json.loads(props)
        except (ValueError, TypeError):
            return
        if not isinstance(obj, dict):
            return
        for k, v in obj.items():
            if isinstance(v, bool) or not isinstance(v, int):
                continue
            yield k, v


def register_udtfs(spark: SparkSession) -> None:
    """Idempotently register the module's UDTFs into the session."""
    spark.udtf.register("parse_props", ParseProps)
