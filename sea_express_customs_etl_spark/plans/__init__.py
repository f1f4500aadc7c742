"""Composed query plans: flagship pipelines over the lakehouse tables."""

from sea_express_customs_etl_spark.plans.knowledge import knowledge_base  # noqa: F401
from sea_express_customs_etl_spark.plans.standins import (  # noqa: F401
    declared_table,
    load_table,
    official_table,
)
