"""Sinks (SURVEY.md §2.2, OP-SNK-*)."""

from sea_express_customs_etl_spark.sinks.parquet_sink import (  # noqa: F401
    append_parquet,
    archive_files,
    overwrite_with_backup,
)
from sea_express_customs_etl_spark.sinks.jdbc_sink import (  # noqa: F401
    append_jdbc,
    replace_jdbc_with_backup,
)
