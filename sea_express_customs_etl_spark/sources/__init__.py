"""Ingestion connectors (SURVEY.md §2.1, OP-SRC-*).

Each connector is a ``binaryFile`` scan + an Arrow-batched
``mapInPandas`` UDTF that does ONLY byte-level parsing (zip member
extraction, XML element text, CSV/Excel cell access) and emits raw
string columns plus an explicit ``_row_idx`` document-order column.
All typing, cleaning, sequencing and business derivation happens
afterwards in Catalyst expressions — so the optimizer sees every
filter/projection, and the Python boundary is crossed once, columnar.
"""

from sea_express_customs_etl_spark.sources.xml_source import (  # noqa: F401
    official_history,
    parse_inline_xsd,
    read_bid_heads_raw,
    typed_bid_heads,
)
from sea_express_customs_etl_spark.sources.excel_source import (  # noqa: F401
    declared_cargo,
    read_manifests_raw,
)
