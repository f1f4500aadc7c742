"""Scalar function library (Column → Column combinators).

Every function here compiles to built-in Catalyst expressions — JVM-side,
whole-stage-codegen'd — except :func:`nfkc` which is the engine's one
genuine pandas UDF (Unicode NFKC has no Catalyst builtin).
"""

from sea_express_customs_etl_spark.functions.strings import (  # noqa: F401
    clean_doc_no,
    depunct,
    is_empty_placeholder,
    link_key,
    normalize_headers,
    normalize_text_col,
    scrub_key,
    split_last,
    squeeze_ws,
)
from sea_express_customs_etl_spark.functions.numeric import (  # noqa: F401
    guarded_unit_price,
    num_coerce,
)
from sea_express_customs_etl_spark.functions.datetimes import (  # noqa: F401
    iso_date_part,
    now_suffix,
)
from sea_express_customs_etl_spark.functions.text_udfs import nfkc  # noqa: F401
