"""Unit tests for the scalar function library (SURVEY.md §2.9-2.11).

Golden values come from the reference's own docstrings/logs:
``clean_doc_no`` example ``src/import_xml_history.py:29``, the
normalize_text collision value from ``training.log:19``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from sea_express_customs_etl_spark.functions import (
    clean_doc_no,
    guarded_unit_price,
    is_empty_placeholder,
    iso_date_part,
    link_key,
    nfkc,
    normalize_text_col,
    num_coerce,
    scrub_key,
    split_last,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def _apply(spark, fn, value):
    df = spark.createDataFrame([(value,)], "s string")
    return df.select(fn(F.col("s")).alias("v")).collect()[0].v


def test_clean_doc_no(spark):
    assert _apply(spark, clean_doc_no, "BY/ /14/440 /JM0H3") == "BY14440JM0H3"
    assert _apply(spark, clean_doc_no, None) is None


def test_scrub_key_and_link_key(spark):
    assert _apply(spark, scrub_key, " ab/ c-d ") == "ABCD"
    df = spark.createDataFrame([("25 032-203EX", "472/LV0087047")], "m string, h string")
    got = df.select(link_key(F.col("m"), F.col("h")).alias("k")).collect()[0].k
    assert got == "25032203EX_472LV0087047"


def test_split_last(spark):
    assert _apply(spark, split_last, "A/B/C") == "C"
    assert _apply(spark, split_last, "ABC") == "ABC"
    assert _apply(spark, split_last, "A/") == ""


def test_nfkc_fullwidth(spark):
    # full-width letters/digits → half-width (reference src/batch_train.py:34)
    assert _apply(spark, nfkc, "ＡＢＣ１２３") == "ABC123"
    assert _apply(spark, nfkc, None) is None


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("宝宝辅食机/料理机/食物搅拌器", "食物搅拌器"),  # training.log:19 collision value
        ("X/Polo衫", "POLO衫"),
        ("ＵＳＢ风扇", "USB风扇"),  # full-width → half-width then upper
        ("hello-world (new)", "HELLO WORLD NEW"),
        ("  a   b  ", "A B"),
        (None, ""),
        ("", ""),
    ],
)
def test_normalize_text(spark, raw, expected):
    assert _apply(spark, normalize_text_col, raw) == expected


def test_normalize_text_cjk_depunct_preserves_letters(spark):
    # Java \w is ASCII-only; the engine must keep CJK (SURVEY §7.3.3)
    assert _apply(spark, normalize_text_col, "紙盒(大)") == "紙盒 大"


def test_num_coerce(spark):
    df = spark.createDataFrame(
        [("1.5",), ("junk",), (None,), ("  2 ",), ("",)], "s string"
    )
    got = [r.v for r in df.select(num_coerce(F.col("s")).alias("v")).collect()]
    assert got == [1.5, 0.0, 0.0, 2.0, 0.0]


def test_guarded_unit_price_bankers_rounding(spark):
    df = spark.createDataFrame(
        [(0.625, 10.0), (100.0, 0.0), (1.0, 3.0)], "amt double, qty double"
    )
    got = [
        r.v
        for r in df.select(
            guarded_unit_price(F.col("amt") * 10, F.col("qty")).alias("v")
        ).collect()
    ]
    # 6.25/10=0.625 → bround(0.625,4)=0.625 (no-op); qty=0 → 0.0
    assert got[1] == 0.0
    assert got[2] == round(10.0 / 3.0, 4)
    # banker's rounding parity with Python round() on an exactly
    # representable midpoint (see num_coerce docstring for the
    # pseudo-midpoint divergence)
    df2 = spark.createDataFrame([(0.0625, 1.0)], "amt double, qty double")
    v = df2.select(guarded_unit_price(F.col("amt"), F.col("qty"), 3).alias("v")).collect()[0].v
    assert v == round(0.0625, 3) == 0.062


def test_is_empty_placeholder(spark):
    df = spark.createDataFrame(
        [("nan",), ("None ",), ("",), ("x",), (None,)], "s string"
    )
    got = [r.v for r in df.select(is_empty_placeholder(F.col("s")).alias("v")).collect()]
    assert got == [True, True, True, False, True]


def test_now_suffix_shape(spark):
    import re

    from sea_express_customs_etl_spark.functions.datetimes import now_suffix

    v = spark.range(1).select(now_suffix().alias("v")).collect()[0].v
    assert re.fullmatch(r"\d{8}_\d{6}", v)


def test_normalize_headers(spark):
    from sea_express_customs_etl_spark.functions.strings import normalize_headers

    df = spark.createDataFrame([(1, 2)], [" 分提單號碼\n", " qty "])
    assert normalize_headers(df).columns == ["分提單號碼", "qty"]


def test_iso_date_part(spark):
    import datetime

    df = spark.createDataFrame(
        [("2025-03-22T00:00:00+08:00",), ("2025-04-01",), ("garbage",), (None,)],
        "s string",
    )
    got = [r.v for r in df.select(iso_date_part(F.col("s")).alias("v")).collect()]
    assert got == [
        datetime.date(2025, 3, 22),
        datetime.date(2025, 4, 1),
        None,
        None,
    ]


def test_parse_props_udtf_containment(spark):
    """Registered UDTF from SQL: explodes flat int pairs, skips
    malformed JSON, non-dict JSON, and non-integer values per-row."""
    from sea_express_customs_etl_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [(1, '{"a": 1, "b": 2}'), (2, "not json"), (3, None),
         (4, '[1,2]'), (5, '{"s": "x", "f": 1.5, "t": true, "n": 7}')],
        "event_id long, props string",
    ).createOrReplaceTempView("props_t")
    rows = spark.sql(
        "SELECT event_id, prop_key, prop_value "
        "FROM props_t t, LATERAL parse_props(t.props) p"
    ).collect()
    got = {(r.event_id, r.prop_key): r.prop_value for r in rows}
    assert got == {(1, "a"): 1, (1, "b"): 2, (5, "n"): 7}
