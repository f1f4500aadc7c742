"""Unit tests for text-analysis operators."""

from __future__ import annotations

from sea_express_customs_etl_spark.operators.textstats import (
    fingerprint,
    lang_id,
    text_stats,
    token_counts,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_text_stats_basic(spark):
    df = _docs(spark, [(1, "the cat, and a dog!")])
    r = text_stats(df).collect()[0]
    assert r.n_words == 5
    assert r.n_chars_calc == 19
    assert r.punct_ratio == round(2 / 19, 4)
    assert r.stop_ratio == round(3 / 5, 4)  # the, and, a


def test_lang_id_markers(spark):
    df = _docs(
        spark,
        [
            (1, "the quick fox and hound"),
            (2, "der hund und die katze"),
            (3, "le chat et le chien"),
            (4, "el perro y el gato"),
            (5, "紙盒 與 貼紙"),
            (6, "nothing matching here"),
        ],
    )
    got = {r.doc_id: r.predicted_lang for r in lang_id(df).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "zh", 6: "unknown"}


def test_token_counts(spark):
    df = _docs(spark, [(1, "one two three")])
    r = token_counts(df).collect()[0]
    assert r.ws_tokens == 3
    assert r.bpe_tokens_est == 4  # ceil(13/4)


def test_fingerprint_whitespace_case_stable(spark):
    df = _docs(spark, [(1, "Hello   World"), (2, "hello world"), (3, "other")])
    got = {r.doc_id: r.fingerprint for r in fingerprint(df).collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]
