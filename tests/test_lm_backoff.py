"""Unit tests for stupid-backoff trigram scoring and inverted index."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from sea_express_customs_etl_spark.operators.lm import trigram_backoff_score
from sea_express_customs_etl_spark.operators.textstats import inverted_index

MICRO = 1_000_000


def test_backoff_levels_fire_in_order(spark):
    """One scored doc whose three trigrams hit: exact c3 match, a
    bigram-level backoff, and a unigram-level backoff."""
    train = spark.createDataFrame(
        [(0, "a b c d")], "doc_id long, text string"
    )
    # trigrams in train: (a,b,c), (b,c,d)
    # c2 (both positions): ab,bc / bc,cd → bc counted twice
    # c1 (b,c positions): b,c / c,d → c twice
    score = spark.createDataFrame(
        [(1, "a b c"), (3, "x b c"), (5, "x y d")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in trigram_backoff_score(train, score).collect()}

    # doc 1: (a,b,c) seen → ln(c3/c2(ab)) = ln(1/1) = 0
    assert got[1].backoff_hits == 0
    assert got[1].score_u6 == 0
    # doc 3: (x,b,c) unseen, (b,c) seen → ln(c2(bc)/c1(b)) - 1
    assert got[3].backoff_hits == 1
    assert got[3].score_u6 == round((math.log(2 / 1) - 1) * MICRO)
    # doc 5: (x,y,d) unseen, (y,d) unseen, d seen → ln(c1(d)/N) - 2
    assert got[5].backoff_hits == 1
    assert got[5].score_u6 == round((math.log(1 / 4) - 2) * MICRO)


def test_backoff_unseen_word_and_short_docs(spark):
    train = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
    score = spark.createDataFrame(
        [(1, "q q zz"), (3, "too short")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in trigram_backoff_score(train, score).collect()}
    # fully unseen final word → α²/N floor
    assert got[1].score_u6 == round((math.log(1 / 4) - 2) * MICRO)
    # < 3 tokens → auditable zero row, not dropped
    assert (got[3].n_trigrams, got[3].score_u6) == (0, 0)


def test_inverted_index_gap_encoding(spark):
    df = spark.createDataFrame(
        [(2, "x y"), (5, "x"), (9, "x x")], "doc_id long, text string"
    )
    got = {r.term: r for r in inverted_index(df).collect()}
    assert got["x"].gaps == "2,3,4"  # docs 2,5,9 delta-encoded
    assert (got["x"].df, got["x"].total_tf) == (3, 4)  # doc 9 has tf=2
    assert got["y"].gaps == "2" and got["y"].df == 1
