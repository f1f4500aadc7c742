"""Unit tests for wordpiece_train (operators/bpe.py) and the
doc-novelty composition: the gate hash-checks both against DuckDB at
sf0.01; these pin the semantic CLAIMS — WordPiece's likelihood-ratio
rule picks collocated pairs where BPE's count rule picks frequent
ones, and novelty separates unique from duplicated docs."""

from __future__ import annotations

import pyspark.sql.functions as F

from sea_express_customs_etl_spark.operators.bpe import (
    bpe_train,
    wordpiece_train,
)


def _corpus(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_wordpiece_prefers_collocation_over_frequency(spark):
    # 'e' and 'r' are each very frequent but rarely adjacent;
    # 'q' and 'u' are rarer but ALWAYS adjacent. BPE (raw count)
    # merges the frequent pair first; WordPiece (n / (c_l * c_r))
    # must pick the perfectly collocated one.
    texts = [
        "red rare ere seer rer er re er re er re er re",
        "qu qu qu qu",
    ] * 3
    df = _corpus(spark, texts)
    wp = wordpiece_train(df, n_merges=1)
    bp = bpe_train(df, n_merges=1)
    assert wp[0] == ("q", "u")
    assert bp[0] != ("q", "u")


def test_wordpiece_deterministic_and_layout_invariant(spark):
    texts = ["the quick brown fox", "the quiet queen", "thin quilt"] * 4
    a = wordpiece_train(_corpus(spark, texts), n_merges=4)
    b = wordpiece_train(
        _corpus(spark, texts).repartition(7), n_merges=4
    )
    assert a == b and len(a) == 4


def test_wordpiece_merge_applies_to_dictionary(spark):
    # after the first merge the pair should no longer dominate round 2
    texts = ["qu qu qu"] * 3
    merges = wordpiece_train(_corpus(spark, texts), n_merges=3)
    assert merges[0] == ("q", "u")
    assert all(m != ("q", "u") for m in merges[1:])


def test_wordpiece_greedy_encode_hand_computed(spark):
    """Greedy longest-match-first over word||'</w>' with the merge
    units + sentinel as vocabulary: hand-computed piece counts, the
    longest-PREFIX-wins property (not merge order), sentinel counted
    as one piece, unknown chars as one piece each."""
    from sea_express_customs_etl_spark.operators.bpe import (
        wordpiece_encode_pieces,
    )
    import pyspark.sql.functions as F

    merges = [("a", "b"), ("ab", "c")]  # units: 'ab', 'abc'
    words = spark.createDataFrame(
        [("abcd",), ("abab",), ("x",), ("abc",)], "word string"
    )
    got = {
        r.word: r.n_pieces
        for r in wordpiece_encode_pieces(words, merges, rounds=12).collect()
    }
    # abcd</w>: 'abc'(longest, NOT 'ab'), 'd', '</w>'  -> 3
    # abab</w>: 'ab', 'ab', '</w>'                     -> 3
    # x</w>:    'x', '</w>'                            -> 2
    # abc</w>:  'abc', '</w>'                          -> 2
    assert got == {"abcd": 3, "abab": 3, "x": 2, "abc": 2}

    # surplus rounds are no-ops: more rounds, same counts
    got24 = {
        r.word: r.n_pieces
        for r in wordpiece_encode_pieces(words, merges, rounds=24).collect()
    }
    assert got24 == got
