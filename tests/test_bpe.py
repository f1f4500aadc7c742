"""Tests for distributed BPE merge training (operators/bpe.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from sea_express_customs_etl_spark.operators.bpe import (
    END,
    apply_merge,
    bpe_encode,
    bpe_train,
    word_freq,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_word_freq_counts(spark):
    out = {
        r.word: r.freq
        for r in word_freq(_docs(spark, ["ab ab cd", "AB  x"])).collect()
    }
    assert out == {"ab": 3, "cd": 1, "x": 1}


def test_apply_merge_is_greedy_left_to_right(spark):
    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["a", "b", "b"],), (["b", "a", "a", "b"],)],
        "syms array<string>",
    )
    got = [
        list(r.m)
        for r in df.select(apply_merge(F.col("syms"), "a", "a").alias("m"))
        .collect()
    ]
    assert got == [["aa", "a"], ["a", "b", "b"], ["b", "aa", "b"]]


def test_bpe_train_hand_computed_golden(spark):
    # corpus: 'aaab' x3, 'ab' x1 → initial pairs (weighted):
    #   (a,a): 2*3=6   (a,b): 3+1=4   (b,</w>): 3+1=4
    # merge 1 = (a,a). Then 'aaab' → [aa, a, b, </w>]:
    #   (aa,a):3 (a,b):3+1=4 (b,</w>):4 → tie (a,b) vs (b,</w>):
    #   lexicographic → (a,b). merge 2 = (a,b).
    docs = _docs(spark, ["aaab aaab aaab ab"])
    merges = bpe_train(docs, n_merges=2)
    assert merges == [("a", "a"), ("a", "b")]


def test_bpe_train_layout_invariant(spark):
    texts = ["the cat sat", "the cat", "a cathedral the"] * 3
    m1 = bpe_train(_docs(spark, texts), n_merges=5)
    m2 = bpe_train(_docs(spark, texts).repartition(7), n_merges=5)
    assert m1 == m2


def test_bpe_encode_applies_merges_in_rank_order(spark):
    docs = _docs(spark, ["aaab ab"])
    merges = [("a", "a"), ("a", "b")]
    out = bpe_encode(docs, merges).collect()[0]
    # 'aaab' → aa + ab + </w>; 'ab' → ab + </w>
    assert list(out.tokens) == ["aa", "ab", END, "ab", END]
    assert out.n_tokens == 5


def test_bpe_encode_matches_python_reference(spark):
    """The fold-based merge application must equal the index-walking
    greedy loop on a randomized (seeded) corpus with trained merges."""
    import random

    rng = random.Random(11)
    words = ["".join(rng.choice("abcd") for _ in range(rng.randint(1, 7)))
             for _ in range(30)]
    texts = [" ".join(rng.sample(words, 5)) for _ in range(10)]
    docs = _docs(spark, texts)
    merges = bpe_train(docs, n_merges=6)

    def py_apply(syms, a, b):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    def py_encode(text):
        toks = []
        for w in text.lower().split():
            syms = list(w) + [END]
            for a, b in merges:
                syms = py_apply(syms, a, b)
            toks.extend(syms)
        return toks

    got = {r.doc_id: list(r.tokens) for r in bpe_encode(docs, merges).collect()}
    assert got == {i: py_encode(t) for i, t in enumerate(texts)}


def test_bpe_encode_compresses_token_count(spark):
    texts = ["banana bandana banana", "banana banana bandana"]
    docs = _docs(spark, texts)
    merges = bpe_train(docs, n_merges=8)
    enc = bpe_encode(docs, merges)
    base = bpe_encode(docs, [])
    n_merged = enc.agg(F.sum("n_tokens")).first()[0]
    n_chars = base.agg(F.sum("n_tokens")).first()[0]
    assert n_merged < n_chars  # merges strictly shorten a repetitive corpus
