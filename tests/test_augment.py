"""Unit tests for operators/augment.py (deterministic word dropout)."""

from __future__ import annotations


def test_word_dropout_deterministic_and_salted(spark):
    from sea_express_customs_etl_spark.operators.augment import word_dropout

    rows = [(i, " ".join(f"w{j}" for j in range(50))) for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = sorted(map(tuple, word_dropout(df).collect()))
    b = sorted(map(tuple, word_dropout(df.repartition(5)).collect()))
    assert a == b  # partitioning-independent corruption
    # kept tokens preserve original order and are a subsequence
    for doc_id, n_tokens, n_kept, aug in a:
        toks = aug.split() if aug else []
        assert n_tokens == 50 and n_kept == len(toks)
        idx = [int(t[1:]) for t in toks]
        assert idx == sorted(idx)
    # aggregate drop rate near 15%
    total = sum(r[1] for r in a)
    kept = sum(r[2] for r in a)
    assert 0.78 < kept / total < 0.92
    # a different salt corrupts differently (epoch re-augmentation)
    c = sorted(map(tuple, word_dropout(df, salt="ep2").collect()))
    assert c != a


def test_word_dropout_empty_and_tiny_docs(spark):
    from sea_express_customs_etl_spark.operators.augment import word_dropout

    df = spark.createDataFrame([(1, "solo"), (2, "a b")], ["doc_id", "text"])
    got = {r.doc_id: (r.n_tokens, r.n_kept) for r in word_dropout(df).collect()}
    assert got[1][0] == 1 and got[2][0] == 2
    assert all(0 <= k <= n for n, k in got.values())


def test_span_corruption_reconstructs_and_merges_spans(spark):
    """Losslessness: splicing each sentinel's target tokens back into
    the input reproduces the original text exactly; consecutive masked
    tokens share ONE sentinel; salt changes the corruption."""
    from sea_express_customs_etl_spark.operators.augment import (
        span_corruption,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(40))) for i in range(20)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in span_corruption(docs, 0.3).collect()}
    texts = {i: " ".join(f"w{i}x{j}" for j in range(40)) for i in range(20)}
    saw_multi = False
    for i, r in rows.items():
        # parse target into {sentinel: tokens}
        fills, cur = {}, None
        for tok in r.target_text.split():
            if tok.startswith("<extra_id_"):
                cur = tok
                fills[cur] = []
            else:
                fills[cur].append(tok)
        out = []
        for tok in r.input_text.split():
            if tok.startswith("<extra_id_"):
                out.extend(fills[tok])
            else:
                out.append(tok)
        assert " ".join(out) == texts[i]
        assert r.n_spans == len(fills) and r.n_masked == sum(
            len(v) for v in fills.values()
        )
        saw_multi = saw_multi or any(len(v) > 1 for v in fills.values())
    assert saw_multi  # adjacent masks really merge into one span
    other = {
        r.doc_id: r.input_text
        for r in span_corruption(docs, 0.3, salt="epoch2").collect()
    }
    assert any(other[i] != rows[i].input_text for i in rows)
