"""Hand-computed goldens for the corpus-dispersion wave
(operators/dispersion.py + operators/lm.py:perplexity_gain): token
entropy, Church-Gale burstiness, the Zipf slope, and the Moore-Lewis
contrastive selection. Every assertion is exact-integer (the values
are small enough to compute by hand / with one float check)."""

import math

import pytest

from sea_express_customs_etl_spark.operators.dispersion import (
    token_entropy,
    token_burstiness,
    zipf_alpha,
)
from sea_express_customs_etl_spark.operators.lm import (
    lm_score,
    perplexity_gain,
    trigram_backoff_score,
)


def _r(x: float) -> int:
    return int(round(math.log(x) * 1_000_000))


def test_token_entropy_hand_case(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, ""), (3, "z z z z")],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r for r in token_entropy(df).collect()}
    # doc 1: n=3, counts {a:2, b:1}; H = ln3 - (2/3)ln2
    # u6: (3*r(3) - 2*r(2)) div 3 = (3295836 - 1386294) // 3 = 636514
    assert rows[1].n_tokens == 3
    assert rows[1].n_distinct == 2
    assert rows[1].entropy_u6 == (3 * _r(3) - 2 * _r(2)) // 3 == 636514
    # empty doc keeps an auditable zero row
    assert (rows[2].n_tokens, rows[2].n_distinct, rows[2].entropy_u6) == (
        0,
        0,
        0,
    )
    # single repeated token: zero entropy exactly (numerator cancels)
    assert rows[3].entropy_u6 == 0


def test_token_burstiness_poisson_vs_burst(spark):
    # N=3 docs. 'x' counts (2,1,0): mean 1, var 1 -> VMR exactly 1.
    # 'y' counts (0,0,1): mean 1/3, var 1/3 -> VMR exactly 1.
    # 'b' counts (0,0,4): T=4, Q=16, (3*16-16)*1e6 // (2*4) = 4e6.
    df = spark.createDataFrame(
        [(1, "x x"), (2, "x"), (3, "y b b b b")],
        "doc_id int, text string",
    )
    rows = {r.token: r for r in token_burstiness(df).collect()}
    assert rows["x"].doc_freq == 2 and rows["x"].total_tf == 3
    assert rows["x"].vmr_u6 == 1_000_000
    assert rows["y"].vmr_u6 == 1_000_000
    assert rows["b"].vmr_u6 == 4_000_000  # bursty: all mass in one doc


def test_zipf_alpha_matches_float_ols(spark):
    # counts 4/2/1 at ranks 1/2/3 (ties impossible); compare the
    # integer-moment slope against numpy-free float OLS to +-2 u6
    # (the only rounding is the four ln calls, shared by both paths).
    df = spark.createDataFrame(
        [(1, "a a a a b b c")], "doc_id int, text string"
    )
    row = zipf_alpha(df, top_r=500).collect()[0]
    assert row.n_ranks == 3
    xs = [_r(1), _r(2), _r(3)]
    ys = [_r(4), _r(2), _r(1)]
    n = 3
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    expect = (sx * sy - n * sxy) * 1_000_000 // (n * sxx - sx * sx)
    assert row.alpha_u6 == expect
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert abs(row.alpha_u6 - round(-slope * 1_000_000)) <= 2


def test_zipf_alpha_near_one_on_true_zipf(spark):
    # an exactly-Zipfian corpus (count ~ 60/rank) must fit alpha ~= 1
    words = []
    for rank, tok in enumerate("abcdef", start=1):
        words += [tok] * (60 // rank)
    df = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id int, text string"
    )
    row = zipf_alpha(df).collect()[0]
    assert row.n_ranks == 6
    assert 900_000 <= row.alpha_u6 <= 1_100_000


def test_perplexity_gain_is_the_joined_difference(spark):
    # composition correctness: gain rows == the join of the two
    # published scorers with negate-first integer DIVs, ordered by
    # (gain DESC, doc_id) and capped at top_k
    data = [
        (0, "the cat sat on the mat"),
        (1, "the cat sat on the mat"),
        (2, "dogs chase the red ball today"),
        (3, "the cat ran on the mat"),
        (4, "a b"),
        (5, "x"),  # 0 bigrams under no model -> excluded? (1 word)
    ]
    df = spark.createDataFrame(data, "doc_id int, text string")
    got = perplexity_gain(df, top_k=2).collect()
    bi = {r.doc_id: r for r in lm_score(df).collect()}
    tr = {
        r.doc_id: r
        for r in trigram_backoff_score(
            df.filter("doc_id % 2 = 0"), df.filter("doc_id % 2 = 1")
        ).collect()
    }
    expect = []
    for d in tr:
        if bi[d].n_bigrams > 0 and tr[d].n_trigrams > 0:
            mb = (-bi[d].logprob_u6) // bi[d].n_bigrams
            mt = (-tr[d].score_u6) // tr[d].n_trigrams
            expect.append((d, mb - mt))
    expect.sort(key=lambda t: (-t[1], t[0]))
    assert [(r.doc_id, r.gain_u6) for r in got] == expect[:2]
    # only odd docs are scored, and the 1-word doc is excluded
    assert all(r.doc_id % 2 == 1 for r in got)
