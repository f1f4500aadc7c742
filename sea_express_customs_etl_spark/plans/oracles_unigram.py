"""DuckDB oracle for the unigram-LM vocabulary trainer
(``operators/unigram.py``) — the full training TRAJECTORY unrolled:
substring seed counts, per-round Viterbi DP (positions unrolled into
chained CTEs, the perceptron-epoch discipline), usage re-scores, and
the keep-characters prune, all in exact integers and byte-comparable
ASCII cost strings. Nothing is replayed as literals; every round's
winners flow through CTE joins.

Cost-string encoding (must stay byte-identical to the Spark fold):
``lpad(n_pieces, 2, '0') || lpad(CAP − Σscore, 12, '0') || seg`` with
``seg`` the ' '-prefixed piece sequence. ``generate_series`` uses
constant bounds + a length filter (this DuckDB rejects LATERAL column
bounds — the skipgram-oracle rule).
"""

from __future__ import annotations

from sea_express_customs_etl_spark.operators.unigram import (
    CAP,
    MAX_PIECE_LEN,
    MAX_WORD_LEN,
)

_ZERO = "00" + str(CAP)

_WF = rf"""
wf AS MATERIALIZED (
  SELECT w AS word, count(*)::BIGINT AS freq FROM (
    SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
    FROM documents)
  WHERE w <> '' AND length(w) <= {MAX_WORD_LEN} GROUP BY 1),
seed AS MATERIALIZED (
  SELECT substring(word, s.i, k.k) AS piece,
         CAST(sum(freq) AS BIGINT) AS score
  FROM wf, generate_series(1, {MAX_WORD_LEN}) s(i),
       generate_series(1, {MAX_PIECE_LEN}) k(k)
  WHERE s.i + k.k - 1 <= length(word)
  GROUP BY 1),
chars AS (SELECT piece FROM seed WHERE length(piece) = 1),
v0 AS (SELECT piece, score FROM seed)"""


def _round(r: int) -> str:
    """CTEs for one train round against v{r-1}: candidate table,
    unrolled DP positions b{r}_j, final costs, usage scores, pruned
    next vocabulary v{r}."""
    p = r - 1
    parts = [
        f"""
c{r} AS MATERIALIZED (
  SELECT w.word, (s.i + k.k - 1) * 8 + k.k AS key, v.piece, v.score
  FROM wf w, generate_series(1, {MAX_WORD_LEN}) s(i),
       generate_series(1, {MAX_PIECE_LEN}) k(k)
  JOIN v{p} v ON v.piece = substring(w.word, s.i, k.k)
  WHERE s.i + k.k - 1 <= length(w.word)),
b{r}_0 AS MATERIALIZED (SELECT word, '{_ZERO}' AS c FROM wf)"""
    ]
    for j in range(1, MAX_WORD_LEN + 1):
        branches = []
        for k in range(1, min(MAX_PIECE_LEN, j) + 1):
            branches.append(
                f"""
    SELECT p.word,
           lpad(CAST(CAST(substring(p.c, 1, 2) AS INTEGER) + 1 AS VARCHAR),
                2, '0') ||
           lpad(CAST(CAST(substring(p.c, 3, 12) AS BIGINT) - cc.score
                     AS VARCHAR), 12, '0') ||
           substring(p.c, 15) || ' ' || cc.piece AS cost
    FROM b{r}_{j - k} p
    JOIN c{r} cc ON cc.word = p.word AND cc.key = {j * 8 + k}"""
            )
        union = "\n    UNION ALL".join(branches)
        parts.append(
            f"""
b{r}_{j} AS MATERIALIZED (
  SELECT word, min(cost) AS c FROM ({union}
  ) GROUP BY word)"""
        )
    alljs = "\n    UNION ALL ".join(
        f"SELECT word, {j} AS j, c FROM b{r}_{j}"
        for j in range(1, MAX_WORD_LEN + 1)
    )
    parts.append(
        f"""
fin{r} AS MATERIALIZED (
  SELECT w.word, w.freq, b.c
  FROM wf w JOIN ({alljs}) b
    ON b.word = w.word AND b.j = length(w.word)),
u{r} AS MATERIALIZED (
  SELECT piece, CAST(sum(freq) AS BIGINT) AS score FROM (
    SELECT f.freq,
           unnest(regexp_split_to_array(substring(f.c, 15), ' ')) AS piece
    FROM fin{r} f)
  WHERE piece <> '' GROUP BY 1),
v{r} AS MATERIALIZED (
  SELECT piece, score FROM u{r}
  UNION ALL
  SELECT c.piece, CAST(0 AS BIGINT) FROM chars c
  WHERE c.piece NOT IN (SELECT piece FROM u{r}))"""
    )
    return ",".join(parts)


def unigram_vocab_sql(rounds: int = 2) -> str:
    body = ",".join(_round(r) for r in range(1, rounds + 1))
    return (
        "WITH "
        + _WF
        + ","
        + body
        + f"\nSELECT piece, score FROM v{rounds}\n"
    )


UNIGRAM_LM_VOCAB_SQL = unigram_vocab_sql(2)


def unigram_token_counts_sql(rounds: int = 2) -> str:
    """Apply side: one more unrolled segmentation pass (round
    ``rounds+1``) against the trained v{rounds}, whose cost string's
    leading 2 digits ARE the per-word piece count; document token
    counts are occurrence-weighted sums of that."""
    r = rounds + 1
    body = ",".join(_round(x) for x in range(1, r + 1))
    return (
        "WITH "
        + _WF
        + ","
        + body
        + rf""",
occ AS (
  SELECT doc_id, w AS word, count(*)::BIGINT AS n FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
    FROM documents)
  WHERE w <> '' AND length(w) <= {MAX_WORD_LEN} GROUP BY 1, 2),
np AS (
  SELECT word,
         CAST(CAST(substring(c, 1, 2) AS INTEGER) AS BIGINT) AS np
  FROM fin{r})
SELECT o.doc_id, CAST(sum(o.n) AS BIGINT) AS n_words,
       CAST(sum(o.n * np.np) AS BIGINT) AS n_tokens
FROM occ o JOIN np USING (word) GROUP BY 1
"""
    )


UNIGRAM_TOKEN_COUNTS_SQL = unigram_token_counts_sql(2)

# fertility by (lang, source) slice: the apply statement rolled up —
# train, apply, and report in one hash (integer ppm DIV).
TOKENIZER_FERTILITY_SQL = f"""
SELECT d.lang, d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(t.n_words) AS BIGINT) AS n_words,
       CAST(sum(t.n_tokens) AS BIGINT) AS n_tokens,
       CAST((1000000 * sum(t.n_tokens)) // sum(t.n_words) AS BIGINT)
           AS fertility_ppm
FROM ({unigram_token_counts_sql(2)}) t
JOIN documents d USING (doc_id)
GROUP BY 1, 2
"""
