"""RAKE keyword extraction (Rose et al. 2010, "Automatic Keyword
Extraction from Individual Documents") over the documents corpus.

Candidate phrases are maximal runs of non-stopword tokens; each word
scores ``deg(w)/freq(w)`` where ``freq`` counts phrase occurrences
containing w and ``deg`` additionally credits co-occurring phrase
length (``Σ len(phrase)`` over occurrences); a phrase scores the sum
of its word scores.

Exactness: word scores are integral micro-units
``(deg·1e6) DIV freq`` (nonnegative DIV — floor == truncate on both
engines) BEFORE the per-phrase sum, so the phrase score is an integer
and hash-exact; the floor-before-sum is part of the operator's
definition, mirrored by the oracle. Stopword boundaries are cut by a
single ``\\b``-anchored regexp_replace to a ``|`` sentinel — Java
regex and RE2 agree on ASCII word boundaries, and a replace-then-split
cannot leak stopwords into phrases the way an alternation-split can
(consecutive stopwords defeat the interior ``\\s+stop\\s+`` pattern
because each separator match consumes the following space).

Scale shape (the fuzzy_join distinct-grain lesson): word statistics
come from ONE explode pass at (word, occurrence) grain; the per-phrase
score sum runs at DISTINCT-phrase grain (summing over occurrence-grain
rows would multiply scores by the phrase count); the final ranking is
a global top-k via orderBy+limit — Spark plans TakeOrderedAndProject
(map-side partial top-k, no global sort materialization). No
pair-grained work anywhere.

Reference parity: none (the reference has no keyword surface); sibling
of `operators/collocations.py` (PMI) and `tfidf_top_terms`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

# small fixed function-word list matching the synthetic corpus
STOPWORDS = ("a", "the", "and", "of", "to", "in", "is", "on", "for")


def rake_top_phrases(docs: DataFrame, top_n: int = 20) -> DataFrame:
    """Global top-``top_n`` RAKE phrases. Output: phrase, n_occurrences,
    score_u6 (ties broken by phrase text — deterministic)."""
    stop_alt = "|".join(STOPWORDS)
    cut = F.regexp_replace(
        F.lower(F.col("text")), rf"\b(?:{stop_alt})\b", "|"
    )
    phrases = (
        docs.select(F.explode(F.split(cut, r"\|")).alias("_raw"))
        .select(
            F.trim(F.regexp_replace("_raw", r"\s+", " ")).alias("phrase")
        )
        .filter(F.col("phrase") != "")
    )
    # stage the word array ONCE (an inline split referenced inside a
    # lambda re-evaluates per element — the tfidf O(len²) trap)
    occ = phrases.select(
        "phrase", F.split(F.col("phrase"), " ").alias("_words")
    )
    words = occ.select(
        "phrase",
        F.size("_words").alias("_len"),
        F.explode("_words").alias("word"),
    )
    wstats = words.groupBy("word").agg(
        F.count(F.lit(1)).cast("bigint").alias("_freq"),
        F.sum("_len").cast("bigint").alias("_deg"),
    )
    # floor each word score BEFORE the phrase sum (operator definition)
    wscore = wstats.select(
        "word", F.expr("(_deg * 1000000) DIV _freq").alias("_wscore_u6")
    )
    # score = Σ word-instance scores for ONE occurrence of the phrase:
    # aggregate at DISTINCT-phrase grain (duplicate words inside a
    # phrase DO count twice — RAKE sums over word instances)
    dict_words = (
        occ.select("phrase").distinct().select(
            "phrase",
            F.explode(F.split(F.col("phrase"), " ")).alias("word"),
        )
    )
    per_phrase = (
        dict_words.join(wscore, "word")
        .groupBy("phrase")
        .agg(F.sum("_wscore_u6").cast("bigint").alias("score_u6"))
    )
    counts = phrases.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences")
    )
    return (
        per_phrase.join(counts, "phrase")
        .orderBy(F.col("score_u6").desc(), F.col("phrase").asc())
        .limit(top_n)
    )
