"""Cross-source score calibration + preference-pair construction —
the two steps between a raw per-document quality score and its
training-time uses (mixing, filtering, reward modeling). Extends the
reference's normalize-then-compare discipline (header/key
normalization before linking, src/import_xml_history.py:101-117) from
identifiers to score DISTRIBUTIONS.

``quantile_normalize``: per-source scores are mutually incomparable
(a web-scrape source's LM perplexity runs lower than a forum dump's
for reasons that have nothing to do with quality), so a global
threshold over-filters some sources and under-filters others. The
classical fix is quantile normalization (Bolstad et al. 2003 —
microarray normalization; the same rank-matching used to calibrate
quality scores across dumps): replace each score by the GLOBAL score
at the same quantile. Exact integer semantics: with per-source rank r
of n_s and N total rows, the target global rank is ⌈r·N/n_s⌉ =
(r·N + n_s − 1) DIV n_s and the normalized value is the global score
at that rank — rank arithmetic only, no float quantile estimate, so
the mapping is hash-exact and two sources' normalized distributions
are equal by construction.

``preference_pairs``: per-group (chosen, rejected) extraction for
reward-model / DPO-style training data — the best and worst scored
document of each group under a TOTAL order (score, then id), emitted
with the score margin. Both picks keep the row_number-then-filter
shape so Spark rewrites them to WindowGroupLimit (map-side partial
top-1 — the repo's pinned top-k discipline).

Scale: quantile_normalize is two window passes (one per-source —
partition-parallel — plus the two-phase ``global_rank``) and one
corpus-sized equi-join on the target rank; preference_pairs is two
WindowGroupLimit passes and a |groups|-row join. No collects, no
broadcasts of corpus-growing frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

from .ranking import global_rank


def quantile_normalize(
    scored: DataFrame,
    group_col: str = "source",
    score_col: str = "score",
    id_col: str = "doc_id",
) -> DataFrame:
    """Map each row's score to the global score at its within-group
    quantile. Output: id_col, group_col, score_col, src_rank,
    norm_<score_col> (bigint)."""
    by_src = Window.partitionBy(group_col).orderBy(
        F.col(score_col).asc(), F.col(id_col).asc()
    )
    local = scored.select(id_col, group_col, score_col).withColumn(
        "src_rank", F.row_number().over(by_src).cast("bigint")
    ).withColumn(
        "_n_s",
        F.count(F.lit(1))
        .over(Window.partitionBy(group_col))
        .cast("bigint"),
    )
    ranked = global_rank(
        scored.select(id_col, score_col),
        [F.col(score_col).asc(), F.col(id_col).asc()],
        rank_col="_g",
    )
    lookup = ranked.select(
        F.col("_g").alias("_target"),
        F.col(score_col).alias(f"norm_{score_col}"),
    )
    n_total = ranked.agg(F.count(F.lit(1)).cast("bigint").alias("_N"))
    return (
        local.crossJoin(F.broadcast(n_total))
        .withColumn(
            "_target",
            F.expr("(src_rank * _N + _n_s - 1) DIV _n_s"),
        )
        .join(lookup, "_target")
        .select(
            id_col, group_col, score_col, "src_rank", f"norm_{score_col}"
        )
    )


def preference_pairs(
    scored: DataFrame,
    group_col: str = "source",
    score_col: str = "score",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group (chosen, rejected) = (argmax, argmin) of score under
    the total order (score, id ASC on ties — the repo's deterministic
    tie-break). Groups with a single row are dropped (no pair).
    Output: group_col, chosen_id, rejected_id, chosen_<score>,
    rejected_<score>, margin."""
    best_w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    worst_w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).asc(), F.col(id_col).asc()
    )
    base = scored.select(group_col, id_col, score_col)
    best = (
        base.withColumn("_rn", F.row_number().over(best_w))
        .filter(F.col("_rn") == 1)
        .select(
            group_col,
            F.col(id_col).alias("chosen_id"),
            F.col(score_col).alias(f"chosen_{score_col}"),
        )
    )
    worst = (
        base.withColumn("_rn", F.row_number().over(worst_w))
        .filter(F.col("_rn") == 1)
        .select(
            group_col,
            F.col(id_col).alias("rejected_id"),
            F.col(score_col).alias(f"rejected_{score_col}"),
        )
    )
    return (
        best.join(worst, group_col)
        .filter(F.col("chosen_id") != F.col("rejected_id"))
        .withColumn(
            "margin",
            (
                F.col(f"chosen_{score_col}")
                - F.col(f"rejected_{score_col}")
            ).cast("bigint"),
        )
    )
