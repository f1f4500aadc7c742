"""Exact set-similarity join via prefix filtering (PPJoin family —
Xiao, Wang, Lin, Yu, WWW 2008): ALL pairs with token-set Jaccard ≥ t,
found without the all-pairs product and without LSH's missed-pair
risk. The MinHash/SimHash members of the dedup family are recall<1
by construction; this is the EXACT-threshold member — the one a
compliance-grade dedup run finishes with.

The filter: order every document's tokens by GLOBAL rarity (frequency
ascending — rarest first, the order that makes prefixes selective);
a document with s tokens keeps a prefix of the first
``s − ⌈t·s⌉ + 1`` tokens. If J(A,B) ≥ t, the globally-smallest
common token provably lies within BOTH prefixes (its predecessors in
either set are all non-shared, and non-shared tokens number at most
``s − ⌈t·s⌉``), so joining prefix⋈prefix loses nothing; everything
else is pruned BEFORE the pair ever exists. Survivors are verified
with exact intersection counts, and the threshold test is the exact
integer cross-multiplication ``8·inter ≥ 3·(s_a + s_b)`` (t = 3/5) —
no float Jaccard anywhere.

Repeated-value rule: pairs form at DISTINCT-TEXT grain (md5-grouped,
min-id representative — the fuzzy_join lesson), so exact duplicates
cost one representative each instead of a quadratic clique.

Density caveat (measured): when the corpus is one dense near-dup
family, the RESULT SET is quadratic no matter the algorithm (the
synthetic testdata has J ≥ 0.6 for ~57% of all distinct-text pairs —
7.1M pairs at sf0.1), and the verify join's pair×token fan-out
dominates. The production order of operations is exact-dedup /
cluster-collapse FIRST (``dedup_clusters``), then the exact join on
representatives — the checked query models this by running per
source slice.

Scale shape: one vocab-grain frequency aggregate, one per-doc bounded
window (tokens within one document) to rank the set, the prefix⋈
prefix equi-join on the token (selective by construction — prefixes
are the RARE tokens), and a verify join at candidate grain. At 100 TB
the dial is the global frequency order itself: hot tokens land in no
prefix, so the candidate join never sees the head of the Zipf curve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

from ..plans.cache import tracked_persist


def prefix_jaccard_join(
    docs: DataFrame,
    threshold_num: int = 3,
    threshold_den: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """All distinct-text pairs with Jaccard ≥ threshold_num/den over
    whitespace token sets. Output: id_a, id_b (representative ids,
    a < b), n_inter, n_union, jac_ppm."""
    tn, td = int(threshold_num), int(threshold_den)
    reps = docs.groupBy(F.col(text_col).alias("_text")).agg(
        F.min(id_col).alias("_id")
    )
    toks = tracked_persist(
        reps.select(
            "_id",
            F.explode(F.split(F.trim(F.col("_text")), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .distinct()
    )  # three scans: vocab freq, prefix build, verify join (both sides)
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("_f"))
    wdoc = Window.partitionBy("_id").orderBy(F.asc("_f"), F.asc("tok"))
    ranked = (
        toks.join(freq, "tok")
        .withColumn("_pos", F.row_number().over(wdoc))
        .withColumn(
            "_s", F.count(F.lit(1)).over(Window.partitionBy("_id"))
        )
    )
    # prefix length = s - ceil(t·s) + 1;  ceil(a·s/b) = (a·s + b - 1) DIV b
    prefix = ranked.filter(
        F.col("_pos")
        <= F.col("_s") - F.expr(f"({tn} * _s + {td} - 1) DIV {td}") + 1
    ).select("_id", "tok")
    cand = (
        prefix.select(F.col("_id").alias("_a"), "tok")
        .join(prefix.select(F.col("_id").alias("_b"), "tok"), "tok")
        .filter(F.col("_a") < F.col("_b"))
        .select("_a", "_b")
        .distinct()
    )
    sizes = toks.groupBy("_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n")
    )
    inter = (
        cand.join(toks.select(F.col("_id").alias("_a"), "tok"), "_a")
        .join(toks.select(F.col("_id").alias("_b"), "tok"), ["_b", "tok"])
        .groupBy("_a", "_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_inter"))
    )
    out = (
        inter.join(sizes.select(F.col("_id").alias("_a"), F.col("_n").alias("_na")), "_a")
        .join(sizes.select(F.col("_id").alias("_b"), F.col("_n").alias("_nb")), "_b")
        .filter(
            (td + tn) * F.col("n_inter") >= tn * (F.col("_na") + F.col("_nb"))
        )
        .select(
            F.col("_a").alias("id_a"),
            F.col("_b").alias("id_b"),
            "n_inter",
            (F.col("_na") + F.col("_nb") - F.col("n_inter"))
            .cast("bigint")
            .alias("n_union"),
            F.expr("(1000000 * n_inter) DIV (_na + _nb - n_inter)")
            .cast("bigint")
            .alias("jac_ppm"),
        )
    )
    return out
