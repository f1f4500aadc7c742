"""Per-document memorization / novelty scoring — the eval-leakage
quantifier: split the corpus into a train and an eval half (md5 hash
split — replayable), and score every EVAL document by how many of its
word n-gram shingles already occur anywhere in TRAIN. ``novelty_ppm``
near 0 means the document is recoverable from training data (the
Carlini-style memorization risk / benchmark-contamination signal);
``decontaminate`` (operators/hygiene.py) is the binary filter form of
the same idea — this is the measurement form a data card reports.

Scale shape: the train side collapses to a DISTINCT shingle
dictionary before the join (Heaps-law sublinear in corpus size); the
eval side joins at distinct (doc, shingle) grain with a left join —
one shuffle each side, partial-aggregated per-doc rollup after. The
repeated-value rule applies: nothing pair-grained ever forms.

Beyond reference parity: the reference has no leakage tooling; this
completes the hygiene family (decontaminate / redact / line_dedup)
with the scoring member.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from .dedup import shingles
from .sampling import hash_split


def memorization_scores(
    docs: DataFrame,
    n: int = 3,
    train_frac: float = 0.7,
    salt: str = "memo",
    id_col: str = "doc_id",
) -> DataFrame:
    """Novelty of each eval-split document against the train-split
    shingle dictionary. Output: doc_id, n_shingles, n_seen,
    novelty_ppm = 10⁶·(n_shingles − n_seen) DIV n_shingles. Docs with
    fewer than ``n`` words emit no shingles and are absent (novelty
    undefined), as in the MinHash family."""
    split = hash_split(
        docs,
        {"train": train_frac, "eval": 1.0 - train_frac},
        key_col=id_col,
        salt=salt,
        split_col="_split",
    )
    train_sh = (
        shingles(split.filter(F.col("_split") == "train"), n=n)
        .select("shingle")
        .distinct()
        .withColumn("_seen", F.lit(1))
    )
    ev_sh = shingles(split.filter(F.col("_split") == "eval"), n=n)
    marked = ev_sh.join(train_sh, "shingle", "left")
    return (
        marked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.coalesce(F.sum("_seen"), F.lit(0))
            .cast("bigint")
            .alias("n_seen"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_seen",
            F.expr("(1000000 * (n_shingles - n_seen)) DIV n_shingles")
            .cast("bigint")
            .alias("novelty_ppm"),
        )
    )
