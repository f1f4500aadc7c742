"""Privacy-governance audits for training-data release: k-anonymity
and l-diversity over a quasi-identifier projection.

Beyond-parity operators (no counterpart in the reference's pandas core
at ``/root/reference`` — its nearest surface is the per-key count
aggregation in ``batch_train.py``): before a curated corpus or a
derived table leaves the pipeline, release review asks (a) how many
records sit in quasi-identifier equivalence classes smaller than k
(re-identifiable by linkage — Sweeney 2002, "k-anonymity"), and
(b) whether any class is sensitive-attribute-homogeneous
(Machanavajjhala et al. 2007, "l-diversity"). Both are pure
aggregation audits — no suppression/generalization is applied here;
the output is the release-gate evidence.

Oracle stability: the only double touched is the banding input, scaled
to cents with the established ``round(x*100)::BIGINT`` parity pattern
(relational_ext.py:101) BEFORE any arithmetic; the band index shifts
the cents non-negative before integer DIV (the negative-numerator
convention rule in CLAUDE.md). Everything downstream is integer
counts — aggregation-order-exact.

Scale shape: one class-grain partial-agg shuffle (groupBy QI) with an
exact distinct-count of the sensitive attribute (two-phase partial
aggregate), then a second aggregation over the CLASS-grain frame —
bounded by the QI domain product (|nations| x |bands|), never by the
corpus. No windows, no joins, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

# $1,000 account-balance bands; TPC-H acctbal spans [-999.99, 9999.99],
# so a +100,000-cent shift makes every banding numerator non-negative.
BAND_CENTS = 100_000
SHIFT_CENTS = 100_000


def k_anonymity_audit(
    customer: DataFrame,
    k: int = 5,
    l_min: int = 3,
) -> DataFrame:
    """One-row release audit of the (nation, $1k-balance-band)
    quasi-identifier against sensitive attribute ``c_mktsegment``:

    - ``n_classes`` / ``n_rows`` — equivalence classes and records;
    - ``k_min`` — the smallest class (the table is k_min-anonymous);
    - ``classes_below_k`` / ``rows_below_k`` — suppression workload
      if released at anonymity level ``k``;
    - ``l_min_div`` — the least-diverse class's distinct sensitive
      count (the table is l_min_div-diverse);
    - ``classes_below_l`` — classes failing distinct-l-diversity
      at level ``l_min``.
    """
    qi = customer.select(
        F.col("c_nationkey").alias("qi_nation"),
        # Integer DIV (never float divide-then-truncate) on a
        # shifted-positive numerator: exact and convention-safe.
        F.expr(
            "(CAST(round(c_acctbal * 100) AS BIGINT)"
            f" + {SHIFT_CENTS}) DIV {BAND_CENTS}"
        ).alias("qi_band"),
        F.col("c_mktsegment").alias("sensitive"),
    )
    classes = qi.groupBy("qi_nation", "qi_band").agg(
        F.count(F.lit(1)).alias("_sz"),
        F.countDistinct("sensitive").alias("_ldiv"),
    )
    below = F.col("_sz") < F.lit(k)
    return classes.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("_sz").cast("bigint").alias("n_rows"),
        F.min("_sz").cast("bigint").alias("k_min"),
        F.sum(below.cast("bigint")).alias("classes_below_k"),
        F.sum(F.when(below, F.col("_sz")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("rows_below_k"),
        F.min("_ldiv").cast("bigint").alias("l_min_div"),
        F.sum((F.col("_ldiv") < F.lit(l_min)).cast("bigint")).alias(
            "classes_below_l"
        ),
    )
