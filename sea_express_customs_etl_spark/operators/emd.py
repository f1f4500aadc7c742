"""Per-domain distribution drift by 1-D earth-mover distance (EMD).

Beyond-parity operator (no counterpart in the reference's pandas core
at ``/root/reference``; its nearest surface is the per-key count
aggregation in ``batch_train.py``): the drift dial NEXT TO
``collocations.domain_divergence`` — KL compares token mass on a
shared vocabulary, while EMD (1-D Wasserstein-1; Ramdas et al. 2017)
compares a NUMERIC distribution (here: document length) and keeps
magnitude information KL discards: a source whose documents are all
100 chars longer than the corpus norm has small KL on binned support
but large EMD.

Exactness: for empirical distributions on a shared grid the 1-D EMD
has the closed form  sum_i |F_a(x_i) - F_b(x_i)| * (x_{i+1} - x_i);
with integer counts every term is the exact rational
|cum_a*N_b - cum_b*N_a| * gap / (N_a*N_b) — numerators are summed as
DECIMAL(38,0) (the ols_by_group overflow rule) and the single
positive-operand DIV lands the u6-scaled result. No libm anywhere.

Scale shape: one value-grain partial-agg shuffle (groupBy length),
then everything runs at (|distinct lengths| x |sources|) grain —
bounded by the value domain, never the corpus. The per-source cumsum
window sits on that value-grain frame (the dispersion.py license);
the only broadcasts are the |sources|-row totals and the 1-row corpus
count (model-sized at 100 TB by domain-count, the chi2 license).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

MICRO = 1_000_000


def length_emd_drift(
    docs: DataFrame,
    value_col: str = "n_chars",
    group_col: str = "source",
) -> DataFrame:
    """Per-source EMD between the source's ``value_col`` distribution
    and the whole-corpus distribution. Output: one row per source —
    ``source``, ``n_docs``, ``emd_u6`` (micro-units of ``value_col``).
    """
    per = docs.groupBy(group_col, value_col).agg(
        F.count(F.lit(1)).alias("_c")
    )
    grid = per.groupBy(value_col).agg(F.sum("_c").alias("_cc"))
    totals = per.groupBy(group_col).agg(F.sum("_c").alias("_ns"))
    ncorp = grid.agg(F.sum("_cc").alias("_nc"))

    # value-grain x |sources| lattice; zero-fill sources absent at a
    # length, then per-source cumulative counts up the shared grid.
    lattice = (
        grid.crossJoin(F.broadcast(totals))
        .join(per, [group_col, value_col], "left")
        .withColumn("_c", F.coalesce(F.col("_c"), F.lit(0)))
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wl = Window.partitionBy(group_col).orderBy(value_col)
    stepped = (
        lattice.withColumn("_cum_s", F.sum("_c").over(w))
        .withColumn("_cum_c", F.sum("_cc").over(w))
        .withColumn("_gap", F.lead(value_col).over(wl) - F.col(value_col))
        .crossJoin(F.broadcast(ncorp))
    )
    dec = "decimal(38,0)"
    num = F.abs(
        F.col("_cum_s").cast(dec) * F.col("_nc").cast(dec)
        - F.col("_cum_c").cast(dec) * F.col("_ns").cast(dec)
    ) * F.col("_gap").cast(dec)
    summed = (
        stepped.filter(F.col("_gap").isNotNull())
        .withColumn("_num", num)
        .groupBy(group_col, "_ns", "_nc")
        .agg(F.sum("_num").alias("_numsum"))
    )
    emd = F.expr(
        f"CAST((_numsum * {MICRO}) DIV"
        " (CAST(_ns AS decimal(38,0)) * CAST(_nc AS decimal(38,0)))"
        " AS BIGINT)"
    )
    return summed.select(
        F.col(group_col),
        F.col("_ns").cast("bigint").alias("n_docs"),
        emd.alias("emd_u6"),
    )
