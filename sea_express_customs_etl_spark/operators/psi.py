"""Population Stability Index (PSI) drift between two snapshots of a
numeric column.

Beyond-parity operator (no counterpart in the reference's pandas core
at ``/root/reference``; nearest surface: the per-key count tables in
``batch_train.py``): the third drift dial next to
``collocations.domain_divergence`` (KL on token mass) and
``emd.length_emd_drift`` (Wasserstein-1 on a value grid) — PSI is the
model-monitoring industry's standard score,

    PSI = sum_i (p_i - q_i) * ln(p_i / q_i),

over REFERENCE-decile buckets (Karakoulas 2004 credit-scoring
convention: <0.1 stable, 0.1-0.25 drifting, >0.25 shifted).

Spec (engine-portable, integer-exact):
- decile edges from the reference population's exact rank deciles
  (two-phase ``global_rank`` + ``ntile_by_rank`` — no corpus-sized
  single-partition window); edge_k = max value of reference bucket k.
- BOTH populations bucket by the same rule 1 + #{edges < v} (ties
  collapse consistently; value-identical rows land together).
- Laplace +1 on every bucket count (both sides, so empty buckets
  neither blow up the log nor divide by zero), totals shifted by the
  bucket count accordingly.
- per-bucket term exactly: with a = cp'*Nq' - cq'*Np' and
  rdiff = r(cp'*Nq') - r(cq'*Np'), r(x) = round(ln(x)*1e6) (the
  token_entropy single-libm license; ln monotone => a and rdiff never
  have opposite signs), term_u6 = (a * rdiff) DIV (Np' * Nq') — the
  products lifted to DECIMAL(38,0) (ols rule), the DIV positive.

Scale shape: one rank shuffle over the reference, one partial-agg
count per population at bucket grain; the 9-row edge list and the
1-row totals are the only broadcasts (model-sized license). The edge
list crosses the driver (model-sized artifact license) — the oracle
threads the same edges through CTEs, never literals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from .ranking import global_rank, ntile_by_rank

MICRO = 1_000_000


def value_psi_drift(
    df: DataFrame,
    value_col: Column,
    is_current: Column,
    key_col: str,
    buckets: int = 10,
) -> DataFrame:
    """Output (``buckets`` rows): ``bucket``, ``ref_n``, ``cur_n``
    (pre-Laplace counts), ``term_u6`` (the bucket's exact PSI
    contribution in micro-nats). Sum ``term_u6`` for the headline
    PSI."""
    spark = df.sparkSession
    base = df.select(
        is_current.cast("boolean").alias("_cur"),
        value_col.cast("bigint").alias("_y"),
        F.col(key_col).alias("_k"),
    )
    ref = base.filter(~F.col("_cur"))
    ranked = global_rank(
        ref, [F.col("_y").asc(), F.col("_k").asc()], rank_col="_gr"
    )
    edges_rows = (
        ntile_by_rank(ranked, buckets, "_gr")
        .filter(F.col("bucket") < buckets)
        .groupBy("bucket")
        .agg(F.max("_y").alias("_e"))
        .collect()
    )  # buckets-1 rows — the model-sized artifact license
    edges = sorted(r._e for r in edges_rows)
    bucket = F.lit(1)
    for e in edges:
        bucket = bucket + (F.col("_y") > F.lit(e)).cast("int")
    counted = (
        base.withColumn("_b", bucket)
        .groupBy("_b")
        .agg(
            F.sum((~F.col("_cur")).cast("bigint")).alias("_rp"),
            F.sum(F.col("_cur").cast("bigint")).alias("_rq"),
        )
    )
    spine = spark.range(1, buckets + 1).select(
        F.col("id").cast("int").alias("_b")
    )
    filled = spine.join(counted, "_b", "left").select(
        "_b",
        F.coalesce("_rp", F.lit(0)).alias("ref_n"),
        F.coalesce("_rq", F.lit(0)).alias("cur_n"),
    )
    totals = filled.agg(
        (F.sum("ref_n") + F.lit(buckets)).alias("_np1"),
        (F.sum("cur_n") + F.lit(buckets)).alias("_nq1"),
    )
    dec = "decimal(38,0)"
    r_p = F.round(
        F.log(((F.col("ref_n") + 1) * F.col("_nq1")).cast("double"))
        * MICRO
    ).cast("bigint")
    r_q = F.round(
        F.log(((F.col("cur_n") + 1) * F.col("_np1")).cast("double"))
        * MICRO
    ).cast("bigint")
    a = (F.col("ref_n") + 1).cast(dec) * F.col("_nq1").cast(dec) - (
        F.col("cur_n") + 1
    ).cast(dec) * F.col("_np1").cast(dec)
    term = F.expr(
        "CAST((_a * _rdiff) DIV"
        " (CAST(_np1 AS decimal(38,0)) * CAST(_nq1 AS decimal(38,0)))"
        " AS BIGINT)"
    )
    return (
        filled.crossJoin(F.broadcast(totals))
        .withColumn("_a", a)
        .withColumn("_rdiff", (r_p - r_q).cast(dec))
        .select(
            F.col("_b").alias("bucket"),
            F.col("ref_n").cast("bigint").alias("ref_n"),
            F.col("cur_n").cast("bigint").alias("cur_n"),
            term.alias("term_u6"),
        )
    )
