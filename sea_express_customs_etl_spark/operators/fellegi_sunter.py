"""Fellegi–Sunter probabilistic record linkage, EM-trained (Fellegi &
Sunter JASA 1969; Winkler 1988 for the EM fit) — the LEARNED linker
beside the repo's deterministic link-key machinery, and the
probabilistic generalization of the reference's record-matching core
(the exact key-equality linking of reference
``src/batch_train.py:84-87``, which OP-JOIN-KEY re-expresses —
Fellegi–Sunter is what that exact-match rule becomes when fields
disagree noisily): candidate pairs carry a binary comparison vector
γ, and EM fits per-feature match/unmatch rates m_f, u_f plus the
match prevalence p, entirely unsupervised.

Exactness protocol (the kmeans/bpe trajectory discipline): all
parameters live as CLAMPED u6 integers in [1, 999999]; each round's
per-pair posterior is ONE rational

    w = (p·Π_f t_f) · 10⁶ DIV ( p·Π_f t_f + (10⁶−p)·Π_f s_f )

with t_f = m_f or 10⁶−m_f and s_f = u_f or 10⁶−u_f by γ_f — five
u6 factors ≈ 10³⁰, ·10⁶ ≈ 10³⁶, inside DECIMAL(38,0)/HUGEINT — and
the M-step divides u6-scaled weighted sums with plain DIVs (every
numerator non-negative). The driver collects ONE 10-value row per
round (the model — kmeans license); the ORACLE re-derives every
round through chained MATERIALIZED CTEs, so the gate hashes the full
trajectory.

Blocking: within p_brand at row grain (25 blocks) — candidate volume
is Σ C(block,2); the production dial is a finer key (brand × size
band) exactly as the fuzzy/LSH family documents. γ features: size
equality, type equality, name-first-word equality, retail-price
10-unit-band equality.

Scale shape: one blocked self-join to build γ (persisted — each EM
round re-reads it), then per round ONE partial-agg over the γ frame
and a 1-row driver round-trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

D38 = "decimal(38,0)"
U6 = 1_000_000


def _clamp(x: int) -> int:
    return max(1, min(U6 - 1, x))


def part_pair_gammas(part: DataFrame) -> DataFrame:
    """Brand-blocked part pairs with the 4-bit comparison vector.
    Output: id_a, id_b (a < b), g1..g4 (int 0/1)."""
    cols = [
        "p_partkey",
        "p_brand",
        "p_size",
        "p_type",
        F.split(F.col("p_name"), " ")[0].alias("_w1"),
        (F.floor(F.col("p_retailprice"))).cast("bigint").alias("_pb"),
    ]
    a = part.select(*cols).toDF(
        "ka", "brand", "sza", "tya", "wa", "pba"
    )
    b = part.select(*cols).toDF(
        "kb", "brand", "szb", "tyb", "wb", "pbb"
    )
    return (
        a.join(b, "brand")
        .filter(F.col("ka") < F.col("kb"))
        .select(
            F.col("ka").alias("id_a"),
            F.col("kb").alias("id_b"),
            (F.col("sza") == F.col("szb")).cast("int").alias("g1"),
            (F.col("tya") == F.col("tyb")).cast("int").alias("g2"),
            (F.col("wa") == F.col("wb")).cast("int").alias("g3"),
            (F.expr("pba div 10") == F.expr("pbb div 10"))
            .cast("int")
            .alias("g4"),
        )
    )


def fs_em_train(
    part: DataFrame,
    rounds: int = 3,
    p0: int = 100_000,
    m0: int = 900_000,
    u0: int = 100_000,
) -> DataFrame:
    """Run ``rounds`` EM steps; return the FULL parameter trajectory
    as a frame: (round int, feature int 1-4, m_u6, u_u6, p_u6) —
    4·rounds rows, every round hash-pinned.

    The γ PATTERN COUNTS are sufficient statistics for FS-EM (the
    posterior w depends only on γ, so every weighted sum is
    Σ_γ n_γ·w_γ exactly): ONE distributed groupBy over the pair frame
    collapses the corpus to ≤ 2^F = 16 rows, and all EM rounds run as
    exact Python integer arithmetic over those counts — bit-identical
    to the per-pair form the oracle computes, and the CLAUDE.md
    dictionary-grain rule in its purest form (62.7 s → ~2 s at sf0.1;
    at 100 TB the per-round cost is CONSTANT once the one pattern
    count is paid)."""
    spark = part.sparkSession
    feats = list(range(4))
    pat = {
        (r.g1, r.g2, r.g3, r.g4): int(r._c)
        for r in part_pair_gammas(part)
        .groupBy("g1", "g2", "g3", "g4")
        .agg(F.count(F.lit(1)).alias("_c"))
        .collect()
    }
    n = sum(pat.values())
    p = p0
    m = [m0] * 4
    u = [u0] * 4
    traj = []
    for t in range(1, rounds + 1):
        sw = 0
        swg, svg = [0] * 4, [0] * 4
        for gamma, cnt in pat.items():
            num = p
            den2 = U6 - p
            for f in feats:
                num *= m[f] if gamma[f] else U6 - m[f]
                den2 *= u[f] if gamma[f] else U6 - u[f]
            w = num * U6 // (num + den2)
            sw += cnt * w
            for f in feats:
                if gamma[f]:
                    swg[f] += cnt * w
                    svg[f] += cnt * (U6 - w)
        sv = n * U6 - sw
        p = _clamp(sw // n)
        m = [_clamp(swg[f] * U6 // max(sw, 1)) for f in feats]
        u = [_clamp(svg[f] * U6 // max(sv, 1)) for f in feats]
        for f in feats:
            traj.append((t, f + 1, m[f], u[f], p))
    return spark.createDataFrame(
        traj,
        "round int, feature int, m_u6 bigint, u_u6 bigint, p_u6 bigint",
    )
