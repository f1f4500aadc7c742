"""Facility-location greedy coreset selection — submodular
data-subset selection for training-data curation: pick k exemplars
from a bounded candidate pool maximizing total corpus COVERAGE
(Σ_points max_{s ∈ S} sim(point, s)), the classic (1 − 1/e)-greedy
over a monotone submodular objective (Nemhauser et al. 1978; the
coreset/exemplar-selection shape used for instruction-data picking
and deduplicated sampling). MMR (``operators/mmr.py``) diversifies a
QUERY's result list; this selects a CORPUS-covering subset — the two
ends of the same relevance/coverage spectrum.

Exactness: similarities are micro-unit integers clamped at ≥ 0
(``greatest(0, round(1e6·cos))`` — facility location needs
nonnegative utilities), so each step's marginal gain
Σ_p max(0, sim(p, c) − cover(p)) is an exact integer sum and the
greedy SELECTION TRAJECTORY (winner + gain per step, ties gain DESC
then id ASC) hash-checks against an oracle that unrolls the k steps
into chained cover/gain CTEs.

Scale shape: the sim table is |corpus|·|pool| rows — ONE pinned
broadcast of the FIXED candidate pool (model-sized at any corpus
scale, the centroid license) against the corpus scan, computed once
and persisted. Each step is one join + one partial-aggregated sum at
pool grain plus a corpus-grain cover update via a 1-row winner join —
never a collect, never a corpus×corpus product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

from ..plans.cache import tracked_persist
from .similarity import _dot, with_norm


def facility_location_select(
    df: DataFrame,
    candidates: DataFrame,
    k: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Greedy facility-location selection of ``k`` exemplars from
    ``candidates`` covering ``df``. Output: (sel_rank int, {id_col},
    gain_u6 bigint) — the selection trajectory."""
    pts = with_norm(df, vec_col, id_col).select(
        F.col(id_col).alias("_p"),
        F.col("_v").alias("_pv"),
        F.col("_n").alias("_pn"),
    )
    cands = with_norm(candidates, vec_col, id_col).select(
        F.col(id_col).alias("_c"),
        F.col("_v").alias("_cv"),
        F.col("_n").alias("_cn"),
    )
    sim = F.greatest(
        F.lit(0).cast("bigint"),
        F.round(
            F.lit(1_000_000)
            * _dot(F.col("_pv"), F.col("_cv"))
            / (F.col("_pn") * F.col("_cn"))
        ).cast("bigint"),
    )
    sims = pts.join(F.broadcast(cands)).select(  # pool FIXED — model-sized
        "_p", "_c", sim.alias("_s")
    )
    return facility_location_from_sims(
        sims, k=k, id_col=id_col, points=pts.select("_p")
    )


def facility_location_from_sims(
    sims_in: DataFrame,
    k: int = 4,
    id_col: str = "vec_id",
    points: DataFrame | None = None,
) -> DataFrame:
    """The greedy facility-location loop over a PREBUILT (point ``_p``,
    candidate ``_c``, clamped sim ``_s``) table — shared by the exact
    cross-product path (:func:`facility_location_select`) and the
    ANN-fed sparse path (store ADC top-N per candidate + exact refine,
    VERDICT r8 #6). A (point, candidate) pair absent from ``sims_in``
    contributes 0 coverage, which is exactly the sparse-candidate
    approximation. ``points`` overrides the cover-init frame (the
    exact path passes the corpus projection so the sparse path's
    distinct-_p shuffle never touches the cross product)."""
    sims = tracked_persist(sims_in)
    cover = tracked_persist(
        (points if points is not None else sims.select("_p").distinct())
        .select("_p", F.lit(0).cast("bigint").alias("_cov"))
    )
    pick_w = Window.orderBy(F.col("gain_u6").desc(), F.col("_c").asc())
    out = None
    for i in range(1, k + 1):
        pool = sims if out is None else sims.join(
            out.select("_c"), "_c", "left_anti"
        )
        gains = (
            pool.join(cover, "_p")
            .groupBy("_c")
            .agg(
                F.sum(
                    F.greatest(
                        F.lit(0).cast("bigint"),
                        F.col("_s") - F.col("_cov"),
                    )
                ).alias("gain_u6")
            )
        )
        # winner (1 row) and the updated cover are BOTH re-referenced
        # by every later round — persisted-only state nests each
        # round's plan inside the next (252 Exchange nodes / 349 KB
        # explain at k = 4). localCheckpoint is the lineage CUT (the
        # mmr lesson): winner is 1 row; cover is the corpus-grain
        # state a production run would keep as a checkpoint table.
        winner = (
            gains.withColumn("_rn", F.row_number().over(pick_w))
            .filter(F.col("_rn") == 1)
            .select(
                F.lit(i).alias("sel_rank"), "_c", "gain_u6"
            )
            .localCheckpoint()
        )
        w_sim = sims.join(winner.select("_c"), "_c").select(
            "_p", F.col("_s").alias("_ws")
        )
        cover = (
            cover.join(w_sim, "_p", "left")
            .select(
                "_p",
                F.greatest(
                    F.col("_cov"), F.coalesce(F.col("_ws"), F.lit(0))
                ).alias("_cov"),
            )
            .localCheckpoint()
        )
        out = winner if out is None else out.unionByName(winner)
    return out.select(
        "sel_rank", F.col("_c").alias(id_col), "gain_u6"
    )
