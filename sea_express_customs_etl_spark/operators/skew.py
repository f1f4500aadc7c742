"""Skew-mitigation join: key salting.

AQE's skew-join splitting (enabled in ``session.py``) handles most
skew at runtime; explicit salting remains necessary when a single hot
key exceeds what post-shuffle splitting can fix (e.g. the
'unknown'/empty waybill key in dirty customs feeds) or when the build
side must stay a shuffle join.

``salted_join``: the skewed (large) side gets a random-free,
deterministic salt derived from a row fingerprint; the small side is
replicated ``salt_factor`` times. The join key becomes
``(key, salt)`` so the hot key spreads over ``salt_factor`` reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``large ⋈ small`` on ``key`` with the large side's hot
    keys spread across ``salt_factor`` partitions.

    The salt is ``pmod(hash(all large-side columns), salt_factor)`` —
    deterministic (no rand(), so retries/speculative tasks agree) and
    uniform. The small side is exploded against ``sequence(0, n-1)``;
    replication cost is |small| × salt_factor, so keep the small side
    dimension-sized (for two LARGE skewed sides, prefer AQE skew-join).
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in large.columns]), F.lit(salt_factor))
    large_s = large.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
    )
    joined = large_s.join(small_s, [key, "_salt"], how)
    return joined.drop("_salt")
