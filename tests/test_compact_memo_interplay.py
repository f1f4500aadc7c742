"""Regression: the two compaction queries share `_COMPACT_STORE_MEMO`
with DIFFERENT key shapes — the ANN entry's (app_id, sf_dir) and the
sketch entry's ("sketchcomp", app_id, sf_dir). The stale-session purge
must membership-test the current applicationId, not positionally match
k[0]: a positional purge evicts the sketch key every time the ANN
query runs, and the next sketch invocation replays its writer batches
onto an ALREADY-COMPACTED store (whose batch markers were collapsed),
resurrecting deleted users (r10 suite-caught hash mismatch on
sketch_compact_merged; order-dependent, so this test pins the exact
interleaving).
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from sea_express_customs_etl_spark.plans.cache import release_tracked
from tools.check_oracle import TABLES, value_hash


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _check(spark, sf_dir, duck, name):
    sdf = entrymod.queries()[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    release_tracked()
    res = duck.sql(entrymod.oracle_sql()[name])
    orows = res.fetchall()
    assert len(srows) == len(orows), f"{name}: row count"
    assert value_hash(sdf.columns, srows) == value_hash(
        res.columns, orows
    ), f"{name}: hash after interleaved compaction"


def test_sketch_survives_ann_compact_interleaving(spark, sf_dir, duck):
    # sketch builds+compacts, ANN compact runs (its purge must NOT
    # evict the sketch key), then BOTH re-run against the same oracles
    for name in (
        "sketch_compact_merged",
        "ann_store_compact_topk",
        "sketch_compact_merged",
        "ann_store_compact_topk",
    ):
        _check(spark, sf_dir, duck, name)
