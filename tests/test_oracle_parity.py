"""End-to-end golden test: every ``__spark_entry__.queries()`` entry vs
its DuckDB oracle at sf0.001 (the driver runs the same comparison at
sf0.01 — ``tools/check_oracle.py`` replicates it; this is the fast
in-suite version)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.check_oracle import TABLES, value_hash


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == [
        "original_description",
        "official_description",
        "ccc_code",
        "frequency",
    ]


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    fn = entrymod.queries()[name]
    sdf = fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    oracles = entrymod.oracle_sql()
    if name not in oracles:
        assert len(srows) >= 0  # rows-only contract
        return
    res = duck.sql(oracles[name])
    orows = res.fetchall()
    assert len(srows) == len(orows), f"row count mismatch for {name}"
    assert sorted(sdf.columns) == sorted(res.columns), f"schema mismatch for {name}"
    assert value_hash(sdf.columns, srows) == value_hash(res.columns, orows), (
        f"value hash mismatch for {name}"
    )
