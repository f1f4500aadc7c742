"""Output-envelope guard (VERDICT r7 item #2).

The driver's correctness hasher canonicalizes int64 values exactly but
mangles anything wider: `cuped_adjusted_lift` went red in
CORRECTNESS_r07 purely because its final `adj_num` column was a
DECIMAL(38,0) ≈ 7.9e22 — the only >int64 final across all 277 queries
(judge-swept). This test keeps that count at zero: it runs every
`oracle_sql()` entry in DuckDB at sf0.01 and asserts no integer /
decimal value in any FINAL output column exceeds int64.

Sweeping the DuckDB side (not Spark) is deliberate: the oracle gate
(`tools/check_oracle.py`, run by the pre-commit hook) already hash-
matches Spark against these same oracles — so oracle values ARE the
Spark values wherever the gate is green — and the full DuckDB sweep
runs in seconds where 277 Spark jobs take minutes. check_oracle also
enforces the identical bound on the collected SPARK rows per commit
(`envelope_violations`), so both sides are pinned.

Reverting the round-8 cuped fix (emitting raw adj_num/scale again)
makes this test fail on `cuped_adjusted_lift`.
"""

from __future__ import annotations

import decimal
import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()
INT64_MAX = 2**63 - 1


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _oracles():
    import __spark_entry__ as entrymod

    return entrymod.oracle_sql()


def test_every_oracle_output_fits_int64(con):
    offenders: dict[str, list[str]] = {}
    for name, sql in _oracles().items():
        res = con.sql(sql)
        cols = res.columns
        bad = set()
        for row in res.fetchall():
            for i, v in enumerate(row):
                if isinstance(v, bool):
                    continue
                if isinstance(v, (int, decimal.Decimal)) and abs(v) > INT64_MAX:
                    bad.add(cols[i])
        if bad:
            offenders[name] = sorted(bad)
    assert not offenders, (
        "final output columns exceed int64 (driver hash envelope breaks "
        f"past 64 bits): {offenders}"
    )
