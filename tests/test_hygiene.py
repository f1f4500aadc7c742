"""Unit tests for corpus-hygiene operators (dedup cluster resolution,
decontamination, PII redaction) and the composed curation pipeline."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from sea_express_customs_etl_spark.operators.dedup import dedup_clusters
from sea_express_customs_etl_spark.operators.hygiene import (
    PII_PATTERNS,
    decontaminate,
    redact_pii,
)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id long")


import pytest


@pytest.mark.parametrize("driver_threshold", [1_000_000, 0])
def test_dedup_clusters_chain_propagates_min(spark, driver_threshold):
    # 1-2, 2-3, 3-4 is a diameter-3 chain: every node must reach label 1,
    # which takes multiple propagation sweeps (regression against
    # one-sweep implementations). Parametrized over both execution
    # paths: driver-side union-find (small graph) and distributed
    # sweeps (driver_threshold=0) must emit identical labels.
    out = {
        r.doc_id: (r.cluster_id, r.keep)
        for r in dedup_clusters(
            _nodes(spark, [1, 2, 3, 4, 9]),
            _pairs(spark, [(1, 2), (2, 3), (3, 4)]),
            driver_threshold=driver_threshold,
        ).collect()
    }
    assert out == {
        1: (1, 1),
        2: (1, 0),
        3: (1, 0),
        4: (1, 0),
        9: (9, 1),  # isolated doc keeps itself
    }


def test_dedup_clusters_two_components_and_no_pairs(spark):
    out = {
        r.doc_id: (r.cluster_id, r.keep)
        for r in dedup_clusters(
            _nodes(spark, [1, 2, 5, 6, 7]), _pairs(spark, [(1, 2), (6, 7), (5, 6)])
        ).collect()
    }
    assert out[1] == (1, 1) and out[2] == (1, 0)
    assert out[5] == (5, 1) and out[6] == (5, 0) and out[7] == (5, 0)
    # empty pair graph: everyone keeps themselves
    out2 = dedup_clusters(_nodes(spark, [3, 4]), _pairs(spark, []))
    assert {(r.doc_id, r.keep) for r in out2.collect()} == {(3, 1), (4, 1)}


def test_dedup_lines_drops_corpus_duplicates_in_order(spark):
    from sea_express_customs_etl_spark.operators.hygiene import dedup_lines

    docs = spark.createDataFrame(
        [
            (1, "keep one\nBOILER\nkeep two"),
            (2, "BOILER\nunique line"),
            (3, "BOILER"),  # all lines dropped → empty text survives
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.text, r.n_removed) for r in dedup_lines(docs).collect()}
    assert out == {
        1: ("keep one\nkeep two", 1),
        2: ("unique line", 1),
        3: ("", 1),
    }


def test_dedup_lines_max_occurrences_threshold(spark):
    from sea_express_customs_etl_spark.operators.hygiene import dedup_lines

    docs = spark.createDataFrame(
        [(1, "twice\na"), (2, "twice\nb"), (3, "thrice"), (4, "thrice"),
         (5, "thrice")],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.text, r.n_removed) for r in
           dedup_lines(docs, max_occurrences=2).collect()}
    # 'twice' (2 occurrences) stays under the threshold; 'thrice' goes
    assert out == {
        1: ("twice\na", 0),
        2: ("twice\nb", 0),
        3: ("", 1),
        4: ("", 1),
        5: ("", 1),
    }


def test_decontaminate_flags_overlap_only(spark):
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),  # shares a 5-gram
            (2, "totally unrelated words nothing shared here at all"),
            (3, "tiny"),  # < n words → 0 overlap, still present in output
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon omega")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_overlap, r.contaminated)
        for r in decontaminate(corpus, bench, n=5).collect()
    }
    assert out[1] == (1, 1)  # "alpha beta gamma delta epsilon"
    assert out[2] == (0, 0)
    assert out[3] == (0, 0)


def test_redact_pii_goldens(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "server at 192.168.0.1 responded"),
            (3, "call +886 912 345 678 today"),
            (4, "clean text with no pii at all"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.n_redactions, r.redacted) for r in redact_pii(df).collect()}
    assert out[1] == (1, "mail [EMAIL] now")
    assert out[2] == (1, "server at [IP] responded")
    assert out[3] == (1, "call [PHONE] today")
    assert out[4] == (0, "clean text with no pii at all")


def test_redact_pii_matches_duckdb_dialect(spark):
    # the same patterns must match identically under Java regex (Spark)
    # and RE2 (DuckDB) — this is what makes the operator oracle-safe
    texts = [
        "a@b.co and 10.0.0.1 and +1 555 123 4567 end",
        "digits 12345678 are not a phone",
        "999.999.999.999 still matches the ipv4 shape",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r.doc_id: r.redacted for r in redact_pii(df).collect()}
    con = duckdb.connect()
    for i, t in enumerate(texts):
        expected = t
        for _, pat, token in PII_PATTERNS:
            expected = con.execute(
                "SELECT regexp_replace(?, ?, ?, 'g')", [expected, pat, token]
            ).fetchone()[0]
        assert got[i] == expected


def test_dedup_clusters_matches_union_find(spark):
    """Property: min-label propagation over random pair graphs agrees
    with a plain-Python union-find on every node's component minimum."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        edges=st.lists(
            st.tuples(st.integers(0, 19), st.integers(0, 19)),
            max_size=15,
        )
    )
    def check(edges):
        edges = [(a, b) if a < b else (b, a) for a, b in edges if a != b]
        parent = list(range(20))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expected = {i: find(i) for i in range(20)}
        got = {
            r.doc_id: r.cluster_id
            # max_iter=25: random graphs here can be paths (diameter up
            # to 15), unlike the near-clique LSH clusters the default
            # bound is sized for
            for r in dedup_clusters(
                _nodes(spark, range(20)),
                _pairs(spark, edges) if edges else _pairs(spark, []),
                max_iter=25,
            ).collect()
        }
        assert got == expected

    check()


def test_curation_pipeline_invariants(spark, sf_dir):
    from sea_express_customs_etl_spark.operators.textstats import quality_gate
    from sea_express_customs_etl_spark.plans.curation import curation_pipeline
    from sea_express_customs_etl_spark.plans.standins import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = curation_pipeline(docs)
    rows = out.collect()
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids))  # no doc emitted twice
    assert set(r.split for r in rows) <= {"train", "val", "test"}
    # every survivor passed the gate
    passed = {
        r.doc_id
        for r in quality_gate(docs).filter(F.col("passed")).select("doc_id").collect()
    }
    assert set(ids) <= passed
    # survivors are exact-unique by content
    surv_text = docs.join(out.select("doc_id"), "doc_id").select("text")
    assert surv_text.count() == surv_text.distinct().count()
