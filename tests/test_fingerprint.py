"""Winnowing fingerprint operator vs a pure-Python reference
implementation of the MOSS algorithm (Schleimer et al. SIGMOD'03),
plus the paper's coverage guarantee on constructed near-dups."""

from __future__ import annotations

import hashlib
import random

import pyspark.sql.functions as F


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _ref_fingerprints(text: str, k: int, w: int) -> set[str]:
    toks = text.split()
    hashes = [
        _md5(" ".join(toks[i : i + k])) for i in range(len(toks) - k + 1)
    ]
    return {
        min(hashes[i : i + w]) for i in range(len(hashes) - w + 1)
    }


def _rand_doc(rnd: random.Random, n: int) -> str:
    return " ".join(f"w{rnd.randrange(40)}" for _ in range(n))


def test_fingerprints_match_reference_on_random_docs(spark):
    from sea_express_customs_etl_spark.operators.fingerprint import (
        winnow_fingerprints,
    )

    rnd = random.Random(7)
    docs = [(i, _rand_doc(rnd, rnd.randrange(0, 30))) for i in range(40)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    for k, w in ((3, 4), (2, 3)):
        got: dict[int, set[str]] = {}
        for r in winnow_fingerprints(df, k=k, w=w).collect():
            got.setdefault(r.doc_id, set()).add(r.fp)
        ref = {
            i: fps
            for i, t in docs
            if (fps := _ref_fingerprints(t, k, w))
        }
        assert got == ref, (k, w)


def test_shared_run_guarantee_and_pairs(spark):
    """Any two docs sharing a run of >= w + k - 1 tokens share a
    fingerprint (the paper's guarantee), and winnow_dup_pairs surfaces
    exactly the planted pairs on an otherwise-unique corpus."""
    from sea_express_customs_etl_spark.operators.fingerprint import (
        winnow_dup_pairs,
    )

    rnd = random.Random(11)
    # unique filler vocabulary per doc -> no accidental collisions
    base = [
        (i, " ".join(f"u{i}_{j}" for j in range(12))) for i in range(6)
    ]
    run = " ".join(f"shared{j}" for j in range(8))  # >= w+k-1 = 6
    docs = [
        (i, (t + " " + run) if i in (1, 4) else t) for i, t in base
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    pairs = {
        (r.id_a, r.id_b)
        for r in winnow_dup_pairs(
            df, k=3, w=4, min_shared=1, df_max=50
        ).collect()
    }
    assert pairs == {(1, 4)}


def test_df_cap_drops_boilerplate(spark):
    """A fingerprint present in more docs than df_max proposes no
    pairs — the boilerplate guard."""
    from sea_express_customs_etl_spark.operators.fingerprint import (
        winnow_dup_pairs,
    )

    boiler = " ".join(f"b{j}" for j in range(10))
    docs = [(i, f"u{i}a u{i}b u{i}c " + boiler) for i in range(5)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    capped = winnow_dup_pairs(df, k=3, w=4, min_shared=1, df_max=4)
    assert capped.count() == 0
    open_ = winnow_dup_pairs(df, k=3, w=4, min_shared=1, df_max=5)
    assert open_.count() == 10  # all C(5,2) pairs share the boilerplate
