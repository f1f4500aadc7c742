"""Content-defined chunking (operators/cdc_chunking.py): exact parity
with a pure-python mirror of the spec, the edit-resynchronization
property that justifies CDC over fixed-size chunking, and empty-text
containment."""

from __future__ import annotations

import pyspark.sql.functions as F

from sea_express_customs_etl_spark.operators.cdc_chunking import (
    GEAR,
    MAX_LEN,
    MIN_LEN,
    MOD,
    THRESH,
    cdc_chunks,
    cdc_shared_chunks,
)


def _py_chunks(text, thr=THRESH, mn=MIN_LEN, mx=MAX_LEN):
    h, start, out = 0, 1, []
    n = len(text)
    for p in range(1, n + 1):
        h = (h * 2 + (ord(text[p - 1]) * GEAR) % MOD) % MOD
        clen = p - start + 1
        if (h < thr and clen >= mn) or clen >= mx or p == n:
            out.append(text[start - 1 : p])
            start = p + 1
    return out


_BASE = (
    "the quick brown fox jumps over the lazy dog while the cat naps "
    "in the warm sun and the birds sing in the tall green trees above "
    "the quiet meadow where the river bends toward the old stone mill"
)


def test_matches_python_mirror(spark):
    df = spark.createDataFrame(
        [(1, _BASE), (2, _BASE[::-1]), (3, "short one")],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.chunk_idx, r.chunk, r.chunk_len)
        for r in cdc_chunks(df).collect()
    }
    want = set()
    for did, t in [(1, _BASE), (2, _BASE[::-1]), (3, "short one")]:
        for i, c in enumerate(_py_chunks(t)):
            want.add((did, i, c, len(c)))
    assert got == want and len(got) > 3


def test_edit_resynchronizes_fixed_size_does_not(spark):
    """One edit at the HEAD of a copy: CDC boundaries re-anchor on
    content, so the copy still shares most chunks with the original;
    a fixed-size chunker loses alignment at the first shifted byte
    and shares (near) nothing. This asymmetry is the reason CDC
    exists."""
    edit_at = 50
    edited = _BASE[:edit_at] + "INSERTED TEXT " + _BASE[edit_at:]
    orig, cp = _py_chunks(_BASE), _py_chunks(edited)
    shared_cdc = set(orig) & set(cp)
    # CDC re-anchors DOWNSTREAM of the edit: some shared chunk starts
    # after the insertion point in the original
    assert any(_BASE.index(c) > edit_at for c in shared_cdc)

    # fixed-size chunks share only the untouched prefix — nothing
    # after the insertion survives the offset shift
    size = 32
    fixed_a = {_BASE[i : i + size] for i in range(0, len(_BASE), size)}
    fixed_b = {edited[i : i + size] for i in range(0, len(edited), size)}
    assert all(_BASE.index(c) < edit_at for c in fixed_a & fixed_b)

    # and the Spark aggregation sees the reuse
    df = spark.createDataFrame(
        [(1, _BASE), (2, edited)], "doc_id long, text string"
    )
    shared = cdc_shared_chunks(df).collect()
    assert len(shared) == len(shared_cdc)
    assert all(r.n_docs == 2 for r in shared)


def test_empty_and_single_char_texts_contained(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "a"), (3, None)], "doc_id long, text string"
    )
    got = cdc_chunks(df).collect()
    # empty/null texts emit no chunks; 1-char text emits its one chunk
    assert {(r.doc_id, r.chunk) for r in got} == {(2, "a")}


def test_arrow_fast_path_bit_identical(spark, sf_dir):
    """The vectorized Arrow path must equal the Catalyst spec fold
    ROW FOR ROW over the real corpus — same boundaries, same chunks,
    same indices (the 20-term shifted-add series is exactly the ×2
    recurrence mod 2²⁰; the gating walk visits the same candidates)."""
    from sea_express_customs_etl_spark.operators.cdc_chunking import (
        cdc_chunks_arrow,
    )
    from sea_express_customs_etl_spark.plans.standins import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ref = {
        (r.doc_id, r.chunk_idx, r.chunk, r.chunk_len, r.chunk_hash)
        for r in cdc_chunks(docs).collect()
    }
    fast = {
        (r.doc_id, r.chunk_idx, r.chunk, r.chunk_len, r.chunk_hash)
        for r in cdc_chunks_arrow(docs).collect()
    }
    assert fast == ref and len(ref) > 1000


def test_arrow_path_routes_non_ascii_to_catalyst(spark):
    """A non-ASCII document must not poison the Arrow job (one bad doc
    at 100 TB must not abort the run): the router sends it to the
    per-character Catalyst fold, and the mixed frame's output equals a
    pure-Catalyst run row for row."""
    from sea_express_customs_etl_spark.operators.cdc_chunking import (
        cdc_chunks_arrow,
    )

    cjk = "數據管道的內容定義分塊測試 " * 12 + _BASE
    rows = [(1, _BASE), (2, cjk), (3, _BASE[::-1]), (4, None), (5, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ref = {
        (r.doc_id, r.chunk_idx, r.chunk, r.chunk_len, r.chunk_hash)
        for r in cdc_chunks(df).collect()
    }
    fast = {
        (r.doc_id, r.chunk_idx, r.chunk, r.chunk_len, r.chunk_hash)
        for r in cdc_chunks_arrow(df).collect()
    }
    assert fast == ref
    # the CJK doc actually produced chunks through the fallback branch
    assert any(d == 2 for d, *_ in ref)
