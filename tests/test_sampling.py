

def test_split_leakage_audit_property(spark, sf_dir):
    """The audit's invariant on the real corpus: under cluster-keyed
    splitting NO near-dup pair straddles a boundary (both endpoints
    share the cluster, hence the hash, hence the split); the naive
    doc-keyed policy leaks (cross-split pairs exist) — the reason
    cluster_safe_split exists, pinned as data."""
    import __spark_entry__ as entry

    rows = entry.queries()["split_leakage_audit"](spark, sf_dir).collect()
    by_cluster = [r for r in rows if r.policy == "by_cluster"]
    by_doc = [r for r in rows if r.policy == "by_doc"]
    assert by_cluster and all(r.split_a == r.split_b for r in by_cluster)
    assert any(r.split_a != r.split_b for r in by_doc)
    # both policies tag every pair exactly once
    assert sum(r.n_pairs for r in by_cluster) == sum(
        r.n_pairs for r in by_doc
    )
