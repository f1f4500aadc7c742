"""Property tests for the deterministic sketch family
(operators/sketches.py): HLL accuracy + mergeability, CMS one-sided
error + linearity, Bloom no-false-negatives + bounded false-positive
rate. The sketch STATES are oracle-checked by the hll_tokens /
cms_token_freqs / bloom_filter_probe queries; these tests pin the
probabilistic guarantees the states exist to provide."""

from __future__ import annotations

import pyspark.sql.functions as F

from sea_express_customs_etl_spark.operators.sketches import (
    HLL_M,
    bloom_build,
    bloom_might_contain,
    cms_cells,
    cms_point_estimates,
    hll_estimate,
    hll_registers,
)


def _values(spark, n, prefix="v"):
    return spark.createDataFrame(
        [(f"{prefix}{i}",) for i in range(n)], "val string"
    )


def test_hll_estimate_within_standard_error(spark):
    # 1/sqrt(256) = 6.25%; allow 3 sigma on one draw
    for n in (100, 2000):
        est = hll_estimate(_values(spark, n), "val")
        assert abs(est - n) / n < 0.2, (n, est)


def test_hll_registers_merge_by_max(spark):
    """Sharded build + max-merge must equal the single-pass registers
    — the property that makes HLL distributable."""
    a, b = _values(spark, 500), _values(spark, 800, prefix="w")
    both = a.unionByName(b)
    merged = (
        hll_registers(a, "val")
        .unionByName(hll_registers(b, "val"))
        .groupBy("bucket")
        .agg(F.max("max_rank").alias("max_rank"))
    )
    one = {(r.bucket, r.max_rank) for r in hll_registers(both, "val").collect()}
    assert {(r.bucket, r.max_rank) for r in merged.collect()} == one
    assert len(one) <= HLL_M


def test_hll_duplicate_insensitive(spark):
    uniq = _values(spark, 300)
    dup = uniq.unionByName(uniq).unionByName(uniq)
    assert hll_estimate(dup, "val") == hll_estimate(uniq, "val")


def test_cms_overestimates_never_under(spark):
    rows = [(f"t{i % 50}",) for i in range(5000)]  # 50 values, 100 each
    df = spark.createDataFrame(rows, "val string")
    cells = cms_cells(df, "val")
    qs = df.select("val").distinct()
    est = {
        r.val: r.est_count
        for r in cms_point_estimates(qs, cells, "val").collect()
    }
    assert all(e >= 100 for e in est.values())
    # d=4 independent rows over w=256 cells with 50 values: at least
    # one collision-free row per value is near-certain
    assert sum(1 for e in est.values() if e == 100) >= 45


def test_cms_is_linear_in_weights(spark):
    """cnt sums a weight column when given — pre-aggregated inputs
    produce the identical sketch (CMS linearity)."""
    raw = spark.createDataFrame(
        [(f"t{i % 20}",) for i in range(400)], "val string"
    )
    pre = raw.groupBy("val").agg(F.count(F.lit(1)).alias("w"))
    a = {
        (r.sketch_row, r.col): r.cnt for r in cms_cells(raw, "val").collect()
    }
    b = {
        (r.sketch_row, r.col): r.cnt
        for r in cms_cells(pre, "val", weight_col="w").collect()
    }
    assert a == b


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    members = _values(spark, 400, prefix="in")
    others = _values(spark, 2000, prefix="out")
    bloom = bloom_build(members, "val")
    probed = bloom_might_contain(
        members.unionByName(others), bloom, "val"
    ).collect()
    got = {r.val: r.might_contain for r in probed}
    assert all(got[f"in{i}"] == 1 for i in range(400))  # never miss
    # k=4, m=65536, n=400 → theoretical fp ≈ (1-e^(-kn/m))^k ≈ 3e-7;
    # allow slack for hash clustering
    fp = sum(got[f"out{i}"] for i in range(2000))
    assert fp <= 2


def test_bloom_probe_output_schema_keeps_input_columns(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, val string"
    )
    out = bloom_might_contain(df, bloom_build(df, "val"), "val")
    assert out.columns == ["doc_id", "val", "might_contain"]


def test_hll_registers_by_group_isolates_groups(spark):
    """Per-group registers must equal running the global sketch on
    each group's slice independently."""
    from sea_express_customs_etl_spark.operators.sketches import (
        hll_registers,
        hll_registers_by,
    )

    df = spark.createDataFrame(
        [("a", f"t{i}") for i in range(50)]
        + [("b", f"t{i}") for i in range(5)],
        "g string, v string",
    )
    grouped = {
        (r.g, r.bucket): r.max_rank
        for r in hll_registers_by(df, "v", "g").collect()
    }
    for g in ("a", "b"):
        solo = {
            (g, r.bucket): r.max_rank
            for r in hll_registers(
                df.filter(f"g = '{g}'").select("v"), "v"
            ).collect()
        }
        assert {k: v for k, v in grouped.items() if k[0] == g} == solo


def test_cms_heavy_hitters_never_misses_true_hitters(spark):
    """One-sided CMS error => every value whose TRUE share clears the
    threshold must be admitted (recall 1); estimates dominate truth."""
    import pyspark.sql.functions as F

    from sea_express_customs_etl_spark.operators.sketches import (
        cms_heavy_hitters,
    )

    rows = (
        [("hot",)] * 400
        + [("warm",)] * 100
        + [(f"cold{i}",) for i in range(100)]
    )
    df = spark.createDataFrame(rows, "tok string")
    got = {r.tok: r.est_count for r in cms_heavy_hitters(
        df, "tok", min_share_ppm=100_000, k=10
    ).collect()}
    # true shares: hot 66%, warm 16% — both >= 10%; colds 0.16% each
    assert "hot" in got and "warm" in got
    assert got["hot"] >= 400 and got["warm"] >= 100  # estimate >= truth
    trues = {r.tok: r.n for r in df.groupBy("tok").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    for tok, est in got.items():
        assert est >= trues[tok]
