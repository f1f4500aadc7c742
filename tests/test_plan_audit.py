"""Repo-wide plan audit: every declared query's physical plan is built
(analysis + optimization only — nothing executes) and checked for the
join shapes that do not survive 100 TB.

- ``CartesianProduct`` (shuffled cross join): never acceptable; its
  cost is |L|x|R| with both sides shuffled. Zero tolerance.
- ``BroadcastNestedLoopJoin``: acceptable ONLY when one side is a
  deliberately-broadcast small relation. The allowlist enumerates the
  queries that do this by design, each with the reason; any NEW query
  that introduces a BNLJ fails the test until it is either re-planned
  or consciously allowlisted.
"""

import contextlib
import io
import re

import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"

# BNLJ-by-design: the broadcast side is small by construction.
BNLJ_ALLOWED = {
    "idle_rich_customers",  # 1-row (sum, n) scalar-avg cross-joined
    #                         (the chi2_features license)
    "cuped_adjusted_lift",  # 1-row global-moments frame cross-joined
    #                         (the chi2_features license)
    "important_parts_value",  # 1-row global-total scalar cross-joined
    "top_supplier_revenue",  # 1-row scalar-max frame cross-joined
    "hashed_doc_clusters",  # trained k=4 centroid table broadcast
    #                         (the kmeans_ivf_topk license)
    "copurchase_negatives",  # 1-row |catalog| scalar cross-joined
    "chi2_features",      # 1-row (N, N_pos) totals cross-joined
    "curriculum_shards",  # |partitions|-row rank offsets + 1-row V
    #                       (the global_rank/lm license, as lm_terciles)
    "lpa_modularity",     # three 1-row scalars (m, e_in) cross-joined
    "cosine_topk",        # query set (10 vectors) broadcast vs corpus
    "mrl_recall_curve",   # same query-set broadcast, 4 truncated dims
    "mmr_rerank_topk",    # same query-set broadcast feeding candidate
    #                       generation (steps run at |q|·k² grain)
    "facility_coreset_select",  # fixed 32-vector pool broadcast vs
    #                               the corpus scan (the centroid license)
    "ann_ivf_nprobe2",    # centroid table broadcast (|centroids| = 16)
    "kmeans_ivf_topk",    # trained centroid table broadcast (k = 8)
    "ivf_near_dups",      # cluster-blocked verify: centroids broadcast
    "ivfpq_topk",         # coarse-quantizer centroid table broadcast
    "ivfpq_nprobe2",      # same + per-probed-cell LUT broadcast
    "semantic_dedup",     # same IVF blocking feeding cluster resolution
    "multisignal_dedup_v2",  # composes ivf_near_dups — same 16-row
    #                          centroid broadcast license
    "hard_negative_mine",  # same centroid license + the 10-anchor
    #                        query-set broadcast (cosine_topk class)
    "embedding_near_dups",  # block-id spine (|blocks| rows) broadcast
    "tfidf_top_terms",    # 1-row corpus-size N broadcast
    "events_gapfill_locf",  # 1-row (lo, hi) hour-bounds broadcast
    "domain_mix_sample",  # 1-row output-budget scalar broadcast
    "lm_score",           # 1-row vocabulary-size V broadcast
    "event_value_qsketch",  # quantile-spec table (3 literal rows) broadcast
    "lm_terciles",        # 1-row total-N scalar broadcast (ntile_by_rank)
    "tfidf_cosine_pairs",  # 1-row corpus-size N broadcast (IDF scalar)
    "learned_quality_filter",  # B=64-row trained model broadcast
    "corpus_datacard",    # 1-row corpus-total scalar broadcast
    "pmi_collocations",   # 1-row bigram-total N broadcast
    "domain_kl_divergence",  # 1-row (T, V) totals broadcast
    "sq8_codes",          # 1-row (lo_arr, span_arr) quantizer broadcast
    "sq8_topk",           # same 1-row stats + query-set broadcast
    "trigram_backoff",    # 1-row total-N scalar broadcast
    "perplexity_gain_select",  # composes lm_score + trigram_backoff —
    #                            their 1-row V/N scalars (lm license)
    "token_burstiness",   # 1-row corpus-size N broadcast
    "value_psi_drift",    # 1-row Laplace totals broadcast + the
    #                       global_rank partition-offset frame
    "split_srm_check",    # 3-literal-row weights + 1-row total
    "psm_att_lift",       # 1-row caliper/min scalar + 1-row ATT
    #                       aggregates cross-joined (chi2 license)
    "hill_tail_index",    # 1-row (k+1)-th-order-statistic scalar
    #                       cross-joined onto the k+1-row top frame
    "length_emd_drift",   # |sources|-row totals + 1-row corpus-N
    #                       cross-joined onto the value-grain grid
    #                       (bounded domain, chi2 license)
    "neyman_allocation_sample",  # 1-row budget/weight-sum scalar
    #                              cross-joined onto |strata| rows
    "domain_reweight_mw",  # 1-row corpus-N + per-round 1-row weighted
    #                        mean, cross-joined onto |domains| rows
    "pca_label_anova",    # 1-row grand-moment + 1-row SSW frames
    #                       cross-joined (the chi2_features license)
    "knn_label_vote",     # trained centroid table + |queries|·nprobe
    #                       probe broadcasts (the kmeans_ivf_topk license)
    "knn_adc_vote",       # shared-store frozen-model pins + LUT
    "ann_hard_negatives",  # same shared-store pins (knn_adc license)
    "training_cartography",  # 3 pinned B=64-row epoch-snapshot models
    #                          (the learned_quality_filter license)
    #                       broadcast (the ann_store_topk license)
    "isotonic_calibration",  # bucket-grain range spine broadcasts
    #                          (model-sized) + the deciles chain's
    #                          trained-model/1-row pins
    "split_conformal",    # 1-row moments + 1-row quantile broadcasts
    #                       + global_rank offsets (the pps license)
    "conformal_label_sets",  # same 1-row quantile/count pins + the
    #                          perceptron chain's trained-model pins
    "kmeans_label_ari",   # trained k=4 centroid broadcast + 1-row
    #                       pair-sum frames (kmeans_ivf/chi2 licenses)
    "key_skew_stats",     # 1-row total-rows scalar broadcast
    "ann_recall_matrix",  # composes cosine_topk/sq8_topk — their
    #                       query-set broadcasts (allowlisted above)
    "cms_heavy_hitters",  # 1-row total-N scalar broadcast
    "pps_length_sample",  # 1-row total-weight scalar broadcast
    "ivfpq_trained_topk",  # coarse-centroid broadcast, as ivfpq_topk
    "ann_refined_topk",    # trained-index candidates (|queries|·50)
    #                        + query vectors broadcast into the refine
    "pq_trained_codebook",  # centroid broadcast in the residual build
    "ann_store_topk",      # same frozen-model broadcasts over the store
    "ann_store_delete_topk",  # same pins + the del-marker semi-join
    "ann_store_compact_topk",  # same frozen-model pins over the
    #                            compacted generation
    "mmr_ann_rerank",      # composes ann_store_topk + ann_refined_topk
    #                        + mmr_rerank_topk — all three licenses above
    "event_winsorized_sums",  # 2-literal-row quantile-spec broadcast
    #                           (the event_value_qsketch class)
    "bm25_doc_topk",       # 1-row (N, avgdl) corpus scalars cross-joined
    "hybrid_rrf_topk",     # composes bm25 — same 1-row scalar license
    "retrieval_ndcg",      # composes bm25 + the fusion — same 1-row
    #                        corpus-scalar license
    "retrieval_map_mrr",   # same bm25/fusion composition license
    "ranking_rbo",         # same bm25/fusion composition license
    "purchase_hits_authorities",  # 1-row L∞ norm scalar per half-step
    "order_benford_digits",  # 1-row digit-total scalar cross-joined
    "segment_priority_lift",  # 1-row grand-total scalar cross-joined
    "event_mad_outliers",  # 1-literal-row quantile-spec broadcast ×2
    #                        (the event_value_qsketch class)
    "join_size_estimate",  # 1-row true-count scalar cross-joined
    "doc_top_terms",       # 1-row corpus-size N broadcast (the
    #                        tfidf_top_terms license)
    "basket_rules",        # 1-row order-count scalar cross-joined
    "customer_rfm",        # 1-row total-N scalar per NTILE pass
    #                        (the lm_terciles license)
    "classifier_confusion",  # B=64-row trained model broadcast + the
    #                          training prelude's 1-row argmax joins
    #                          (the learned_quality_filter license)
    "averaged_classifier_confusion",  # same B=64-row trained model
    #                                   broadcast (averaged weights)
    "event_value_ks_pairs",  # |types|²-row pair spine: non-equi
    #                          self-join of the per-type totals frame
    #                          (model-sized — the 1-row scalar license)
    "event_value_mwu_pairs",  # same pair spine (shared cumulant frame)
    "hll_source_overlap",  # |sources|²-row pair spine over the
    #                        256-register sketch tables (model-sized)
    "temperature_mix_alloc",  # 1-row Σweight scalar cross-joined
    "segment_conversion_ztest",  # 1-row (N, K) totals cross-joined
    "cf_holdout_hitrate",  # 1-row hit-count scalar cross-joined into
    #                        the 1-row metric frame (the 1-row license)
    "token_vote_confusion",  # 1-row (T_A, T_B) totals cross-joined
    #                          (the chi2_features license)
    "revenue_pareto",  # 1-row (total, n) scalar cross-joined +
    #                    |partitions|-row cumsum offsets (the
    #                    global_rank/pps license)
    "peak_concurrency",  # |partitions|-row cumsum offsets (the
    #                      global_rank/pps license)
    "customer_decile_migration",  # 1-row population-count scalar
    #                               cross-joined per period + the
    #                               global_rank offset broadcasts
    "did_lift",  # 1-row control-cell frame cross-joined into the
    #              1-row treatment frame (the cuped license)
    "tree_depth2_length",  # 1-row root-winner threshold cross-joined
    #                        into the child pass (the 1-row license)
    "event_type_median",  # |partitions|-row global_rank offsets
    #                       (the global_rank/pps license)
    "event_trimmed_sums",  # same global_rank offsets license
    "consistent_hash_rebalance",  # 144-row vnode ring broadcast
    #                               cross-joined (model-sized ring)
    "classifier_score_deciles",  # 1-row total-N scalar broadcast
    #                              (ntile_by_rank, the lm_terciles
    #                              license) + trained model join
    "kneser_ney_bigram",  # 1-row bigram-type-count scalar broadcast
    "source_quantile_norm",  # 1-row total-N scalar + lm_score's 1-row
    #                          V scalar (the lm_terciles license)
    "preference_pairs",  # lm_score's 1-row V scalar (the lm license)
    "vocab_coverage_curve",  # 1-row (total, n_types) scalar broadcast
    #                          (the tfidf_top_terms license)
    "lm_slice_report",  # lm_score's 1-row V scalar (the lm license)
}


@pytest.mark.parametrize("name", sorted(entry.queries()))
def test_query_plan_has_no_scale_killer_join(spark, name):
    df = entry.queries()[name](spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert not re.search(r"\(\d+\) CartesianProduct", plan), (
        f"{name}: CartesianProduct in plan"
    )
    if name not in BNLJ_ALLOWED:
        assert not re.search(r"\(\d+\) BroadcastNestedLoopJoin", plan), (
            f"{name}: unexpected BroadcastNestedLoopJoin — re-plan or "
            f"allowlist with justification"
        )


def _scan_schemas(df) -> list[set]:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        out.append({f.split(":")[0] for f in m.group(1).split(",") if f})
    return out


def _pushed_filters(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return " ".join(m.group(1) for m in re.finditer(r"PushedFilters: (.*)", buf.getvalue()))


@pytest.mark.parametrize(
    "name,expected_scans",
    [
        # a 2-column projection over documents must scan exactly 2 columns
        ("vocab_top_tokens", [{"doc_id", "text"}]),
        ("token_counts", [{"doc_id", "text"}]),
        # 6 of lineitem's 16 columns — TPC-H Q1's signature pruning
        (
            "pricing_summary",
            [
                {
                    "l_quantity",
                    "l_extendedprice",
                    "l_discount",
                    "l_returnflag",
                    "l_linestatus",
                    "l_shipdate",
                }
            ],
        ),
        # JSON parse prunes to the group col + the one JSON column
        ("json_props_rollup", [{"event_type", "props"}]),
        # nanos-epoch conversion must NOT block pruning (ts read as bigint)
        ("events_hourly", [{"ts", "event_type", "value"}]),
    ],
)
def test_scans_read_only_needed_columns(spark, name, expected_scans):
    df = entry.queries()[name](spark, SF_DIR)
    assert _scan_schemas(df) == expected_scans


def test_filter_pushdown_reaches_parquet(spark):
    df = entry.queries()["pricing_summary"](spark, SF_DIR)
    pf = _pushed_filters(df)
    assert "LessThanOrEqual(l_shipdate" in pf


def test_q19_disjunct_partial_pushdown(spark):
    # Catalyst must extract the single-side envelopes of the 3-arm
    # disjunction: the quantity range reaches the lineitem parquet
    # reader as a PushedFilter (raw double column — a bigint cast
    # would block it), and the brand/size envelope reaches the part
    # scan; both scans prune before the join
    df = entry.queries()["brand_size_qty_revenue"](spark, SF_DIR)
    pf = _pushed_filters(df)
    assert "GreaterThanOrEqual(l_quantity,1.0)" in pf
    assert "LessThanOrEqual(l_quantity,35.0)" in pf
    assert "EqualTo(p_brand,Brand#1)" in pf
    assert "GreaterThanOrEqual(p_size,1)" in pf


def test_q6_is_pushdown_only(spark):
    # the Q6 shape's entire cost is the scan: date range + quantity cap
    # must reach the parquet reader, and only 4 columns may be read
    df = entry.queries()["discount_revenue_q6"](spark, SF_DIR)
    pf = _pushed_filters(df)
    assert "GreaterThanOrEqual(l_shipdate" in pf
    assert "LessThan(l_quantity" in pf
    assert _scan_schemas(df) == [
        {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}
    ]


def _plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_domain_mix_joins_are_all_broadcast(spark):
    """The corpus side of domain_mix must never shuffle: thresholds
    arrive by broadcast, membership is a map-side filter."""
    plan = _plan_text(entry.queries()["domain_mix_sample"](spark, SF_DIR))
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert re.search(r"\(\d+\) BroadcastHashJoin", plan)


def test_bpe_encode_uses_dictionary_broadcast(spark):
    """Pins the dictionary-encode design: the vocab→tokens map joins
    back by broadcast (the expensive fold runs per DISTINCT word, and
    corpus words are never sort-merge shuffled against it)."""
    plan = _plan_text(entry.queries()["bpe_encode_fixed"](spark, SF_DIR))
    assert re.search(r"\(\d+\) BroadcastHashJoin", plan)
    assert "SortMergeJoin" not in plan




TOPK_WINDOW_QUERIES = [
    "cosine_topk",
    "ann_ivf_nprobe2",
    "sq8_topk",
    "ivfpq_nprobe2",
    "ivfpq_trained_topk",
]


@pytest.mark.parametrize("name", TOPK_WINDOW_QUERIES)
def test_topk_windows_ride_window_group_limit(spark, name):
    """Every per-query top-k in the ANN family must keep Spark's
    WindowGroupLimit rewrite (rank <= k pushed below the window's
    shuffle as a map-side partial top-k) — the difference between
    shuffling k rows per (query, partition) and shuffling the whole
    scored corpus. A refactor that breaks the rewrite pattern
    (e.g. filtering on a derived column) silently loses it."""
    df = entry.queries()[name](spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    assert "WindowGroupLimit" in buf.getvalue(), (
        f"{name}: WindowGroupLimit missing — top-k filter no longer "
        "pushes below the window shuffle"
    )
