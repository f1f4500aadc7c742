"""Forced-broadcast audit (VERDICT r3 #2 follow-through).

A pinned ``F.broadcast()`` hint overrides AQE's size check, so it is
only acceptable on relations whose size does NOT grow with the corpus:
trained models (centroids, PQ codebooks/LUTs), the query set, 1-row
scalars, eval-set n-grams, fixed dimension tables (nation=25,
region=5 rows), block-pair spines (num_blocks² rows), and per-domain
threshold tables (|domains| rows). Anything corpus-growing behind a
pinned hint is an executor OOM at 100 TB — the r3 ``lm_score`` defect
class, which slipped past the BNLJ-only plan audit because
broadcast-HASH-joins are not BNLJ.

Method: disable the size-based threshold (``-1``) and build every
query's plan from a COLD stand-in cache — any broadcast join left in
the static plan can only come from a pinned hint. Queries outside the
allowlist must plan hint-free (AQE still broadcasts their small sides
at runtime; this guards the DEGRADATION path, not the bench-scale
plan).

The stand-in cache must be cold because ``plans/standins.py``
materializes per-session DataFrames whose cached InMemoryRelation
embeds the plan compiled under the threshold in effect at persist
time — AQE's legitimate runtime broadcasts would read as false
positives.
"""

import contextlib
import io
import re

import pytest

import __spark_entry__ as entry
from sea_express_customs_etl_spark.plans import standins

SF_DIR = "/root/testdata/sf0.001"

FORCED_BROADCAST_ALLOWED = {
    "hashed_doc_clusters",  # trained k·dim centroid broadcasts (the
    #                         kmeans_ivf_topk license)
    "pretrain_e2e",        # per-SOURCE UniMax allocation table — the
    #                        source set is a bounded domain vocabulary
    #                        (nation/region license), model-sized at
    #                        any corpus scale
    "pretrain_e2e_datacard",  # same alloc pin via the shared selection
    "heaps_law_fit",       # |partitions|-row cumsum offsets (the
    #                        global_rank/global_cumsum license)
    "length_emd_drift",    # |sources|-row totals + 1-row corpus-N —
    #                        domain-bounded, model-sized at 100 TB
    "neyman_allocation_sample",  # 1-row budget scalar + |strata|-row
    #                              allocation caps (priority domain)
    "domain_reweight_mw",  # 1-row corpus-N / per-round weighted-mean
    #                        scalars (chi2 license)

    "copurchase_negatives",  # 1-row |catalog| scalar + |partitions|-row
    #                          rank offsets (the global_rank license)
    "chi2_features",       # 1-row (N, N_pos) totals (the 1-row license)
    "curriculum_shards",   # |partitions|-row rank offsets + lm_score 1-row
    #                        V scalar (the global_rank/lm_terciles license)
    "lpa_modularity",      # 1-row m / e_in scalars (the 1-row license)
    "cosine_topk",         # query set (10 vectors)
    "ann_ivf_nprobe2",     # centroids + probe ranking table
    "kmeans_ivf_topk",     # trained centroids (k=8)
    "ivf_near_dups",       # centroids
    "semantic_dedup",      # centroids feeding the IVF blocking
    "embedding_near_dups",  # block-pair spine (num_blocks² rows)
    "pq_codes",            # PQ codebook (m·k entries)
    "pq_topk",             # codebook + per-query LUT
    "ivfpq_topk",          # coarse centroids + residual codebook + LUT
    "ivfpq_nprobe2",       # same, LUT = |queries|·nprobe·m·k rows
    "decontaminate",       # eval-set n-grams (eval-sized, correct side)
    "tfidf_top_terms",     # 1-row corpus-size N
    "tfidf_cosine_pairs",  # 1-row corpus-size N (IDF scalar)
    "events_gapfill_locf",  # 1-row (lo, hi) hour bounds
    "lm_score",            # 1-row vocabulary-size V (counts NOT pinned)
    "perplexity_gain_select",  # lm_score V + trigram_backoff N 1-row
    #                            scalars (count tables NOT pinned)
    "token_burstiness",    # 1-row corpus-size N (counts NOT pinned)
    "value_psi_drift",     # 1-row totals + global_rank offsets
    "hill_tail_index",     # 1-row floor-value scalar pin
    "split_srm_check",     # 3-literal-row weights + 1-row total pins
    "psm_att_lift",        # trained B=64 model + 1-row caliper/ATT
    #                        scalar pins
    #                        (edge list enters as literals, not a pin)
    "pca_label_anova",     # 1-row grand-moment + 1-row SSW pins
    #                        (label table NOT pinned)
    "knn_label_vote",      # trained centroids + probe table pins
    #                        (the kmeans_ivf_topk license; train-label
    #                         join NOT pinned)
    "knn_adc_vote",        # shared-store pins + LUT (ann_store_topk
    "ann_hard_negatives",  # same shared-store pins (knn_adc license)
    "training_cartography",  # 3 pinned B=64-row epoch-snapshot models
    #                          (the learned_quality_filter license)
    #                        license; label joins NOT pinned)
    "isotonic_calibration",  # bucket-grain spine pins (model-sized)
    #                          + the deciles chain's trained model
    "split_conformal",     # 1-row moments/quantile pins +
    #                        |partitions|-row rank offsets
    "conformal_label_sets",  # same pins + the trained B=64 model
    #                          (the classifier_auc license)
    "kmeans_label_ari",    # trained centroid + 1-row pair-sum pins
    #                        (label join NOT pinned)
    "domain_mix_sample",   # per-domain targets/budget/thresholds
    "bpe_token_counts",    # same distinct-word dictionary dial as
    #                        bpe_encode_fixed (learned merges)
    "bpe_fertility_by_source",  # same distinct-word dictionary dial
    "wordpiece_fertility_by_source",  # same dictionary dial (wp encode)
    "bpe_encode_fixed",    # distinct-word dictionary (documented dial —
    #                        Heaps-law growth, pinned because the
    #                        dictionary-encode design depends on it)
    "bloom_filter_probe",  # Bloom word table (≤2048 rows, ~16 KB)
    "revenue_by_nation",   # nation (25 rows) + region (5 rows)
    "nation_revenue_share",  # nation (25 rows)
    "random_project",      # ±1 plane matrix (dim × n_planes = 1024 rows)
    "srp_near_dups",       # same plane matrix feeding srp_signatures
    "nation_year_pivot",   # nation (25 rows)
    "dsir_scores",         # per-bucket weight table (B=1024 rows, fixed)
    "learned_quality_filter",  # trained B=64-row perceptron model join
    "uncertainty_sample_topk",  # same trained B=64-row model pin
    "corpus_datacard",     # 1-row corpus-total scalar
    "event_value_qsketch",  # quantile-spec table (3 literal rows)
    "lm_terciles",         # 1-row total-N + |partitions|-row rank offsets
    "pmi_collocations",    # 1-row bigram-total N (count tables NOT pinned)
    "domain_kl_divergence",  # 1-row (T, V) + |domains|-row totals
    "sq8_codes",           # 1-row (lo_arr, span_arr) trained quantizer
    "sq8_topk",            # same 1-row stats + query set
    "mrl_recall_curve",    # cosine_topk's query-set pin, 4 dims
    "hard_negative_mine",  # 10-anchor query-set pin + the
    #                        ivf_near_dups centroid pin
    "trigram_backoff",     # 1-row total-N scalar (count tables NOT pinned)
    "key_skew_stats",      # 1-row total-rows scalar
    "pretrain_prep_pack",  # bpe distinct-word dictionary (same dial
    #                        as bpe_encode_fixed)
    "ann_recall_matrix",   # composes the pinned ANN queries above +
    #                        a |queries|·5-row truth table
    "pq_trained_codebook",  # trained codebook model (m·k entries) +
    #                         coarse centroids
    "cms_heavy_hitters",   # d·w cell table + 1-row total (model-sized)
    "ann_store_topk",      # frozen centroids + codebook + LUT + marker
    "ann_store_delete_topk",  # same pins + the del-batch marker
    "ann_store_compact_topk",  # same pins over the compacted
    #                            generation (one marker row)
    "mmr_ann_rerank",      # composes the ann_store/refine pins +
    #                        the model-sized candidate-vector broadcast
    #                            table (|batches| rows)
    "facility_coreset_select",  # pinned fixed 32-vector pool
    #                               broadcast (model-sized at any scale)
    #                        table (all model-sized)
    "event_winsorized_sums",  # 2-literal-row quantile-spec table
    "order_value_gini",    # |partitions|-row rank-offset broadcast
    #                        (the global_rank license, as lm_terciles)
    "pps_length_sample",   # |partitions|-row cumsum offsets + 1-row
    #                        total weight (the global_rank license)
    "ivfpq_trained_topk",  # trained codebook + centroids + LUT —
    #                        same pins as ivfpq_nprobe2
    "ann_refined_topk",    # same trained-index pins + the model-sized
    #                        candidate list / query-vector broadcasts
    #                        of the refine stage
    "knowledge_ivm_stream",  # commit-marker table broadcast
    #                          (|batches| rows — the ann_store license)
    "winnow_incremental",  # commit-marker table broadcast (|batches|
    #                        rows — same license as knowledge_ivm_stream)
    "knowledge_ivm_delete",  # same commit-marker license (add + retract)
    "winnow_delete_pairs",   # add/del marker + tombstone-marker tables
    "dedup_incremental_delete",  # same marker licenses over the
    #                              signature store
    "multisignal_dedup_v2",  # ivf_near_dups' 16-row centroid pin
    #                          (model-sized at any scale)
    "snm_part_pairs",      # |partitions|-row rank-offset broadcast
    #                        (the global_rank license, as order_value_gini)
    "part_price_size_skyline",  # |partitions|-row prior-max offsets
    #                             (the global_rank license)
    "bm25_doc_topk",       # pinned query-term table (human-query-sized)
    #                        + 1-row (N, avgdl) corpus scalars
    "hybrid_rrf_topk",     # composes bm25 + coverage — same query-term
    #                        and 1-row scalar pins
    "purchase_hits_authorities",  # 1-row L∞ normalization scalar per
    #                               half-step (the modularity license)
    "order_benford_digits",  # 1-row total + 9-literal-row expectation
    #                          table (the 1-row/literal license)
    "segment_priority_lift",  # 1-row grand total (the 1-row license)
    "event_mad_outliers",  # 1-literal-row quantile-spec broadcast per
    #                        median pass (the event_value_qsketch class)
    "join_size_estimate",  # 1-row true-count scalar (the 1-row license)
    "doc_top_terms",       # 1-row corpus-size N (the tfidf license)
    "basket_rules",        # 1-row order-count scalar (the 1-row license)
    "customer_rfm",        # |partitions|-row rank offsets ×3 + 1-row N
    #                        (the global_rank/lm_terciles license)
    "classifier_confusion",  # trained B=64-row model broadcast (the
    #                          learned_quality_filter license)
    "averaged_classifier_confusion",  # same trained B=64-row model
    #                                   broadcast (averaged weights)
    "temperature_mix_alloc",  # pinned 1-row Σweight scalar (the 1-row
    #                           license)
    "segment_conversion_ztest",  # pinned 1-row (N, K) totals (the
    #                              1-row license)
    "nation_revenue_mom",  # pinned nation dim (25 rows — the
    #                        revenue_by_nation license)
    "cf_holdout_hitrate",  # pinned 1-row hit-count scalar (the 1-row
    #                        license)
    "token_vote_confusion",  # pinned 1-row totals (the chi2 license)
    "revenue_pareto",  # pinned 1-row totals + |partitions|-row cumsum
    #                    offsets (the global_rank/pps license)
    "peak_concurrency",  # |partitions|-row cumsum offsets (the
    #                      global_rank/pps license)
    "nation_trade_flows",  # pinned nation dim x2 (25 rows — the
    #                        revenue_by_nation license)
    "idle_rich_customers",  # pinned 1-row scalar-avg frame
    "part_min_cost_supplier",  # pinned nation x region dim chain
    #                            (the revenue_by_nation license)
    "cuped_adjusted_lift",  # pinned 1-row global-moments frame
    "important_parts_value",  # pinned 1-row global-total scalar
    "top_supplier_revenue",  # pinned 1-row scalar-max frame
    "excess_share_suppliers",  # pinned nation dim (25 rows)
    "nation_market_share",  # pinned nation x region chain + 1-row
    #                         target-nation key
    "nation_year_profit",  # pinned nation dim (25 rows)
    "bootstrap_value_ci",  # pinned |event_type|-row group-size frame
    #                        (bounded type dictionary — the 1-row
    #                        license at dictionary grain)
    "customer_decile_migration",  # 1-row population counts + the
    #                               |partitions|-row global_rank
    #                               offsets (the global_rank license)
    "did_lift",  # pinned 1-row control-cell frame (the cuped license)
    "tree_depth2_length",  # pinned 1-row root-winner threshold
    "event_type_median",  # |groups|-row median-position frame + the
    #                       global_rank offsets (the global_rank license)
    "event_trimmed_sums",  # |groups|-row trim-bounds frame + the
    #                        global_rank offsets (same license)
    "consistent_hash_rebalance",  # pinned 144-row vnode ring (fixed
    #                               shards·vnodes — model-sized)
    "classifier_auc",  # trained B=64-row model broadcast + the
    #                    global_cumsum |partitions|-row offsets
    #                    (learned_quality_filter + global_rank licenses)
    "classifier_score_deciles",  # same trained-model broadcast + the
    #                              global_rank offsets + 1-row ntile N
    "kneser_ney_bigram",  # pinned 1-row bigram-type-count scalar
    "source_quantile_norm",  # 1-row total-N + global_rank offsets +
    #                          lm_score's 1-row V (the lm license)
    "preference_pairs",  # lm_score's 1-row V scalar (the lm license)
    "vocab_coverage_curve",  # 1-row totals scalar + global_rank
    #                          offsets (the global_rank license)
    "lm_slice_report",  # lm_score's 1-row V scalar (the lm license)
    "retrieval_ndcg",  # bm25's pinned query-term table + 1-row
    #                    (N, avgdl) scalars (the bm25_doc_topk license)
    "retrieval_map_mrr",  # same bm25 pins + the |queries|-row term-
    #                       count table (model-sized by definition)
    "ranking_rbo",        # same bm25/fusion pins
    "facility_coreset_ann",  # the ann_store frozen-model pins + the
    #                          fixed 32-vector pool broadcast (the
    #                          facility_coreset_select license)
    "sketch_rebuild_survivors",  # commit-marker table broadcast
    #                              (|batches| rows — the ann_store/
    #                              knowledge_ivm_stream license)
    "sketch_compact_merged",  # same commit-marker broadcast license
    #                           (one folded-generation row)
}


def _clear_caches(spark) -> None:
    # stand-ins: per-session dict of persisted DataFrames
    for df in standins._MATERIALIZED.values():
        with contextlib.suppress(Exception):
            df.unpersist()
    standins._MATERIALIZED.clear()
    # everything else: Spark's CacheManager matches persist()ed plans
    # STRUCTURALLY, so a pipeline-internal persist() from an earlier
    # test (compiled under the default threshold, with AQE's legitimate
    # runtime broadcasts baked in) would be substituted into the plan
    # built here and read as a false positive
    spark.catalog.clearCache()


@pytest.fixture(scope="module")
def no_auto_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    _clear_caches(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # drop anything compiled under -1 so later tests re-materialize
    # under the normal threshold
    _clear_caches(spark)


@pytest.mark.parametrize("name", sorted(entry.queries()))
def test_no_forced_broadcast_of_growing_relations(no_auto_broadcast, name):
    if name in FORCED_BROADCAST_ALLOWED:
        pytest.skip("pinned broadcast by design (see allowlist)")
    df = entry.queries()[name](no_auto_broadcast, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    assert not re.search(
        r"\(\d+\) Broadcast(HashJoin|NestedLoopJoin)", buf.getvalue()
    ), (
        f"{name}: pinned broadcast hint survives threshold=-1 — a "
        f"corpus-growing build side here OOMs at scale; drop the hint "
        f"(AQE broadcasts small sides at runtime) or allowlist with a "
        f"bounded-size justification"
    )
