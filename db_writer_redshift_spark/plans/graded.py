"""The driver's CORRECTNESS grading window, curated.

The external harness grades exactly the FIRST 50 entries of
``__spark_entry__.queries()`` in registration order. Round 1 registered
the 51 relational queries first, so all LLM-pipeline, temporal,
sampling/graph, and extra-TPC-H queries fell outside the window and got
no correctness row (VERDICT.md round 1, finding #1).

``GRADED_FIRST`` pins the window; ``plans/__init__.py`` reorders the
registry so these names come first, and ``tests/test_graded_window.py``
locks the ordering against regressions: new registrations land AFTER
the window unless this list changes too.

Rotation plan: CORRECTNESS files accumulate per round; the union of
rounds covers the full registry (tools/correctness_union.py rolls it
up). Round 4 graded 50/50 green (union 156/245, zero fails across all
four rounds). Since round 5 the family-coverage invariant is enforced
over the UNION of past driver rounds plus the current window (every
family already holds at least one green driver row, so per-round
keeper slots would only re-prove old work while 89 names still lacked
any row). That frees all 50 slots for first-time names.

Round-4 close certification: the ENTIRE 245-name registry passed the
dtype-faithful tools/oracle_check.py at BOTH sf0.01 (the driver's gate
scale) and sf0.1 (245/245 in one run), so every name below is
pre-certified at 10x the gate scale; re-certified at round-5 close.

ROUND-6 CLOSE-OUT WINDOW (closes the registry at 252/252 graded at
least once; 46 never-graded names remain after round 5 — the 39
deferred names plus round 5's seven additions — leaving 4 slots for
keepers / re-proves of anything round 5 flags):
  * the 30 oracle-bearing names deferred from round 5:
    mix_doremi_weights, quality_prune_sweep, vocab_collocations_lift,
    cluster_label_purity, lang_confusion_matrix, events_trend_slope,
    events_conversion_latency_hist, events_concurrency_peak,
    events_top_session_paths, graph_clustering_coeff_parts,
    customer_rfm_segments, assoc_rules_copurchase,
    dq_benford_order_totals, vocab_topk_terms, sample_weighted_priority,
    sample_neyman_allocation, sketch_countmin_portable,
    er_part_name_matches, text_rare_bigram_rate,
    curriculum_quality_phases, dedup_ppjoin_exact, er_entity_clusters,
    dedup_span_coverage, pareto_quality_length_frontier,
    dedup_minhash_recall_audit (sample contract enforced in code as of
    round 5), text_winnowing_fingerprints, index_posting_gaps,
    privacy_k_anonymity_customer, plus the two documented non-scale
    baselines dedup_embedding_cosine and ann_brute_force_topk;
  * the 9 oracle=None names (rows-only by design — pytest accuracy
    contracts): dedup_minhash_lsh, dedup_simhash_pairs,
    dedup_embedding_lsh, ann_lsh_topk, ann_ivf_topk,
    text_rolling_fingerprint, kmeans_fit_clusters,
    embedding_pca_eigvals, hll_partial_union_rollup;
  * the round-5 additions (all certified at sf0.001/0.01 this round,
    several at sf0.1): streaming_near_dup_batch_twin,
    streaming_token_budget_batch_twin, multimodal_audio_decode,
    multimodal_image_decode, text_ngram_novelty,
    pack_padding_efficiency_sweep, retrieval_ndcg_audit;
  * then keepers / re-proves in the remaining ~4 slots.
"""

from __future__ import annotations

GRADED_FIRST: list[str] = [
    # ---- ROUND-5 WINDOW ----------------------------------------------
    # Round-4 result: 50/50 green (zero fails across four rounds). All
    # 50 slots seat FIRST-TIME names — the family invariant moved to
    # union semantics (see module docstring), so no slot re-proves a
    # green row. Every name passed tools/oracle_check.py at sf0.01 and
    # sf0.1 at the round-4 close and was re-certified this round.
    #
    # The 15 never-graded TPC-H shapes (VERDICT r4 priority #1):
    "q4_order_priority_checking",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q10_returned_items",
    "q11_part_value_concentration",
    "q12_priority_by_linestatus",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q19_disjunctive_filter",
    "q20_excess_volume_suppliers",
    "q21_waiting_suppliers",
    "q22_global_sales_opportunity",
    # Fresh family representatives (never-graded members of families
    # that previously consumed keeper slots):
    "events_cusum_drift",           # events
    "dedup_chunk_exact",            # dedup
    "ann_ivf_recall_audit",         # ann
    "text_lang_id",                 # text
    "pipeline_chunked_training_mix",  # pipelines
    "sample_rebalance_uniform",     # sampling
    "decontam_min_k_prob",          # decontam
    # Round-4 additions (certified at sf0.001/0.01/0.1 at round-4 close;
    # judge spot-checked several at sf0.01 — all PASS):
    "hist_equidepth_order_totals",
    "quantiles_cont_order_price",
    "weighted_quantiles_doclen",
    "incremental_agg_retractions",
    "stats_anova_returnflag_price",
    "dedup_containment_pairs",
    "drift_tv_source_matrix",
    "dataset_datasheet_per_source",
    "text_term_burstiness",
    "events_multitouch_attribution",
    "events_json_props_rollup",
    "events_funnel_three_step",
    "events_hazard_table",
    "mix_cluster_balance_weights",
    # Remaining never-graded text / vocab / mixing / quality names:
    "quality_dup_calibration",
    "embedding_norm_stats",
    "text_fingerprint",
    "text_rolling_fingerprint_portable",
    "text_repetition_scores",
    "pack_training_sequences",
    "vocab_topk_bigrams",
    "text_token_diversity",
    "mix_temperature_weights",
    "chargram_neighbor_pairs",
    "tokenizer_fertility_by_lang",
    "bpe_pair_merge_stats",
    "dedup_keep_best_quality",
    "embedding_lang_centroids",
]

WINDOW = 50
assert len(GRADED_FIRST) == WINDOW, len(GRADED_FIRST)
assert len(set(GRADED_FIRST)) == WINDOW, "duplicate name in GRADED_FIRST"
