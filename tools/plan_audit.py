"""Physical-plan audit: asserts the headline queries get the plans a
100 TB deployment needs (SURVEY.md §4.3). Run after any planner-visible
change:

    python tools/plan_audit.py            # audit all rules
    python tools/plan_audit.py q6_forecast_revenue   # subset

Checks, per query:
- pushdown:   parquet scan shows non-trivial PushedFilters
- pruned:     ReadSchema reads only the named columns (no SELECT *)
- broadcast:  BroadcastHashJoin planned (dim tables must not shuffle)
- no_bnl:     no BroadcastNestedLoopJoin / CartesianProduct anywhere
- partial:    partial aggregation before the exchange (map-side combine)
- codegen:    at least one WholeStageCodegen span (not fully interpreted)

Exit code 0 iff every rule holds.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.01"

# query -> rules; 'pruned:<n>' bounds the widest parquet ReadSchema field count
AUDITS: dict[str, list[str]] = {
    "q6_forecast_revenue": ["pushdown", "pruned:4", "partial", "codegen", "no_bnl"],
    "q1_pricing_summary": ["pushdown", "pruned:7", "partial", "codegen", "no_bnl"],
    "q3_shipping_priority": ["broadcast", "partial", "no_bnl", "codegen"],
    "q5_local_supplier_volume": ["broadcast", "partial", "no_bnl", "codegen"],
    "q4_late_shipment_priority": ["no_bnl", "partial", "codegen"],
    "q16_parts_never_ordered": ["no_bnl", "partial", "codegen"],
    # q22/sim_ivf: BroadcastNestedLoopJoin IS the right plan there — the
    # build side is a 1-row scalar aggregate / 16-row centroid table, so the
    # "nested loop" is a constant-width map-side fan-out, not O(n*m).
    "q22_idle_rich_customers": ["partial", "codegen"],
    "events_asof_join": ["no_bnl", "codegen"],
    "events_range_join": ["no_bnl", "codegen"],
    "events_tumbling_agg": ["partial", "codegen", "no_bnl"],
    "traffic_max_lane_flow": ["partial", "codegen", "no_bnl"],
    "dedup_minhash_lsh": ["no_bnl"],
    "dedup_simhash_pairs": ["no_bnl", "partial"],
    "dedup_jaccard_pairs": ["no_bnl", "partial"],
    "sim_embedding_near_dup": ["no_bnl"],
    "sim_lsh_near_dup": ["no_bnl"],
    # r8: list assignment is a pure map (literal codebook, array_max) —
    # no aggregate exists to be partial, and the corpus is never
    # exchanged before the candidate join. The two BNLs are the q22
    # constant-width shapes (queries x 16-centroid probe fan-out), so
    # no no_bnl rule; codegen pins the scan->assign->join pipeline.
    "sim_ivf_topk": ["codegen", "pruned:2"],
    "top_customers_per_nation": ["pruned:5", "codegen", "no_bnl", "bounded_single_partition"],
    "q10_returned_items": ["broadcast", "partial", "no_bnl", "codegen"],
    "q19_disjunctive_predicates": ["broadcast", "partial", "no_bnl", "codegen"],
    "q8_market_share": ["broadcast", "partial", "no_bnl", "codegen"],
    "text_chunks": ["codegen", "no_bnl"],
    "text_vocab_top_terms": ["partial", "no_bnl"],
    "events_pivot_by_type": ["partial", "codegen", "no_bnl"],
    "events_funnel": ["partial", "codegen", "no_bnl"],
    "events_user_zscore": ["partial", "codegen", "no_bnl"],
    "grouping_sets_revenue": ["partial", "codegen", "no_bnl"],
    "q15_top_supplier": ["partial", "codegen"],
    "q17_small_quantity_revenue": ["broadcast", "partial", "no_bnl"],
    "docs_hash_sample": ["pruned:3", "codegen", "no_bnl"],
    # the prefix sum must be the two-pass range-partitioned shape —
    # a per-group window alone would be one sort task per language
    "docs_pack_budget": ["codegen", "no_bnl", "range_partition"],
    # candidate dedup is a distinct (HashAggregate with no agg functions,
    # so no "partial" marker in the plan string); map-side combine is
    # visible as the pre-exchange HashAggregate
    "supplier_name_near_dups": ["no_bnl", "codegen"],
    "emb_center_by_label": ["partial", "no_bnl"],
    "docs_curation_pipeline": ["partial", "codegen", "no_bnl"],
    "orders_monthly_growth": ["partial", "codegen", "no_bnl"],
    "events_variant_props": ["partial", "codegen", "no_bnl"],
    "events_sessionize_dynamic": ["partial", "codegen", "no_bnl"],
    "events_top_types_sketch": ["partial", "no_bnl"],
    "events_column_profile": ["partial", "codegen", "no_bnl"],
    # gap-fill's calendar side is a 1-row agg exploded to O(months) rows;
    # the left join against it must still be a hash join, not a BNL.
    "orders_month_gapfill": ["partial", "codegen", "no_bnl"],
    "lineitem_corr_stats": ["partial", "codegen", "no_bnl", "pruned:3"],
    "docs_split_decontamination": ["partial", "codegen", "no_bnl"],
    # round-4 operators: linear scans must stay in codegen with pruned
    # reads; mix-weights is an agg + two broadcast 1-row aggregates
    "text_repetition_filter": ["codegen", "no_bnl", "pruned:2"],
    "text_pii_redact": ["codegen", "no_bnl", "pruned:2"],
    "docs_mix_weights": ["partial", "codegen", "pruned:1"],
    "emb_quantize_int8": ["codegen", "no_bnl", "pruned:2"],
    # unigram_logprob's BNL is the 1-row corpus-total broadcast (constant
    # width), the same allow-listed shape as q22's scalar subquery
    "text_unigram_logprob": ["partial", "codegen", "pruned:2"],
    "docs_token_budget_plan": ["partial", "codegen", "pruned:2"],
    "events_winsorize": ["broadcast", "partial", "codegen", "no_bnl"],
    "docs_source_vocab_overlap": ["partial", "no_bnl", "pruned:2"],
    # round-5 TPC-H completion: star dims must broadcast, aggregates must
    # partial, and the semi/anti correlations must plan as hash joins
    "q2_min_cost_supplier": ["broadcast", "partial", "no_bnl", "codegen"],
    "q9_product_type_profit": ["broadcast", "partial", "no_bnl", "codegen"],
    # q11's BNL is the 1-row grand-total broadcast (scalar-subquery HAVING),
    # the same allow-listed constant-width shape as q22
    "q11_important_stock": ["broadcast", "partial", "codegen"],
    "q12_shipmode_priority": ["partial", "no_bnl", "codegen", "pushdown"],
    "q20_promo_part_suppliers": ["broadcast", "partial", "no_bnl", "codegen"],
    "q21_late_suppliers": ["partial", "no_bnl", "codegen"],
    # skew-capped LSH: the cap filter must stay a hash-agg + hash join on
    # the band key (no nested loop), with map-side partial counts
    "dedup_minhash_lsh_capped": ["no_bnl", "partial"],
    "dedup_clusters_star": ["no_bnl"],
    # round-5 operators
    "docs_pack_bins": ["codegen", "no_bnl", "range_partition"],
    "events_session_funnel_windowed": ["partial", "codegen", "no_bnl"],
    "docs_minhash_containment": ["partial", "no_bnl"],
    "events_interval_overlap_count": ["partial", "codegen", "no_bnl", "pruned:3"],
    "docs_quality_gate_report": ["partial", "codegen", "no_bnl", "pruned:2"],
    # PQ's broadcast is a 4-row codebook crossJoin (constant-width
    # fan-out, the allow-listed shape) — no no_bnl rule
    "emb_pq_codes": ["partial", "pruned:2"],
    "docs_shingle_novelty": ["partial", "no_bnl", "pruned:2"],
    # ADC's nested-loop joins are the 4-row codebook and the per-query
    # lookup table (constant-width broadcasts); the codes join itself
    # must stay a hash join
    "sim_pq_adc_topk": ["partial", "pruned:2"],
    "events_scd2_intervals": ["partial", "codegen", "no_bnl", "pruned:4"],
    "text_bigram_logprob": ["partial", "no_bnl", "pruned:2"],
    "orders_rfm_segments": ["partial", "codegen", "no_bnl", "pruned:3", "bounded_single_partition"],
    "events_hourly_seasonality": ["partial", "codegen", "no_bnl", "pruned:2"],
    "docs_dedup_survivorship": ["no_bnl"],
    "events_resample_ffill": ["partial", "codegen", "no_bnl", "pruned:3"],
    "docs_importance_resample": ["partial", "codegen", "pruned:4"],
    "part_price_equidepth": ["partial", "codegen", "no_bnl", "pruned:2", "bounded_single_partition"],
    "events_mad_outliers": ["partial", "no_bnl", "pruned:2"],
    "events_cohort_retention": ["partial", "codegen", "no_bnl", "pruned:2"],
    "events_markov_transitions": ["partial", "codegen", "no_bnl", "pruned:4"],
    # pareto's 1-row total broadcast is the allow-listed scalar shape
    "orders_abc_pareto": ["partial", "codegen", "pruned:2", "bounded_single_partition"],
    "dedup_cluster_stats": ["no_bnl"],
    "events_funnel_step_latency": ["partial", "no_bnl", "pruned:3"],
    # JL projection: the sign matrix must broadcast (never shuffle the
    # exploded components against it) and the dot products must partial.
    # Its one BNL is the 8x64 constant sign-grid crossJoin (the
    # allow-listed constant-width shape); the component join itself is
    # asserted broadcast-hash by the 'broadcast' rule.
    "emb_random_projection": ["broadcast", "partial", "pruned:2"],
    # incremental dedup is two min-aggregates + hash joins on the
    # fingerprint — no window sort, no nested loop
    "docs_incremental_dedup": ["partial", "no_bnl", "codegen", "pruned:2"],
    # nearest join: bucketed equi-join (hash, never BNL despite the
    # |dt| predicate) + struct-min aggregate with map-side combine
    "events_nearest_join": ["partial", "no_bnl", "codegen", "pruned:5"],
    # ewma: one bounded window rank + partial-aggregated weighted sum
    "events_ewma": ["partial", "codegen", "no_bnl", "pruned:4"],
    # substring dup: shingle self-join must stay a hash join with
    # map-side distinct before the exchange
    "text_substring_dup": ["no_bnl", "pruned:2"],
    # PIT join: one union-window exchange via asof machinery, no BNL
    "events_point_in_time_join": ["partial", "no_bnl", "codegen", "pruned:5"],
    # rolling actives: map-side distinct + explode; the max-hour scalar
    # is the allow-listed 1-row broadcast
    "events_rolling_active_users": ["partial", "codegen", "pruned:2"],
    "events_psi_drift": ["partial", "codegen", "no_bnl", "pruned:3"],
    "emb_norm_outliers": ["broadcast", "partial", "no_bnl", "pruned:3"],
    # bloom probe must stay inside codegen (literal-array bit tests, no
    # Python). The exact verify join carries NO broadcast hint (r8): the
    # eval-side aggregate is only bounded for realistic eval sets, so
    # AQE decides broadcast-vs-shuffle from runtime stats; the static
    # (audit-mode, AQE-off) plan is the shuffled-join fallback, and the
    # rule asserts it stays a hash join on bloom-pruned candidates.
    "docs_bloom_decontaminate": ["partial", "no_bnl", "codegen"],
    "events_zorder_layout": ["partial", "codegen", "no_bnl", "pruned:2"],
    # skew report crossJoins a broadcast 1-row totals aggregate — the BNL
    # is a constant-width fan-out (q22 exception), so no no_bnl rule
    "orders_join_skew_report": ["partial", "codegen", "pruned:1"],
    "docs_ngram_dup_rate": ["partial", "codegen", "no_bnl"],
    "events_arrival_lateness": ["partial", "codegen", "no_bnl", "pruned:4"],
    "events_salted_distinct_users": ["partial", "codegen", "no_bnl", "pruned:2"],
    # tfidf crossJoins a broadcast 1-row corpus-size aggregate (q22
    # exception applies to the BNL it plans)
    "docs_tfidf_top_terms": ["broadcast", "partial", "codegen"],
    "orders_top_percentile": ["codegen", "no_bnl", "pruned:3", "bounded_single_partition"],
    "events_dq_checks": ["partial", "codegen", "no_bnl", "pruned:5"],
    "events_snapshot_diff": ["partial", "codegen", "no_bnl", "pruned:3"],
    "events_feature_hash": ["partial", "codegen", "no_bnl", "pruned:3"],
    "events_daily_value_quantiles": ["partial", "no_bnl", "pruned:2"],
    "text_readability": ["codegen", "no_bnl", "pruned:2"],
    # chi2 crossJoins a broadcast 1-row total (q22 BNL exception)
    "events_chi2_independence": ["broadcast", "partial", "codegen", "pruned:2"],
    "events_latest_per_user": ["partial", "codegen", "no_bnl", "pruned:5"],
    "events_gap_duration_stats": ["partial", "codegen", "no_bnl", "pruned:4"],
    "orders_running_total": ["codegen", "no_bnl", "pruned:4"],
    "events_daily_autocorr": ["partial", "codegen", "no_bnl", "pruned:2"],
    # basket/division crossJoin broadcast 1-row totals (q22 BNL exception)
    "lineitem_basket_pairs": ["broadcast", "partial", "codegen"],
    "suppliers_full_nation_parts": ["broadcast", "partial", "codegen", "no_bnl"],
    "events_user_streaks": ["partial", "codegen", "no_bnl", "pruned:2"],
    "orders_revenue_yoy_growth": ["partial", "codegen", "no_bnl", "pruned:3"],
    "orders_customer_gini": ["partial", "codegen", "no_bnl", "pruned:2", "bounded_single_partition"],
    "events_attribution_first_touch": ["partial", "codegen", "no_bnl", "pruned:4"],
    "docs_cross_source_dup_matrix": ["partial", "codegen", "no_bnl", "pruned:3"],
    "events_burst_detection": ["broadcast", "partial", "codegen", "no_bnl", "pruned:2"],
    "events_user_lifecycle": ["partial", "codegen", "no_bnl", "pruned:2"],
    "events_trailing_hour_sum": ["codegen", "no_bnl", "pruned:5"],
    "events_multi_distinct_profile": ["partial", "codegen", "no_bnl", "pruned:3"],
    "events_model_score": ["codegen", "no_bnl", "pruned:5"],
    "events_k_anonymity": ["partial", "codegen", "no_bnl", "pruned:3"],
    "events_weekend_ttest": ["partial", "codegen", "no_bnl", "pruned:3"],
    "emb_dim_variance": ["partial", "no_bnl", "pruned:1"],
    "docs_dedup_threshold_sweep": ["no_bnl", "partial"],
    "events_sequence_violations": ["partial", "codegen", "no_bnl", "pruned:3"],
    "lineitem_supplier_hhi": ["broadcast", "partial", "codegen", "no_bnl"],
    # benford crossJoins a broadcast 1-row total (allow-listed BNL shape)
    "events_value_benford": ["partial", "codegen", "pruned:1"],
    "events_bounce_rate": ["partial", "codegen", "no_bnl", "pruned:4"],
    "events_top_minutes_with_ties": ["partial", "codegen", "no_bnl", "pruned:2"],
    "docs_vocab_growth": ["partial", "codegen", "no_bnl", "pruned:3"],
    "docs_jsonl_ingest": ["partial", "no_bnl"],
    "docs_langid_confusion": ["broadcast", "partial", "codegen", "no_bnl"],
    "sim_lsh_recall_eval": ["partial"],
    "dedup_minhash_error_eval": ["no_bnl", "partial"],
    "events_session_duration_histogram": ["partial", "codegen", "no_bnl", "pruned:3"],
    # separability crossJoins the broadcast 8-row centroid table
    # (constant-width fan-out, allow-listed BNL shape)
    "emb_label_separability": ["partial", "pruned:2"],
    "orders_size_distribution": ["partial", "codegen", "no_bnl", "pruned:1"],
    "events_peak_concurrent_sessions": ["partial", "codegen", "no_bnl", "pruned:3", "bounded_single_partition"],
    "docs_dq_by_source": ["partial", "codegen", "no_bnl", "pruned:4"],
    "events_dow_anova": ["partial", "codegen", "no_bnl", "pruned:3"],
    "emb_quantization_report": ["partial", "no_bnl", "pruned:3"],
    "events_type_entropy": ["broadcast", "partial", "codegen", "no_bnl", "pruned:2"],
    "docs_lang_diversity": ["broadcast", "partial", "codegen", "no_bnl", "pruned:2"],
    "docs_char_trigram_profile": ["partial", "codegen", "no_bnl", "pruned:2"],
    "events_hourly_variance_explained": ["partial", "codegen", "no_bnl", "pruned:3"],
    "events_user_powerlaw_alpha": ["partial", "no_bnl", "pruned:1"],
    "events_bot_users": ["partial", "codegen", "no_bnl", "pruned:3"],
    "events_attribution_latency": ["partial", "codegen", "no_bnl", "pruned:4"],
    "docs_hash_partition_balance": ["partial", "codegen", "no_bnl", "pruned:1"],
    "lineitem_brand_price_qty_corr": ["broadcast", "partial", "codegen", "no_bnl"],
    "orders_customer_lifetime": ["partial", "codegen", "no_bnl", "pruned:2"],
    "events_kpi_summary": ["partial", "codegen", "no_bnl", "pruned:4"],
    "events_transition_entropy": ["broadcast", "partial", "codegen", "no_bnl", "pruned:4"],
    "supplier_acctbal_boxstats": ["partial", "no_bnl", "pruned:2"],
    "orders_reorder_consistency": ["partial", "codegen", "no_bnl", "pruned:3"],
    "docs_dedup_savings": ["partial", "codegen", "no_bnl", "pruned:3"],
    "part_type_hierarchy_stats": ["partial", "codegen", "no_bnl", "pruned:2"],
    "docs_neardup_degree_distribution": ["no_bnl", "partial"],
    "events_time_to_first_purchase": ["partial", "codegen", "no_bnl", "pruned:3"],
    "orders_segment_priority_mix": ["broadcast", "partial", "codegen", "no_bnl"],
    "events_daily_drawdown": ["partial", "codegen", "no_bnl", "pruned:3"],
    "docs_quality_length_matrix": ["partial", "codegen", "no_bnl", "pruned:3"],
    "lineitem_returns_by_brand": ["broadcast", "partial", "codegen", "no_bnl"],
    # profile pairs join is a broadcast of the tiny per-type profile
    # table under an inequality predicate (constant-width BNL shape)
    "events_hourly_profile_similarity": ["partial", "pruned:2"],
    "emb_centroid_drift": ["partial", "no_bnl", "pruned:3"],
    # per-edge 1-row orphan aggregates crossJoin in (allow-listed shape)
    "ri_check_report": ["partial", "codegen"],
    "lineitem_linenumber_integrity": ["partial", "codegen", "no_bnl", "pruned:2"],
    # p-chart crossJoins the broadcast 1-row center line (allow-listed)
    "events_error_pchart": ["partial", "codegen", "pruned:2"],
    "docs_dup_shardability": ["partial", "codegen", "no_bnl", "pruned:3"],
    # lorenz crossJoins the broadcast 1-row totals (allow-listed shape)
    "events_lorenz_concentration": ["partial", "codegen", "pruned:2", "bounded_single_partition"],
    "docs_fingerprint_collision_rate": ["partial", "codegen", "no_bnl", "pruned:2"],
    "supplier_portfolio_breadth": ["partial", "codegen", "no_bnl", "pruned:2"],
    # lift crossJoins a broadcast 1-row session total (allow-listed).
    # r15: the basket aggregation runs ONCE inside the construct-time
    # localCheckpoint (the dedup_clusters/sim_semantic_dedup_clusters
    # precedent), so the declared plan reads the checkpointed tiny
    # aggregate and carries no partial-agg node itself — "partial"
    # dropped like those two entries.
    "events_session_type_lift": ["broadcast", "codegen"],
    # churn crossJoins the broadcast 1-row horizon (allow-listed shape)
    "events_churn_risk": ["partial", "codegen", "pruned:3"],
    "orders_cohort_repeat": ["partial", "codegen", "no_bnl", "pruned:3"],
    "events_user_icc": ["partial", "no_bnl", "pruned:2"],
    "orders_month_seasonal_index": ["broadcast", "partial", "codegen", "no_bnl"],
    "lineitem_ship_lag_profile": ["partial", "codegen", "no_bnl", "pruned:3"],
    "events_first_session_conversion": ["partial", "codegen", "no_bnl", "pruned:4"],
    "orders_status_year_matrix": ["broadcast", "partial", "codegen", "no_bnl"],
    # 1-NN probe panel is a broadcast crossJoin (cosine_topk shape)
    "emb_1nn_label_consistency": ["partial", "pruned:3"],
    "orders_basket_size_trend": ["partial", "codegen", "no_bnl", "pruned:2"],
    "supplier_quartile_mobility": ["partial", "codegen", "no_bnl", "pruned:3", "bounded_single_partition"],
    # --- round-6 completion: every registry query (minus the 7
    # streaming-parity/E2E queries that execute on construction, listed
    # in PLAN_AUDIT_EXEMPT) carries at least codegen [+ no_bnl where the
    # plan has no allow-listed constant-width broadcast crossJoin]. The 4
    # entries without no_bnl plan a deliberate BNL: sim_cosine_topk's
    # brute-force broadcast crossJoin baseline and text_salient_terms'
    # 1-row corpus-total broadcast. (sim_kmeans_assign /
    # docs_cluster_balanced_sample lost their centroid fan-out BNL in
    # r8 — assignment is a literal-codebook map now, so no_bnl holds.)
    "starter_pipeline": ["no_bnl", "codegen"],
    "traffic_lane_info": ["no_bnl", "codegen", "partial"],
    "traffic_max_lane_flow_tumbling": ["no_bnl", "codegen", "partial"],
    "events_sliding_agg": ["no_bnl", "codegen", "partial"],
    "events_sessionize": ["no_bnl", "codegen", "partial"],
    "events_salted_agg": ["no_bnl", "codegen", "partial"],
    "cube_order_stats": ["no_bnl", "codegen", "partial"],
    "events_running_sum": ["no_bnl", "codegen"],
    "events_value_percentiles": ["no_bnl", "codegen", "partial"],
    "events_json_props": ["no_bnl", "codegen", "partial"],
    "q14_promo_effect": ["no_bnl", "codegen", "partial"],
    "text_token_stats": ["no_bnl", "codegen"],
    "text_language_id": ["no_bnl", "codegen"],
    "text_quality_score": ["no_bnl", "codegen"],
    "text_fingerprint": ["no_bnl", "codegen"],
    "text_salient_terms": ["codegen", "partial"],
    "docs_train_test_split": ["no_bnl", "codegen"],
    "docs_stratified_sample": ["no_bnl", "codegen", "partial"],
    "lineitem_unpivot_measures": ["no_bnl", "codegen"],
    "part_price_histogram": ["no_bnl", "codegen", "partial"],
    "docs_source_domains": ["no_bnl", "codegen", "partial"],
    "nation_segments_agg": ["no_bnl", "codegen", "partial"],
    "emb_label_centroids": ["no_bnl", "codegen", "partial"],
    "dedup_exact": ["no_bnl", "codegen", "partial"],
    "dedup_exact_normalized": ["no_bnl", "codegen", "partial"],
    "dedup_clusters": ["no_bnl", "codegen"],
    "mm_media_metadata": ["no_bnl", "codegen"],
    "mm_frame_sample": ["no_bnl", "codegen"],
    "mm_decode_fake": ["no_bnl", "codegen"],
    "mm_extract_features": ["no_bnl", "codegen"],
    "events_user_stats": ["no_bnl", "codegen", "partial"],
    "events_approx_distinct": ["no_bnl", "codegen", "partial"],
    "events_approx_percentiles": ["no_bnl", "codegen", "partial"],
    "text_bpe_tokens": ["no_bnl", "codegen"],
    "sim_cosine_topk": ["codegen"],
    "sim_lsh_topk": ["no_bnl", "codegen"],
    "sim_semantic_dedup_clusters": ["no_bnl", "codegen"],
    # r8: assignment is a literal-codebook pure map (the iteration
    # aggregates run eagerly at construction behind localCheckpoint),
    # so the final plan has no aggregate and — the point — no corpus
    # exchange; no_bnl now holds too (the broadcast centroid fan-out
    # is gone)
    "sim_kmeans_assign": ["codegen", "no_bnl"],
    "sql_interface": ["no_bnl", "codegen", "partial"],
    "events_throttle": ["no_bnl", "codegen"],
    "q7_volume_shipping": ["no_bnl", "codegen", "partial"],
    "q13_customer_order_distribution": ["no_bnl", "codegen", "partial"],
    "q18_large_volume_customers": ["no_bnl", "codegen", "partial"],
    "distinct_order_priorities": ["no_bnl", "codegen"],
    "set_ops_customer_cohorts": ["no_bnl", "codegen", "partial"],
    "events_lead_lag_ntile": ["no_bnl", "codegen", "bounded_single_partition"],
    "rollup_revenue": ["no_bnl", "codegen", "partial"],
    "docs_cap_per_source": ["no_bnl", "codegen", "bounded_single_partition"],
    # r8: same literal-codebook map shape as sim_kmeans_assign
    "docs_cluster_balanced_sample": ["codegen", "no_bnl", "bounded_single_partition"],
    "tables_row_counts": ["no_bnl", "codegen", "partial"],
}


# Streaming-parity / ingest queries execute on construction (drain a
# stream, read the sink back) — the REGISTRY callable's plan is just a
# parquet scan of the sink. But each one's transform is a pure
# DataFrame -> DataFrame function (SURVEY §1.4 unified model), so the
# audit runs the SAME transform on a batch input and checks that plan:
# the micro-batch executor plans each trigger from the same Catalyst
# pipeline, so the batch plan is the per-batch work the stream does
# (minus the state-store operators, whose boundedness is argued in the
# streaming module docstrings and exercised by the parity gate rows).
PLAN_AUDIT_EXEMPT: set[str] = set()


def _be_traffic(spark, sf_dir):
    from dataflow_example_spark.config import TrafficConfig
    from dataflow_example_spark.operators.traffic import traffic_pipeline
    from dataflow_example_spark.synth import synth_traffic_lines

    cfg = TrafficConfig(window_duration_minutes=60, window_slide_minutes=60)
    return traffic_pipeline(synth_traffic_lines(spark, sf_dir), cfg)


def _be_dedup(spark, sf_dir):
    # dropDuplicatesWithinWatermark rejects batch inputs outright, so
    # the batch leg is the oracle's contract: DISTINCT over the same
    # content fingerprint (the state-store keying the streaming op uses)
    import pyspark.sql.functions as F

    from dataflow_example_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    return (
        docs.withColumn("content_md5", F.md5(F.col("text")))
        .select("content_md5", "n_chars")
        .dropDuplicates(["content_md5"])
    )


def _be_sliding(spark, sf_dir):
    from dataflow_example_spark.streaming.events import sliding_agg_stream
    from dataflow_example_spark.tables import load

    return sliding_agg_stream(load(spark, sf_dir, "events"))


def _be_session(spark, sf_dir):
    from dataflow_example_spark.streaming.events import session_agg_stream
    from dataflow_example_spark.tables import load

    return session_agg_stream(load(spark, sf_dir, "events"))


def _be_join(spark, sf_dir):
    # the stream runner's own transforms over a batch input — drift-proof
    from dataflow_example_spark.streaming.events import (
        click_purchase_interval_join,
        split_clicks_purchases,
    )
    from dataflow_example_spark.tables import load

    ev = load(spark, sf_dir, "events")
    purchases, clicks = split_clicks_purchases(ev)
    return click_purchase_interval_join(purchases, clicks)


def _be_enrich(spark, sf_dir):
    from dataflow_example_spark.streaming.events import (
        enrich_events,
        enrich_rollup,
        user_tier_dim,
    )
    from dataflow_example_spark.tables import load

    ev = load(spark, sf_dir, "events")
    return enrich_rollup(enrich_events(ev, user_tier_dim(ev)))


def _be_jsonl(spark, sf_dir):
    # docs_jsonl_ingest minus the text-file round trip: the same in-plan
    # serialize -> corrupt -> parse -> per-lang aggregate shape, with
    # from_json standing in for the PERMISSIVE text-scan parse
    import pyspark.sql.functions as F

    from dataflow_example_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    line = F.to_json(F.struct("doc_id", "lang", "source", "n_chars"))
    corrupted = F.when(
        F.col("doc_id") % 97 == 0, F.substring(line, 1, 20)
    ).otherwise(line)
    parsed = docs.select(corrupted.alias("value")).select(
        F.from_json(
            "value",
            "doc_id BIGINT, lang STRING, source STRING, n_chars BIGINT",
        ).alias("j")
    )
    clean = parsed.filter(F.col("j.doc_id").isNotNull())
    return clean.groupBy(F.col("j.lang").alias("lang")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )


# name -> (batch-leg builder, rules). Audited alongside AUDITS; the
# contract test accepts either table as coverage.
BATCH_EQUIVALENTS = {
    "streaming_traffic_parity": (_be_traffic, ["no_bnl", "codegen", "partial"]),
    "streaming_dedup_parity": (_be_dedup, ["no_bnl", "codegen"]),
    "streaming_sliding_parity": (_be_sliding, ["no_bnl", "codegen", "partial"]),
    "streaming_session_parity": (_be_session, ["no_bnl", "codegen"]),
    "streaming_join_parity": (_be_join, ["no_bnl", "codegen"]),
    "streaming_enrich_parity": (_be_enrich, ["broadcast", "no_bnl", "codegen", "partial"]),
    "docs_jsonl_ingest": (_be_jsonl, ["no_bnl", "codegen", "partial"]),
}


def _plan(df) -> str:
    qe = df._jdf.queryExecution()
    return qe.executedPlan().toString() + "\n" + qe.optimizedPlan().toString()


def _configure(spark) -> None:
    # AQE wraps everything in AdaptiveSparkPlan(isFinalPlan=false) whose
    # string carries no codegen markers; audit the static plan instead.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.debug.maxToStringFields", "2000")
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")


def _read_schemas(plan: str) -> list[str]:
    return re.findall(r"ReadSchema: struct<([^>]*)>", plan)


def check(name: str, plan: str, rules: list[str]) -> list[str]:
    fails = []
    for rule in rules:
        if rule == "pushdown":
            pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
            if not any(p.strip() for p in pushed):
                fails.append("no PushedFilters reached the scan")
        elif rule.startswith("pruned:"):
            limit = int(rule.split(":")[1])
            widths = [
                len([f for f in s.split(",") if f.strip()])
                for s in _read_schemas(plan)
            ]
            if not widths:
                fails.append("no parquet ReadSchema found")
            elif max(widths) > limit:
                fails.append(f"scan reads {max(widths)} cols (> {limit})")
        elif rule == "broadcast":
            if "BroadcastHashJoin" not in plan:
                fails.append("no BroadcastHashJoin planned")
        elif rule == "no_bnl":
            for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
                if bad in plan:
                    fails.append(f"{bad} in plan")
        elif rule == "partial":
            # map-side combine: a partial-mode hash aggregate node
            if not re.search(r"HashAggregate.*partial", plan, re.IGNORECASE) and \
               "partial_" not in plan:
                fails.append("no partial aggregation before exchange")
        elif rule == "range_partition":
            if "rangepartitioning" not in plan.lower():
                fails.append("no RangePartitioning exchange in plan")
        elif rule == "bounded_single_partition":
            # A SinglePartition exchange is a scale-killer UNLESS it
            # carries constant-bounded data: (a) a scalar aggregate
            # (keys=[]) over map-side partials, or (b) the per-range-
            # partition totals relation of the two-pass prefix-sum shape
            # (keys=[_pid...], one row per shuffle partition). Anything
            # else — e.g. an unpartitioned Window.orderBy sorting an
            # entity-level aggregate — fails. This is the rule that
            # would have flagged the round-5 global-window family.
            # The same exchange can print more than once (tree reuse /
            # subquery references show the node again with its subtree
            # elided), so group occurrences by plan_id and accept the
            # exchange if ANY occurrence shows the compliant child.
            seen: dict[str, bool] = {}
            child_of: dict[str, str] = {}
            for m in re.finditer(
                r"Exchange SinglePartition[^\n]*?(\[plan_id=\d+\])?\n([^\n]*)",
                plan,
            ):
                pid = m.group(1) or f"@{m.start()}"
                child = m.group(2)
                ok_child = bool(
                    re.search(r"HashAggregate\(keys=\[(\]|_pid)", child)
                    or re.search(r"(Sort|Window) \[_pid", child)
                )
                seen[pid] = seen.get(pid, False) or ok_child
                child_of.setdefault(pid, child)
            for pid, ok_any in seen.items():
                if not ok_any:
                    fails.append(
                        "unbounded Exchange SinglePartition (child: "
                        + child_of[pid].strip()[:80]
                        + ")"
                    )
        elif rule == "codegen":
            # non-AQE plan strings mark codegen stages with "*(n)"
            if not re.search(r"\*\(\d+\)", plan):
                fails.append("no WholeStageCodegen span")
        else:
            fails.append(f"unknown rule {rule!r}")
    return fails


def main() -> None:
    from dataflow_example_spark import queries
    from dataflow_example_spark.session import get_spark

    names = sys.argv[1:] or (
        list(AUDITS) + [n for n in BATCH_EQUIVALENTS if n not in AUDITS]
    )
    spark = get_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    _configure(spark)
    # a name may carry BOTH a registry audit (AUDITS: the real callable's
    # plan) and a batch-leg audit (BATCH_EQUIVALENTS: the streaming
    # transform over a batch input) — e.g. docs_jsonl_ingest. Run both.
    audits = 0
    failed = 0
    for name in names:
        legs = []
        if name in AUDITS:
            legs.append((queries.QUERIES[name], AUDITS[name], ""))
        if name in BATCH_EQUIVALENTS:
            builder, rules = BATCH_EQUIVALENTS[name]
            legs.append((builder, rules, " (batch leg)"))
        for builder, rules, tag in legs:
            audits += 1
            df = builder(spark, SF_DIR)
            fails = check(name, _plan(df), rules)
            if fails:
                failed += 1
                print(f"FAIL  {name}{tag}: " + "; ".join(fails))
            else:
                print(f"ok    {name}{tag}")
    # Final section: the static broadcast-hint rule (VERDICT r11 finding
    # 1) — no F.broadcast of a filter-only derivation of an SF-scaling
    # table anywhere in the registry. Counts as one audit row.
    import broadcast_audit

    audits += 1
    if broadcast_audit.main() != 0:
        failed += 1
    print(f"\n{audits - failed}/{audits} plans pass")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
