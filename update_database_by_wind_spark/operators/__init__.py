"""Operator inventory (SURVEY.md §2).

Importing this package registers every query in
``update_database_by_wind_spark.registry.REGISTRY``.
"""

from update_database_by_wind_spark.operators import (  # noqa: F401
    aggregates,
    analytics_extra,
    decimal_money,
    dedup,
    extended,
    extended2,
    graph,
    joins,
    multimodal,
    quality,
    scalars,
    setops,
    sources_ops,
    similarity,
    storage,
    text,
    tpch_extra,
    tpch_full,
    training,
    udfs,
    update_pipeline,
    windows,
)
from update_database_by_wind_spark.streaming import (  # noqa: F401, E402
    pipelines,
    stateful,
)

from update_database_by_wind_spark.registry import reorder  # noqa: E402

# The driver's per-round correctness check covers a ~50-entry prefix of
# the registry.  Latest-green distribution entering round 13 (computed
# from CORRECTNESS_r01..r12): r12 50, r11 43, r10 45, r9 46, r7 47,
# r6 11.  Round 13 again registers NOTHING NEW (the debt-paydown
# contract holds until every query is within six rounds of evidence —
# projected to clear in round 14) and spends the window, in order of
# evidence value:
# (a) the FIVE queries whose code changes this round — e5/o8/a16/st17
#     ride functions/ranks.py, which gains the loud integer/non-null
#     input guard (round-12 verdict ask #5), the left-join drift
#     invariant and the O(log n_buckets) bisection classifier (both
#     ADVICE items); s13 routes through the new default-reader
#     integration (read_parquet_pruned: probe a persisted, fresh
#     _stats_index without ever rebuilding on the read path — verdict
#     ask #3) and indexed_band_read's rebuilds now UNION the cached
#     index's stat columns with the requested ones (ADVICE: no
#     thrash-rebuild between query families).  Identical oracles, but
#     changed code must earn fresh driver evidence before anything
#     else (the "no untested registration" rule extended to rewrites);
# (b) the ELEVEN r6-stale queries — round 12's named overflow, now
#     seven rounds without driver evidence and RED under
#     tests/test_registry_order.py's evidence-age guard until they sit
#     inside the window (exactly the forcing function firing as
#     designed);
# (c) 34 of the 47 r7-stale queries: the q-family TPC-H depth shapes
#     first, then the s-family source round trips, then the t-family
#     text gates, then the alphabetical head of the remainder
#     (a15/a3).  The THIRTEEN r7-stale queries past the window edge
#     (e2, l11, l3d, l9, mm_binary_decode, mm_chunk_expansion, st14,
#     tr_weighted_sample, u14, u16, u17, w6, w9) are the conscious
#     overflow and ROUND 14's rotation leaders — the evidence-age
#     guard will go red against CORRECTNESS_r13 and force them, same
#     rhythm as this round.
#
# Round-14 widening plan (to execute ONLY after the debt clears, per
# the round-12 verdict ask #8 — written here so the plan survives the
# session): (a) promote the read_parquet_pruned auto-skipping reader
# to the default scan path of an S1-family consumer with a DPP-style
# pruned-file receipt; (b) a multi-writer OCC stress lifecycle — U29
# under concurrent interleaved commits with rebase chains >= 2 deep;
# (c) the deferred streaming-harness pin swap
# (streaming/pipelines.py memory-sink materialization ->
# fsutil.pin_snapshot), which will pull every harness-routed st*
# query into the changed-code window slots.
_ROUND13_FRONT = [
    # (a) code changes this round -> fresh evidence outranks all
    "e5_rfm_segmentation",
    "o8_pareto_concentration",
    "a16_quantile_sketch",
    "st17_stream_quantile_sketch",
    "s13_file_skipping_index",
    # (b) last driver-green row is round 6 — seven rounds stale, the
    # evidence-age guard's named leaders
    "u9_incremental_rollup",
    "u9d_incremental_rollup_decimal",
    "ud1_scalar_python_udf",
    "ud5_udtf_bigrams",
    "w1_rank_top_orders_per_segment",
    "w2_lag_daily_returns",
    "w3_moving_average",
    "w3b_time_range_rolling",
    "w5_forward_fill",
    "w7_percent_rank_cume_dist",
    "w8_value_window_family",
    # (c) last driver-green row is round 7 — TPC-H depth first
    "q10_returned_item_revenue",
    "q11_important_stock",
    "q12_late_shipment_priority",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_parts_supplier_relation",
    "q17_small_quantity_revenue",
    "q18_large_volume_orders",
    "q19_disjunctive_revenue",
    "q20_part_promotion",
    "q21_suppliers_kept_waiting",
    "q22_dormant_high_balance",
    "q2_min_cost_supplier",
    "q4_order_priority_check",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    # (c) source round trips
    "s1b_partitioned_parquet",
    "s2_csv_roundtrip",
    "s2b_orc_roundtrip",
    "s2c_xml_roundtrip",
    "s3_json_roundtrip",
    "s4_jdbc_roundtrip",
    "s9_external_feed",
    # (c) text gates
    "t_fingerprint",
    "t_language_id",
    "t_quality_score",
    "t_redact_blocklist",
    "t_repetition_ratio",
    # (c) alphabetical head of the r7 remainder
    "a15_heavy_hitters",
    "a3_approx_distinct",
]

# Every other query has a driver-green row in r7-r12 -> back of the
# line.  The complement is listed explicitly (no overlap with the front
# list) so the "no stragglers" test keeps proving every registered
# query was either prioritized or consciously deferred.
_DRIVER_VERIFIED_R7_R12 = [
    "a10_moment_statistics",
    "a11_geometric_mean",
    "a12_mode_per_group",
    "a13_histogram_equiwidth",
    "a14_kmv_sketch",
    "a16b_grouped_quantile_sketch",
    "a17_countmin_sketch",
    "a18_hll_sketch",
    "a19_grouped_hll",
    "a1_pricing_summary",
    "a1d_pricing_summary_decimal",
    "a20_kmv_set_algebra",
    "a2_distinct_counts",
    "a4_rollup_balances",
    "a4b_cube_quantities",
    "a4c_grouping_sets",
    "a5_conditional_agg",
    "a6_collect_sorted_lists",
    "a7_pivot_segment_revenue",
    "a8_unpivot_status_revenue",
    "a9_percentiles",
    "a9b_percentile_approx",
    "dq3_mad_outliers",
    "dq4_freshness_audit",
    "dq5_reconciliation",
    "dq_null_profile",
    "dq_referential_integrity",
    "e1_event_funnel",
    "e2_interval_concurrency",
    "e3_touch_attribution",
    "e4_transition_matrix",
    "f_array_functions",
    "f_datetime_functions",
    "f_hash_functions",
    "f_json_extraction",
    "f_map_functions",
    "f_math_null_functions",
    "f_string_functions",
    "f_try_functions",
    "f_variant_json",
    "g2_pagerank",
    "g3_triangle_count",
    "g4_bfs_hops",
    "j10_salted_skew_join",
    "j11_null_safe_join",
    "j12_bloom_prefilter",
    "j13_interval_bin_join",
    "j14_asof_tolerance",
    "j1_star_join_revenue",
    "j1d_star_join_revenue_decimal",
    "j2_left_join_order_counts",
    "j2b_full_outer_join",
    "j3_semi_join_active_customers",
    "j4_anti_join_inactive_customers",
    "j5_cross_join_region_status",
    "j6_theta_band_join",
    "j7_range_join_daily_windows",
    "j8_asof_join_last_click",
    "j8b_asof_join_pandas",
    "l10_multimodal_join",
    "l11_quality_filter",
    "l1_exact_dedup",
    "l2_hash_dedup",
    "l2b_canonical_dedup",
    "l3a_near_dup_signatures",
    "l3b_minhash_lsh_pairs",
    "l3c_embedding_neardup",
    "l3d_simhash",
    "l3e_ngram_jaccard",
    "l3f_dup_clusters",
    "l3g_cluster_dedup_keep",
    "l3h_portable_minhash",
    "l3i_semantic_dedup",
    "l3j_chunk_dedup",
    "l3k_incremental_index",
    "l3m_containment_dedup",
    "l3n_edit_distance_blocked",
    "l4_cosine_topk_exact",
    "l4b_cosine_topk_blocked",
    "l4c_cosine_topk_vectorized",
    "l5_ann_lsh",
    "l5_ivf_kmeans_topk",
    "l5_ivf_topk",
    "l5b2_ivf_kmeans_recall",
    "l5b_ivf_recall",
    "l5c_matryoshka_recall",
    "l5d_pq_recall",
    "l5d_pq_topk",
    "l6_vector_norms",
    "l7_word_frequency",
    "l8_tfidf_top_terms",
    "l9_lexicon_sentiment",
    "mm_binary_decode",
    "mm_chunk_expansion",
    "mm_feature_extract",
    "mm_resize_downsample",
    "o1_global_sort",
    "o2_global_topk_orders",
    "o4_union_high_balance",
    "o5_intersect_except_nations",
    "o5b_intersect_except_all",
    "o6_distinct_flag_combos",
    "o7_incremental_topk",
    "p1_project_rename_cast",
    "p2_filter_kitchen_sink",
    "p3_case_when_tiers",
    "q3_shipping_priority",
    "s10_zorder_clustering",
    "s11_dpp_join",
    "s12_incremental_ingest",
    "s14_stats_only_count",
    "s15_bucketed_join",
    "sql_correlated_subquery",
    "st10_stream_stream_join",
    "st11_streaming_ohlc",
    "st12_stream_cdc_apply",
    "st13_stream_outer_join",
    "st14_dedup_within_watermark",
    "st15_stream_ingest_bridge",
    "st16_stream_mor_cdc",
    "st18_stream_cms",
    "st19_stream_hll",
    "st2_tumbling_window",
    "st3_sliding_window",
    "st4_session_window",
    "st5_streaming_dedup",
    "st6_stateful_running_totals",
    "st7_late_data_watermark",
    "st8_stream_static_join",
    "st9_foreach_batch_sink",
    "t_bpe_pair_counts",
    "t_oov_rate",
    "t_token_count",
    "t_unigram_logprob",
    "tr_decontamination",
    "tr_domain_cap",
    "tr_hash_split",
    "tr_k_anonymity",
    "tr_label_centroids",
    "tr_mix_weights",
    "tr_sequence_pack",
    "tr_shuffle_shard",
    "tr_stratified_sample",
    "tr_token_budget",
    "tr_weighted_sample",
    "ts_backtest_snaive",
    "ts_bollinger_bands",
    "ts_cross_sectional_zscore",
    "ts_ewma",
    "ts_gapfill_interpolate",
    "ts_max_drawdown",
    "ts_resample_monthly_ohlc",
    "ts_rolling_corr",
    "ts_rsi",
    "ts_sessionize_batch",
    "ts_twap",
    "ts_vwap",
    "u10_table_checksum",
    "u11_wind_update_pipeline",
    "u12_cdc_classify",
    "u13_cdc_merge_sink",
    "u14_retention_delete",
    "u15_time_travel",
    "u16_join_view_maintenance",
    "u17_write_expectations",
    "u18_mor_delete",
    "u19_txn_snapshot",
    "u1_incremental_diff",
    "u20_change_data_feed",
    "u21_mor_seq_compact",
    "u22_merge_schema_evolution",
    "u23_snapshot_restore",
    "u24_mor_seq_erasure",
    "u25_partition_evolution",
    "u26_snapshot_vacuum",
    "u27_orphan_gc",
    "u28_snapshot_tags",
    "u29_occ_commit",
    "u2_upsert_merge",
    "u3_scd2_history",
    "u4_idempotent_rerun",
    "u5_calendar_backfill",
    "u6_schema_evolution",
    "u7_compaction",
    "u8_cow_partition_merge",
    "ud2_pandas_scalar_udf",
    "ud3_pandas_grouped_agg",
    "w10_event_runs",
    "w11_cumulative_distinct",
    "w4_cumulative_spend",
    "w6_ntile_acctbal_quartiles",
    "w9_gaps_islands",
]

reorder(_ROUND13_FRONT, defer=_DRIVER_VERIFIED_R7_R12)
