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
# the registry.  Latest-green distribution entering round 14 (computed
# from CORRECTNESS_r01..r13): r13 50, r12 45, r11 43, r10 45, r9 46,
# r7 13.  Round 14 opens, per the round-13 verdict's ask #1, by paying
# exactly the debt the evidence-age guard names — the THIRTEEN
# r7-stale queries left past round 13's window edge.  Window spend, in
# order of evidence value:
# (a) the r7-stale leaders (seven rounds without driver evidence; the
#     guard in tests/test_registry_order.py is red against
#     CORRECTNESS_r13 until they sit inside the window).  Clearing
#     them puts EVERY registered query within six rounds of driver
#     evidence for the first time since the window rotation began;
# (b) 37 of the 46 r9-stale queries: the streaming block first (most
#     of it became changed-code when widening plan item (c) replaced
#     the memory-sink harness with run_stream_pinned's foreachBatch
#     parquet sink this round), then joins,
#     the l-family dedup/similarity shapes, lifecycle (u15/u19), set
#     ops, projection/filter, s12, training plumbing, ts_ewma.  The
#     NINE r9-stale queries left past the edge (a1_pricing_summary —
#     its exact plan is re-executed by bench.py every round,
#     a16b_grouped_quantile_sketch — its shared ranks machinery
#     earned fresh r13 evidence via a16/st17, and the seven f_*
#     scalar-function families — pure expression evaluation, no
#     partitioning sensitivity) are the conscious overflow and round
#     15's rotation leaders; the guard will force them at r15 exactly
#     as it forced this round's thirteen.
#
# As round-14 code work lands (the written widening plan below), the
# changed-code and newly-registered queries move to the VERY front of
# this list in the same commit as the code change, displacing fill
# from the back (changed code must earn fresh driver evidence before
# stale-green refresh — the "no untested registration" rule extended
# to rewrites).
#
# Round-14 widening plan (from the round-13 ledger) — ALL EXECUTED
# this round: (a) landed as s16_pruned_reader_consumer (an ordinary
# band aggregation on read_parquet_pruned with actual-files receipts
# in both phases); (b) landed as u30_occ_multi_writer_stress (depth-2
# rebase chain + refuse-then-retry, plus the occ interleaving fuzz in
# tests/test_txn_snapshot.py); (c) landed as run_stream_pinned (the
# foreachBatch parquet sink replacing the memory-sink driver collect),
# pulling the 14 harness-routed st* queries into changed-code slots.
# The verdict-ask-#7 trajectory surfaces landed too:
# u31_compaction_scheduler (small-file census -> targeted rewrite of
# only fragmented partitions) and st20_cdc_compact_live (checkpointed
# CDC apply with seq-aware compaction between micro-batch runs).
#
# Round-15 rotation leaders (already determined): the TWENTY r9-stale
# queries outside this window — a1_pricing_summary, a16b, the seven
# f_* scalar families, o5, o5b, o6, p2, p3, s12_incremental_ingest,
# the four tr_* (k_anonymity/mix_weights/sequence_pack/token_budget)
# and ts_ewma — the guard will force them at r15 exactly as it forced
# this round's thirteen.  All the follow-on widening candidates ALSO
# landed this round: the retention chain as u32_erasure_hold_lifecycle
# (which exposed and added the partition-granular orphan GC
# primitive), the Z-order maintenance receipt as
# s17_zorder_maintenance (z-span census over a materialized
# clustering-key column -> targeted re-sort of only the unclustered
# appends), and the multi-table OCC transaction as
# u33_txn_occ_multi_table (u19's atomic pointer + u29/u30's conflict
# ledger: per-(table, partition) validation, whole-transaction
# refusal, cross-table carry on rebase).  Next candidates for round
# 15 (write the plan before registering): a streaming-side
# compaction-scheduler chain (st20's live-compaction shape gated by
# u31's census policy instead of an unconditional rewrite), and
# clustering-health maintenance for the partitioned layouts (s17's
# z-span census per PARTITION dir, feeding u31's scheduler).
_ROUND14_FRONT = [
    # round-14 NEW registrations (widening plan items (a) and (b),
    # then the verdict-ask-#7 trajectory surfaces): an untested
    # registration never waits behind stale refresh
    "s16_pruned_reader_consumer",
    "s17_zorder_maintenance",
    "st20_cdc_compact_live",
    "u30_occ_multi_writer_stress",
    "u31_compaction_scheduler",
    "u32_erasure_hold_lifecycle",
    "u33_txn_occ_multi_table",
    # CHANGED-code queries: every harness-routed streaming query now
    # executes through run_stream_pinned (widening plan item (c) — the
    # foreachBatch parquet sink replacing the driver-side memory-sink
    # collect); identical oracles, but rewritten execution paths must
    # earn fresh driver evidence before stale-green refresh
    "st10_stream_stream_join",
    "st11_streaming_ohlc",
    "st13_stream_outer_join",
    "st14_dedup_within_watermark",
    "st17_stream_quantile_sketch",
    "st18_stream_cms",
    "st19_stream_hll",
    "st2_tumbling_window",
    "st3_sliding_window",
    "st4_session_window",
    "st5_streaming_dedup",
    "st6_stateful_running_totals",
    "st7_late_data_watermark",
    "st8_stream_static_join",
    # the remaining r7-stale leaders the evidence-age guard named
    # (st14 sits above with the changed-code block — it is both)
    "e2_interval_concurrency",
    "l11_quality_filter",
    "l3d_simhash",
    "l9_lexicon_sentiment",
    "mm_binary_decode",
    "mm_chunk_expansion",
    "tr_weighted_sample",
    "u14_retention_delete",
    "u16_join_view_maintenance",
    "u17_write_expectations",
    "w6_ntile_acctbal_quartiles",
    "w9_gaps_islands",
    # r9-stale fill: st9 (foreachBatch JDBC path, NOT harness-routed,
    # so stale-refresh not changed-code), then joins / dedup /
    # lifecycle / set ops / filters.  s12, the four tr_* and ts_ewma
    # were displaced to the back by the changed-code block and join
    # the nine earlier overflow queries as round 15's leaders.
    "st9_foreach_batch_sink",
    "j1_star_join_revenue",
    "j8_asof_join_last_click",
    "j8b_asof_join_pandas",
    "l10_multimodal_join",
    "l2_hash_dedup",
    "l2b_canonical_dedup",
    "l3a_near_dup_signatures",
    "l3e_ngram_jaccard",
    "l3f_dup_clusters",
    "l3g_cluster_dedup_keep",
    "l3i_semantic_dedup",
    "l3j_chunk_dedup",
    "u15_time_travel",
    "u19_txn_snapshot",
    "o2_global_topk_orders",
    "o4_union_high_balance",
]

# Every other query has a driver-green row in r9-r13 -> back of the
# line.  The complement is listed explicitly (no overlap with the
# front list) so the "no stragglers" test keeps proving every
# registered query was either prioritized or consciously deferred.
_DRIVER_VERIFIED_R9_R13 = [
    "a10_moment_statistics",
    "a11_geometric_mean",
    "a12_mode_per_group",
    "a13_histogram_equiwidth",
    "a14_kmv_sketch",
    "a15_heavy_hitters",
    "a16_quantile_sketch",
    "a16b_grouped_quantile_sketch",
    "a17_countmin_sketch",
    "a18_hll_sketch",
    "a19_grouped_hll",
    "a1_pricing_summary",
    "a1d_pricing_summary_decimal",
    "a20_kmv_set_algebra",
    "a2_distinct_counts",
    "a3_approx_distinct",
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
    "e3_touch_attribution",
    "e4_transition_matrix",
    "e5_rfm_segmentation",
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
    "j1d_star_join_revenue_decimal",
    "j2_left_join_order_counts",
    "j2b_full_outer_join",
    "j3_semi_join_active_customers",
    "j4_anti_join_inactive_customers",
    "j5_cross_join_region_status",
    "j6_theta_band_join",
    "j7_range_join_daily_windows",
    "l1_exact_dedup",
    "l3b_minhash_lsh_pairs",
    "l3c_embedding_neardup",
    "l3h_portable_minhash",
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
    "mm_feature_extract",
    "mm_resize_downsample",
    "o1_global_sort",
    "o5_intersect_except_nations",
    "o5b_intersect_except_all",
    "o6_distinct_flag_combos",
    "o7_incremental_topk",
    "o8_pareto_concentration",
    "p1_project_rename_cast",
    "p2_filter_kitchen_sink",
    "p3_case_when_tiers",
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
    "q3_shipping_priority",
    "q4_order_priority_check",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "s10_zorder_clustering",
    "s11_dpp_join",
    "s12_incremental_ingest",
    "s13_file_skipping_index",
    "s14_stats_only_count",
    "s15_bucketed_join",
    "s1b_partitioned_parquet",
    "s2_csv_roundtrip",
    "s2b_orc_roundtrip",
    "s2c_xml_roundtrip",
    "s3_json_roundtrip",
    "s4_jdbc_roundtrip",
    "s9_external_feed",
    "sql_correlated_subquery",
    "st12_stream_cdc_apply",
    "st15_stream_ingest_bridge",
    "st16_stream_mor_cdc",
    "t_bpe_pair_counts",
    "t_fingerprint",
    "t_language_id",
    "t_oov_rate",
    "t_quality_score",
    "t_redact_blocklist",
    "t_repetition_ratio",
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
    "u18_mor_delete",
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
    "u9_incremental_rollup",
    "u9d_incremental_rollup_decimal",
    "ud1_scalar_python_udf",
    "ud2_pandas_scalar_udf",
    "ud3_pandas_grouped_agg",
    "ud5_udtf_bigrams",
    "w10_event_runs",
    "w11_cumulative_distinct",
    "w1_rank_top_orders_per_segment",
    "w2_lag_daily_returns",
    "w3_moving_average",
    "w3b_time_range_rolling",
    "w4_cumulative_spend",
    "w5_forward_fill",
    "w7_percent_rank_cume_dist",
    "w8_value_window_family",
]

reorder(_ROUND14_FRONT, defer=_DRIVER_VERIFIED_R9_R13)
