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
# the registry.  Latest-green distribution entering round 17 (computed
# from CORRECTNESS_r01..r16 in this rotation commit): r16 50, r15 43,
# r14 46, r13 49, r12 41, r11 41.  Round 16 cleared the whole r10 debt;
# round 17 opens, per the round-16 verdict's ask #1 (and the
# already-red test_rotation_anticipates_next_round tripwire), by paying
# exactly the debt the evidence-age guard names at newest=17
# (threshold: latest green <= 17 - 6 = 11 must sit inside the window) —
# the FORTY-ONE r11-stale queries, recomputed from the artifacts this
# rotation and identical to the list the r16 ledger and verdict both
# named.  Window spend, in order of evidence value:
# (a) the forty-one r11-stale leaders (the a17-a20 sketch block,
#     dq3/dq4/dq5 audits, e3/e4, g3/g4, j14, l3m/l3n, the l5 IVF/PQ
#     recall block, mm_feature_extract, o7, s15, t_oov/t_token,
#     tr_domain_cap/tr_label_centroids, ts_backtest/ts_bollinger/
#     ts_gapfill, u12/u13 CDC, the u22-u29 snapshot/OCC lifecycle
#     block, w10/w11).  With these refreshed, every registered query
#     is within five rounds of driver evidence;
# (b) NINE r12-stale fill slots — the round's whole widening budget
#     (the r16 verdict's own arithmetic: 41 forced leaders fit the
#     50-window with 9 slots for new work).  Fill is riskiest
#     families first (the u1-u10 foundational lifecycle block, then
#     the streaming ingest bridge) so that as round-17 work lands
#     and new / changed-code queries displace fill from the back
#     (the "no untested registration" rule, extended to rewrites),
#     what drops out last is the lifecycle block.
# Round 18's forced leaders are therefore the r12-green queries that
# neither this fill nor displacement refreshes: 41 are r12-green
# entering the round (a14, a1d/a9b, dq_null/dq_ref, the j2-j7 +
# j11-j13 join block, j1d, l8, mm_resize, s11/s14, st15/st16,
# t_unigram, tr_decontamination/tr_hash_split/tr_shuffle_shard/
# tr_stratified_sample, the ts indicator block, u1/u3-u8/u10), minus
# the fill slots that survive displacement.  Recompute from the
# CORRECTNESS artifacts when rotating — this paragraph is planning
# context, the artifacts are truth.
#
# Round-17 widening plan — ALL EIGHT ITEMS EXECUTED, closing the
# round at exactly the 9-slot budget (4 new + 5 changed, zero fill):
# (1) ADVICE medium — txn_changes / txn_changes_pruned now feed a
#     table REMOVED between endpoints (tv_from!=0, tv_to==0 — the
#     pointer shape txn_restore produces when rolling back past a
#     mid-history table ADD) as the txn_from snapshot in deletes,
#     symmetric to the added-table insert feed (file-pruned under a
#     band, mode receipt "removed") -> changed-code u34/u43;
#     consumers' code untouched, byte-identical on every previously-
#     reachable input; the new branch proven end-to-end by st26 and
#     unit-pinned in tests/test_txn_snapshot.py;
# (2) ADVICE low — txn_restore reports dropped_tables -> u44;
# (3) ADVICE low — u41's strict proper-subset receipt gated on
#     fixture cardinality like u43's (green at sf0.001 now) -> u41;
# (4) ADVICE low — txn_expire's step 4b sweeps tables whose last
#     retained pointer reference step 3 removed (young-manifest
#     concurrent-re-ADD deferral, reported) -> u37;
# (5) verdict ask #2 landed as st26_restore_inverse_view: the daemon
#     applies u44's inverse feed through the ordinary incremental
#     path — mode ledger [(2, incremental), (3, inverse)], rebaseline
#     hook forbidden, dropped-table delete feed applied, view
#     round-trips to the pre-deploy snapshot;
# (6) verdict ask #3 landed as u46_sharded_optimize: st25's shard
#     split × u45's planner — containment, disjointness,
#     merge-conservation, per-shard coherence;
# (7) verdict ask #4 landed as u47_age_policy_daemon: quiet-pass
#     no-op, undated hold keeping the consumer's next span diffable
#     (one bounded rebaseline), convergence; the policy × watermark
#     race fuzzed against the dict model;
# (8) verdict ask #5 landed as st27_state_relocation: drain through
#     the read-only statestore source (positional struct cast — the
#     value buffer surfaces duplicate internal field names),
#     sum-mergeable re-seed at 7 partitions, resume; layout/offsets/
#     state-equality/sink-continuity receipts, st24's contract
#     honoured by the relocated checkpoint.
#
# Candidate round-18 surfaces (write the plan before registering, and
# mind the budget: 41 r12-stale queries will be forced at newest=18,
# leaving ~9 slots again): restore-aware SHARDED consumers (st25's
# shards each applying their band's slice of u44's inverse feed —
# st26 × st25); relocation for keyed state (st27 re-seeds a
# complete-mode aggregate; applyInPandasWithState checkpoints carry
# arbitrary per-key state, where drain-and-reseed needs an explicit
# state-injection batch); and maintenance-aware retention (u46's
# shard planners racing u47's age daemon — the expiry that reclaims a
# version dir mid-rewrite).

_ROUND17_FRONT = [
    # round-17 NEW and CHANGED-code registrations are inserted ABOVE
    # the leaders as the work lands (an untested registration never
    # waits behind stale refresh); each insertion displaces one fill
    # slot from the back in the same commit.
    #
    # round-17 NEW registrations (widening plan items (5)-(8)):
    # (5) the restore-aware view consumer — u44's restore notification
    # applies the INVERSE feed through the daemon's ordinary
    # incremental path (mode ledger [(2, incremental), (3, inverse)],
    # rebaseline hook forbidden), including the dropped-table delete
    # feed the round-16 ADVICE medium fix added; the view round-trips
    # to its pre-deploy state with zero fact-table rescans
    "st26_restore_inverse_view",
    # (6) feed-driven maintenance SHARDED: two planner daemons on
    # disjoint bucket bands, each planning via txn_touched_since
    # restricted to its band and rewriting only its partitions — work
    # orders band-contained, disjoint, merge-equal to the unsharded
    # plan; band reads exact at every retained txn after each shard
    "u46_sharded_optimize",
    # (7) the age-policy daemon racing a live consumer: the quiet
    # pass is a no-op, the undated hold keeps the consumer's next
    # span diffable (one rebaseline for the whole incident, mode
    # ledger pinned), and the policy converges on re-run; the
    # policy x watermark race is also fuzzed against the dict model
    "u47_age_policy_daemon",
    # (8) offline state relocation — drain a complete-mode
    # aggregation's checkpoint through the official statestore
    # reader, re-seed at 7 partitions (sum-mergeable by design),
    # resume; receipts: layout {0..6}, offsets conf 7, state rows
    # equal group-by-group, sink continuity, and st24's
    # mismatched-session contract honoured by the relocated
    # checkpoint.  Closes the round at the full 9-slot budget:
    # 4 new + 5 changed, zero fill remaining.
    "st27_state_relocation",
    # CHANGED-code queries (widening plan items (1)-(4), the four
    # round-16 ADVICE fixes): identical oracles, but a rewrite must
    # earn fresh driver evidence before stale-green refresh.
    # txn_changes / txn_changes_pruned grew the removed-table delete
    # feed (the restore-past-ADD pointer shape) -> u34/u43;
    # txn_restore reports dropped_tables -> u44; u41's proper-subset
    # receipt gated on fixture cardinality like u43's -> u41;
    # txn_expire sweeps tables whose last retained reference step 3
    # removed (with the young-manifest concurrent-re-ADD deferral) ->
    # u37.  Consumers of the new feed branch (u35/st22/st23/st25) are
    # code-identical and byte-identical on every previously-reachable
    # input; the new branch is proven end-to-end by st26 and by
    # tests/test_txn_snapshot.py's removed-table laws.
    "u34_txn_change_feed",
    "u37_txn_retention",
    "u41_cdc_stats_pruned",
    "u43_txn_feed_pruned",
    "u44_txn_restore",
    # the forty-one r11-stale leaders the evidence-age guard forces
    # at newest=17 (round-16 verdict ask #1; recomputed from the
    # artifacts in this rotation commit)
    "a17_countmin_sketch",
    "a18_hll_sketch",
    "a19_grouped_hll",
    "a20_kmv_set_algebra",
    "dq3_mad_outliers",
    "dq4_freshness_audit",
    "dq5_reconciliation",
    "e3_touch_attribution",
    "e4_transition_matrix",
    "g3_triangle_count",
    "g4_bfs_hops",
    "j14_asof_tolerance",
    "l3m_containment_dedup",
    "l3n_edit_distance_blocked",
    "l5_ivf_kmeans_topk",
    "l5_ivf_topk",
    "l5b2_ivf_kmeans_recall",
    "l5b_ivf_recall",
    "l5d_pq_recall",
    "l5d_pq_topk",
    "mm_feature_extract",
    "o7_incremental_topk",
    "s15_bucketed_join",
    "t_oov_rate",
    "t_token_count",
    "tr_domain_cap",
    "tr_label_centroids",
    "ts_backtest_snaive",
    "ts_bollinger_bands",
    "ts_gapfill_interpolate",
    "u12_cdc_classify",
    "u13_cdc_merge_sink",
    "u22_merge_schema_evolution",
    "u23_snapshot_restore",
    "u25_partition_evolution",
    "u26_snapshot_vacuum",
    "u27_orphan_gc",
    "u28_snapshot_tags",
    "u29_occ_commit",
    "w10_event_runs",
    "w11_cumulative_distinct",
    # r12-stale fill: opened at 9 slots (the round-17 budget,
    # riskiest families first — the foundational u1-u10 lifecycle
    # block, then the streaming ingest bridge); every new or
    # changed-code registration above displaces one from the back
    # (the 5 changed-code ADVICE entries displaced st15 and u8-u5;
    # the 4 new registrations st26/u46/u47/st27 displaced u4, u3,
    # u1, and u10 — zero fill remaining, the exact 9-slot budget)
]

# Every other query has a driver-green row in r12-r16 -> back of the
# line.  The complement is listed explicitly (no overlap with the
# front list) so the "no stragglers" test keeps proving every
# registered query was either prioritized or consciously deferred.
_DRIVER_VERIFIED_R12_R16 = [
    "a10_moment_statistics",
    "a11_geometric_mean",
    "a12_mode_per_group",
    "a13_histogram_equiwidth",
    "a14_kmv_sketch",
    "a15_heavy_hitters",
    "a16_quantile_sketch",
    "a16b_grouped_quantile_sketch",
    "a1_pricing_summary",
    "a1d_pricing_summary_decimal",
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
    "dq_null_profile",
    "dq_referential_integrity",
    "e1_event_funnel",
    "e2_interval_concurrency",
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
    "j10_salted_skew_join",
    "j11_null_safe_join",
    "j12_bloom_prefilter",
    "j13_interval_bin_join",
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
    "l4_cosine_topk_exact",
    "l4b_cosine_topk_blocked",
    "l4c_cosine_topk_vectorized",
    "l5_ann_lsh",
    "l5c_matryoshka_recall",
    "l6_vector_norms",
    "l7_word_frequency",
    "l8_tfidf_top_terms",
    "l9_lexicon_sentiment",
    "mm_binary_decode",
    "mm_chunk_expansion",
    "mm_resize_downsample",
    "o1_global_sort",
    "o2_global_topk_orders",
    "o4_union_high_balance",
    "o5_intersect_except_nations",
    "o5b_intersect_except_all",
    "o6_distinct_flag_combos",
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
    "s16_pruned_reader_consumer",
    "s17_zorder_maintenance",
    "s18_partition_clustering_health",
    "s19_snapshot_stats_travel",
    "s1b_partitioned_parquet",
    "s20_snapshot_clustering_stats",
    "s21_snapshot_multiband",
    "s2_csv_roundtrip",
    "s2b_orc_roundtrip",
    "s2c_xml_roundtrip",
    "s3_json_roundtrip",
    "s4_jdbc_roundtrip",
    "s9_external_feed",
    "sql_correlated_subquery",
    "st10_stream_stream_join",
    "st11_streaming_ohlc",
    "st12_stream_cdc_apply",
    "st13_stream_outer_join",
    "st14_dedup_within_watermark",
    "st15_stream_ingest_bridge",
    "st16_stream_mor_cdc",
    "st17_stream_quantile_sketch",
    "st18_stream_cms",
    "st19_stream_hll",
    "st20_cdc_compact_live",
    "st21_gated_compact_live",
    "st22_stream_view_maintenance",
    "st23_feed_rebaseline",
    "st24_state_repartition_restore",
    "st25_sharded_view_daemon",
    "st2_tumbling_window",
    "st3_sliding_window",
    "st4_session_window",
    "st5_streaming_dedup",
    "st6_stateful_running_totals",
    "st7_late_data_watermark",
    "st8_stream_static_join",
    "st9_foreach_batch_sink",
    "t_bpe_pair_counts",
    "t_fingerprint",
    "t_language_id",
    "t_quality_score",
    "t_redact_blocklist",
    "t_repetition_ratio",
    "t_unigram_logprob",
    "tr_decontamination",
    "tr_hash_split",
    "tr_k_anonymity",
    "tr_mix_weights",
    "tr_sequence_pack",
    "tr_shuffle_shard",
    "tr_stratified_sample",
    "tr_token_budget",
    "tr_weighted_sample",
    "ts_cross_sectional_zscore",
    "ts_ewma",
    "ts_max_drawdown",
    "ts_resample_monthly_ohlc",
    "ts_rolling_corr",
    "ts_rsi",
    "ts_sessionize_batch",
    "ts_twap",
    "ts_vwap",
    "u11_wind_update_pipeline",
    "u14_retention_delete",
    "u15_time_travel",
    "u16_join_view_maintenance",
    "u17_write_expectations",
    "u18_mor_delete",
    "u19_txn_snapshot",
    "u20_change_data_feed",
    "u21_mor_seq_compact",
    "u24_mor_seq_erasure",
    "u2_upsert_merge",
    "u30_occ_multi_writer_stress",
    "u31_compaction_scheduler",
    "u32_erasure_hold_lifecycle",
    "u33_txn_occ_multi_table",
    "u35_feed_view_maintenance",
    "u36_stats_layout_coherence",
    "u38_txn_tag_retention",
    "u39_group_erasure_gc",
    "u40_txn_age_retention",
    "u42_group_optimize",
    "u45_feed_driven_optimize",
    "u10_table_checksum",
    "u1_incremental_diff",
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
    "w1_rank_top_orders_per_segment",
    "w2_lag_daily_returns",
    "w3_moving_average",
    "w3b_time_range_rolling",
    "w4_cumulative_spend",
    "w5_forward_fill",
    "w6_ntile_acctbal_quartiles",
    "w7_percent_rank_cume_dist",
    "w8_value_window_family",
    "w9_gaps_islands",
]

reorder(_ROUND17_FRONT, defer=_DRIVER_VERIFIED_R12_R16)
