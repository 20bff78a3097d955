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
# the registry.  Latest-green distribution entering round 16 (computed
# from CORRECTNESS_r01..r15): r15 50, r14 46, r13 49, r12 41, r11 41,
# r10 35.  Round 15 cleared the last of the r9 debt; round 16 opens,
# per the round-15 verdict's ask #1 (and the already-red
# test_rotation_anticipates_next_round tripwire), by paying exactly the
# debt the evidence-age guard names at newest=16 (threshold: latest
# green <= 16 - 6 = 10 must sit inside the window) — the THIRTY-FIVE
# r10-stale queries, recomputed from the artifacts this rotation and
# identical to the list the r15 ledger and verdict both named.
# Window spend, in order of evidence value:
# (a) the thirty-five r10-stale leaders (the a2/a4-a13 expression
#     aggregate block, e1_event_funnel, f_array/f_map, g2_pagerank,
#     the l3 LSH/near-dup block, the l4 cosine block, l5_ann_lsh,
#     l5c, l6, l7, o1_global_sort, p1, q3, s10_zorder_clustering,
#     sql_correlated_subquery, t_bpe_pair_counts, ts_rolling_corr).
#     With these refreshed, every registered query is within five
#     rounds of driver evidence;
# (b) FIFTEEN r11-stale fill slots — the round's whole widening
#     budget (the r15 ledger's own instruction: 35 forced leaders
#     fit the 50-window with 15 slots for new work).  Fill is
#     riskiest families first (the u12/u13 CDC pair and the
#     u22-u29 snapshot/OCC lifecycle block, then windows, the
#     tolerance as-of join, and the containment/edit-distance/IVF
#     dedup-ANN trio) so that as round-16 work lands and new /
#     changed-code queries displace fill from the back (the "no
#     untested registration" rule, extended to rewrites), what drops
#     out last is the lifecycle block.
# Round 17's forced leaders are therefore the r11-green queries that
# neither this fill nor displacement refreshes: 41 are r11-green
# entering the round (a17-a20 sketches, dq3/dq4/dq5, e3/e4, g3/g4,
# j14, l3m/l3n, the l5 IVF/PQ recall block, mm_feature_extract, o7,
# s15, t_oov/t_token, tr_domain_cap/tr_label_centroids, ts_backtest/
# ts_bollinger/ts_gapfill, u12/u13/u22/u23/u25-u29, w10/w11), minus
# the fill slots that survive displacement.  Recompute from the
# CORRECTNESS artifacts when rotating — this paragraph is planning
# context, the artifacts are truth.
#
# Round-16 widening plan — ALL FIVE ITEMS EXECUTED, plus one
# composition beyond the plan:
# (1) the four round-15 ADVICE fixes landed as changed-code entries
#     (u37/u38/u39, st22/st23): txn_expire now recovers a crash
#     between pointer removal and the per-table expiry loop by
#     DEFERRING below-head unpointed manifests to the keep-set expiry
#     (which honours version-dir sharing) instead of wedging on the
#     orphan-scan refusal, and grew the min_age_s concurrent-writer
#     guard (young above-head orphans are skipped and counted as
#     retained for the per-table head guard); txn_changes' retention
#     refusal became the TYPED RetentionExpiredError and
#     _apply_view_notification rebaselines ONLY on that type (spec
#     bugs re-raise); _ViewStore heals the old-present/view-missing
#     crash shape on every accessor.  Crash-interleaving unit tests +
#     a fuzzed kill-point variant landed with the fixes;
# (2) landed as u40_txn_age_retention (txn_commit_at's embedded
#     stamp, written after the pointer; txn_expire_by_age computing
#     newest ∪ tagged ∪ undated ∪ young; age added to the retention
#     fuzz as a dict-model comparison);
# (3) landed as u41_cdc_stats_pruned (snapshot_changes_pruned —
#     partition-granular both-sides band rule, metadata-only on
#     disjoint pairs, exactness vs the unpruned diff);
# (4) landed as u42_group_optimize (txn_optimize_plan/_run — both
#     censuses over the head-referenced version dirs, one work order,
#     cluster-subsumes-compact, the single-file no-signal guard,
#     u36-coherent execution, empty re-plan receipt);
# (5) landed as st24_state_repartition_restore (the checkpoint owns
#     the state partition count: {0..3} layout and offsets-conf 4
#     pinned across a deliberately mismatched 11-partition resume);
# (+) u43_txn_feed_pruned (u34 × u41): the band-scoped GROUP feed —
#     pointer short-circuit / stats-pruned diff / file-pruned insert
#     feed for an added table, three cost classes in one call, typed
#     refusals carried through to sharded consumers.
#
# The first named round-17 candidate ALSO landed in-round once the
# planned window was green (the compose-and-certify loop, third
# consecutive round): u44_txn_restore — group RESTORE as one fresh
# manifest COPY per rolled-back table (content verbatim-equals the
# target version's, the u23 fork that keeps the next partial commit
# carrying the restored partition map) plus one pointer write;
# metadata-only receipt (the data/version-dir census is byte-identical
# across the restore), the inverse-feed receipt (txn_changes(bad →
# restore) equals the bad deploy's feed with before/after swapped),
# and the retention composition (expiring the original good pointer
# leaves the restore self-sufficient).
#
# The sharded-daemon candidate ALSO landed in-round
# (st25_sharded_view_daemon — two shard daemons with independent
# checkpoints and view stores over disjoint bucket ranges, per-shard
# pruned pulls whose union conserves the manifest diff, disjoint-union
# convergence after every notification).
#
# Feed-driven maintenance planning ALSO landed
# (u45_feed_driven_optimize — txn_touched_since derives the scope from
# the pointer/manifest diff, the planner skips converged version dirs
# whole with the renamed-dirs physical tooth, exactness vs the full
# census, typed retention fallback), closing the round at exactly the
# 15-slot budget: 8 new + 7 changed, zero fill remaining.
#
# Remaining candidate round-17 surfaces (write the plan before
# registering, and mind the forced-leader budget below — ~40 r11-stale
# queries will be forced at newest=17): restore-aware view consumers
# (st22's daemon observing u44's restore notification applies the
# inverse feed instead of rebaselining — rollback without recompute);
# age-policy daemons (txn_expire_by_age on a schedule with the st23
# rebaseline interaction); and sharded maintenance (st25's shard split
# applied to u45's planner — each shard plans and rewrites only its
# band's partitions).

_ROUND16_FRONT = [
    # round-16 NEW registrations (widening plan items (2)-(5)): an
    # untested registration never waits behind stale refresh
    # (2) age-based txn retention: keep-by-age from the embedded
    # commit stamp, composed with tag roots and keep-last
    "u40_txn_age_retention",
    # (3) the change feed pruned through the travelling stats: a
    # band-scoped CDC diff scans only the rewritten partitions
    # whose stats could touch the band; band-disjoint pairs are
    # metadata-only
    "u41_cdc_stats_pruned",
    # (4) the group-level OPTIMIZE planner: both censuses across
    # every table of the txn group -> ONE work order, executed
    # under the u36 coherence protocol with history intact
    "u42_group_optimize",
    # (5) the state-rebalance contract: a checkpoint written at N
    # state partitions restores and continues at N under a
    # mismatched session — the operational pin behind every
    # 4-partition streaming fixture (r15 verdict ask #8)
    "st24_state_repartition_restore",
    # the composition u41 makes inevitable: the GROUP feed for a
    # sharded consumer — pointer short-circuit, band-pruned diff,
    # file-pruned insert feed for an added table, in one call
    "u43_txn_feed_pruned",
    # the first round-17 candidate, pulled in once the planned
    # window was green: group RESTORE as one pointer write —
    # mutually consistent by construction, history intact,
    # retention-composing (the restore roots what it reads)
    "u44_txn_restore",
    # the second round-17 candidate, also pulled in: view
    # maintenance SHARDED over the band-scoped feed — N daemons,
    # disjoint bucket ranges, per-shard pruned pulls, the union
    # recompute-exact (st22 proved the protocol; this proves it
    # partitions)
    "st25_sharded_view_daemon",
    # the last ledger candidate: OPTIMIZE planning driven by the
    # txn feed — plan cost O(the night's commits), physical
    # skip tooth (converged dirs renamed away, planner unmoved),
    # typed retention fallback to the full census
    "u45_feed_driven_optimize",
    # round-16 NEW and CHANGED-code registrations are inserted ABOVE
    # the leaders as the work lands (an untested registration never
    # waits behind stale refresh); each insertion displaces one fill
    # slot from the back in the same commit.
    #
    # CHANGED-code queries (widening plan item (1), the four
    # round-15 ADVICE fixes): identical oracles, but a rewrite must
    # earn fresh driver evidence before stale-green refresh.
    # txn_expire grew crash-idempotent recovery (below-head residue
    # defers to the keep-set expiry instead of wedging) and the
    # min_age_s concurrent-writer guard -> u37/u38/u39/st23;
    # txn_changes' retention refusal became the TYPED
    # RetentionExpiredError -> u34/u35; _apply_view_notification
    # rebaselines ONLY on that type (spec bugs re-raise) and
    # _ViewStore heals the old-present/view-missing crash shape ->
    # st22/st23.  Each displaces one fill slot from the back.
    "st22_stream_view_maintenance",
    "st23_feed_rebaseline",
    "u34_txn_change_feed",
    "u35_feed_view_maintenance",
    "u37_txn_retention",
    "u38_txn_tag_retention",
    "u39_group_erasure_gc",
    # the thirty-five r10-stale leaders the evidence-age guard forces
    # at newest=16 (round-15 verdict ask #1; recomputed from the
    # artifacts in this rotation commit)
    "a10_moment_statistics",
    "a11_geometric_mean",
    "a12_mode_per_group",
    "a13_histogram_equiwidth",
    "a2_distinct_counts",
    "a4_rollup_balances",
    "a4b_cube_quantities",
    "a4c_grouping_sets",
    "a5_conditional_agg",
    "a6_collect_sorted_lists",
    "a7_pivot_segment_revenue",
    "a8_unpivot_status_revenue",
    "a9_percentiles",
    "e1_event_funnel",
    "f_array_functions",
    "f_map_functions",
    "g2_pagerank",
    "l3b_minhash_lsh_pairs",
    "l3c_embedding_neardup",
    "l3h_portable_minhash",
    "l3k_incremental_index",
    "l4_cosine_topk_exact",
    "l4b_cosine_topk_blocked",
    "l4c_cosine_topk_vectorized",
    "l5_ann_lsh",
    "l5c_matryoshka_recall",
    "l6_vector_norms",
    "l7_word_frequency",
    "o1_global_sort",
    "p1_project_rename_cast",
    "q3_shipping_priority",
    "s10_zorder_clustering",
    "sql_correlated_subquery",
    "t_bpe_pair_counts",
    "ts_rolling_corr",
    # r11-stale fill: opened at 15 slots (the round-16 budget); the
    # 7 changed-code + 5 new registrations above displaced twelve
    # from the back (the dedup/ANN trio, the tolerance join, the
    # window pair, then u29..u23 of the lifecycle block), leaving
    # the riskiest head of the block — the CDC pair and the
    # schema-evolution merge
]

# Every other query has a driver-green row in r11-r15 -> back of the
# line.  The complement is listed explicitly (no overlap with the
# front list) so the "no stragglers" test keeps proving every
# registered query was either prioritized or consciously deferred.
_DRIVER_VERIFIED_R11_R15 = [
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
    "a3_approx_distinct",
    "a9b_percentile_approx",
    "dq3_mad_outliers",
    "dq4_freshness_audit",
    "dq5_reconciliation",
    "dq_null_profile",
    "dq_referential_integrity",
    "e2_interval_concurrency",
    "e3_touch_attribution",
    "e4_transition_matrix",
    "e5_rfm_segmentation",
    "f_datetime_functions",
    "f_hash_functions",
    "f_json_extraction",
    "f_math_null_functions",
    "f_string_functions",
    "f_try_functions",
    "f_variant_json",
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
    "l3d_simhash",
    "l3e_ngram_jaccard",
    "l3f_dup_clusters",
    "l3g_cluster_dedup_keep",
    "l3i_semantic_dedup",
    "l3j_chunk_dedup",
    "l3m_containment_dedup",
    "l3n_edit_distance_blocked",
    "l5_ivf_kmeans_topk",
    "l5_ivf_topk",
    "l5b2_ivf_kmeans_recall",
    "l5b_ivf_recall",
    "l5d_pq_recall",
    "l5d_pq_topk",
    "l8_tfidf_top_terms",
    "l9_lexicon_sentiment",
    "mm_binary_decode",
    "mm_chunk_expansion",
    "mm_feature_extract",
    "mm_resize_downsample",
    "o2_global_topk_orders",
    "o4_union_high_balance",
    "o5_intersect_except_nations",
    "o5b_intersect_except_all",
    "o6_distinct_flag_combos",
    "o7_incremental_topk",
    "o8_pareto_concentration",
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
    "q4_order_priority_check",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "s11_dpp_join",
    "s12_incremental_ingest",
    "s13_file_skipping_index",
    "s14_stats_only_count",
    "s15_bucketed_join",
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
    "st2_tumbling_window",
    "st3_sliding_window",
    "st4_session_window",
    "st5_streaming_dedup",
    "st6_stateful_running_totals",
    "st7_late_data_watermark",
    "st8_stream_static_join",
    "st9_foreach_batch_sink",
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
    "tr_weighted_sample",
    "ts_backtest_snaive",
    "ts_bollinger_bands",
    "ts_cross_sectional_zscore",
    "ts_ewma",
    "ts_gapfill_interpolate",
    "ts_max_drawdown",
    "ts_resample_monthly_ohlc",
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
    "u30_occ_multi_writer_stress",
    "u31_compaction_scheduler",
    "u32_erasure_hold_lifecycle",
    "u33_txn_occ_multi_table",
    "u36_stats_layout_coherence",
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
    "w6_ntile_acctbal_quartiles",
    "w7_percent_rank_cume_dist",
    "w8_value_window_family",
    "w9_gaps_islands",
]

reorder(_ROUND16_FRONT, defer=_DRIVER_VERIFIED_R11_R15)
