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
# the registry.  Latest-green distribution entering round 18 (computed
# from CORRECTNESS_r01..r17 in this rotation commit): r17 50, r16 45,
# r15 43, r14 46, r13 49, r12 41.  Round 17 cleared the whole r11 debt;
# round 18 opens, per the round-17 verdict's ask #1 (and the
# already-red test_rotation_anticipates_next_round tripwire), by paying
# exactly the debt the evidence-age guard names at newest=18
# (threshold: latest green <= 18 - 6 = 12 must sit inside the window) —
# the FORTY-ONE r12-stale queries, recomputed from the artifacts this
# rotation and identical to the list the r17 ledger and verdict both
# named.  Window spend, in order of evidence value:
# (a) the forty-one r12-stale leaders (a14/a1d/a9b, dq_null/dq_ref,
#     the j2-j7 + j11-j13 foundational join block, j1d, l8, mm_resize,
#     s11/s14, st15/st16, t_unigram, the tr_* training-split block,
#     the seven-query ts indicator block + ts_sessionize + zscore,
#     and the u1-u10 foundational lifecycle block).  With these
#     refreshed, every registered query is within five rounds of
#     driver evidence;
# (b) NINE r13-stale fill slots — the round's whole widening budget
#     (the r17 verdict's arithmetic: 41 forced leaders fit the
#     50-window with 9 slots for new work).  Fill is riskiest
#     families first (the u9/u9d incremental-rollup pair, then the
#     storage/format round-trip block s13/s1b/s2/s2b/s2c/s3/s4 —
#     external-format and JDBC surfaces whose environment can drift)
#     so that as round-18 work lands and new / changed-code queries
#     displace fill from the back (the "no untested registration"
#     rule, extended to rewrites), what drops out last is the rollup
#     pair.
# Round 19's forced leaders are therefore the r13-green queries that
# neither this fill nor displacement refreshes: 49 are r13-green
# entering the round (a3/a15/a16, e5, o8, the q2-q22 TPC-H block,
# s1b/s2x/s3/s4/s9/s13, the t_* text-quality block, u9/u9d,
# ud1/ud5, w1/w2/w3/w3b/w5/w7/w8).  Final round-18 spend: EIGHT
# new/changed registrations (u48, st28, st29, u49, u50, st30, u37,
# u41) displaced s4/s3/s2c/s2b/s2/s1b/s13/u9d; ONE fill slot
# survives (u9, r18-refreshed).  So 48 leaders are forced at
# newest=19 and the round-19 widening budget is 2 slots — kept
# deliberately nonzero because round-19 ADVICE fixes are changed-code
# slots too.  Recompute from the CORRECTNESS artifacts when rotating
# — this paragraph is planning context, the artifacts are truth.
#
# Candidate round-19 surfaces (mind the 2-slot budget): a view
# DAEMON observing schema evolution through its feed spec (u50
# proved the batch algebra; st22's daemon redeployed with the
# evolved spec mid-lifecycle is the streaming half); the evolved
# column flowing through the STATS path (snapshot_commit_stats /
# band pruning on a column only some vintages carry); and migrating
# st24/st27's nested checkpoint inspectors onto
# _ckpt_state_parts/_ckpt_offsets_conf when their rotation forces
# them anyway (round-18 review finding #4, half-done: st29 already
# uses the module-level pair).  Round-19 candidates (a)/(b)/(c) from
# the original list all landed in-round (u50, st30, u49).
#
# Round-18 widening plan (the round-17 verdict's asks #2-#5 plus the
# ADVICE findings; budget 9 slots, spend tracked here as work lands):
# (1) ADVICE medium — txn_expire's head-rollback loop skips unpointed
#     residue manifests between head_root and an expired head (a
#     previously crashed expiry), so the NEXT run's head guard
#     crashes mid-run; reclaim residue above head_root in the same
#     pass and keep the receipt accurate -> changed-code u37, plus a
#     crashed-expiry + restore-drop case in the retention fuzz;
# (2) ADVICE low — _has_young_manifest's os.listdir unguarded against
#     a concurrently-removed table dir -> same u37 slot;
# (3) ADVICE low — u41's proper-subset tooth asserted explicitly when
#     in_range is a proper subset of changed -> changed-code u41;
# (4) verdict ask #2 — sharded restore-aware consumers (st26 x st25):
#     two band-sharded daemons each applying their slice of u44's
#     inverse feed through txn_changes_pruned -> NEW st28;
# (5) verdict ask #3 — keyed-state relocation: drain an
#     applyInPandasWithState checkpoint through the statestore source
#     and re-seed per-key state via an explicit state-injection batch
#     at a new partition count -> NEW st29;
# (6) verdict ask #4 — maintenance x retention race: u46's shard
#     planners racing u47's age daemon, refusal-or-defer receipts,
#     never a torn dir -> NEW u48, plus the maintenance actor in the
#     retention fuzz dict model;
# (7) verdict ask #5 — split update_pipeline.py into snapshot /
#     txn-group / maintenance modules at the round boundary
#     (re-exports keep import paths; zero window slots).

_ROUND18_FRONT = [
    # round-18 NEW and CHANGED-code registrations are inserted ABOVE
    # the leaders as the work lands (an untested registration never
    # waits behind stale refresh); each insertion displaces one fill
    # slot from the back in the same commit.
    #
    # round-18 NEW registration (widening plan item (6), verdict ask
    # #4): the maintenance daemon racing the retention daemon — both
    # race directions deterministically interleaved through the new
    # self-validating executor (txn_optimize_run_guarded): a stale
    # work order naming a version the rollback's expiry reclaimed
    # skips whole with the table dir byte-identical (never a torn
    # dir, nothing resurrected), a pre-retention order executes and
    # the expiry then reclaims the rewritten version ledger and all,
    # and an order superseded by a later live commit narrows to the
    # partitions the version still owns.  The race is also fuzzed
    # against the dict model (test_guarded_maintenance_races_retention).
    # Displaced the s2c fill slot.
    "u48_maintenance_retention_race",
    # round-18 NEW registration (widening plan item (4), verdict ask
    # #2): the production rollback shape — TWO band-sharded view
    # daemons (st25's split) each applying their slice of a group
    # restore's INVERSE feed (st26's protocol) through the band-scoped
    # pruned feed (u43), including the dropped-table delete slice;
    # per-shard mode ledgers pin [(2, incremental), (3, inverse)],
    # rebaseline forbidden on both shards, scans band-contained and
    # diff-conserving at BOTH transactions, and the shard union
    # round-trips byte-exactly to the pre-deploy state.  Displaced
    # the s2b fill slot.
    "st28_sharded_restore_view",
    # round-18 NEW registration (widening plan item (5), verdict ask
    # #3): keyed-state relocation — drain an applyInPandasWithState
    # checkpoint (count + sum + MAX per key: merge-able, NOT a plain
    # sum) through the official statestore source, re-seed a
    # 7-partition checkpoint via an explicit is_seed state-injection
    # batch merged by the fold itself, resume under a mismatched
    # 11-partition session; st27's receipt family end to end plus a
    # never-relocated control run landing identical state.  Displaced
    # the s2 fill slot.
    "st29_keyed_state_relocation",
    # round-18 NEW registration (post-certification extension of
    # widening item (6), the verdict ask's LITERAL shape): u46's
    # SHARD planners racing u47's AGE daemon — per-shard stale work
    # orders planned against day 10, the 15-day policy firing at day
    # 30 (aging out both the maintenance watermark and the planned-
    # against transaction), each shard's order narrowing shard-locally
    # with NARROWING CONSERVED across the split (the shards' narrowed
    # sets union to the unsharded order's), the feed re-plan refusing
    # with the typed retention error and the band-scoped full-census
    # fallback converging the group.  Oracle is u48's VERBATIM (same
    # corrections, same final state: neither sharding nor the policy
    # may change one cell).  Displaced the s1b fill slot.
    "u49_policy_sharded_maintenance",
    # round-18 NEW registration (round-19 candidate (a) pulled
    # forward): the change feed across SCHEMA EVOLUTION — a widening
    # commit leaves mixed vintages under one manifest (evolved read =
    # the allowMissingColumns union; time travel keeps the narrow
    # schema), the 1→2 feed carries NULL channel_before for every row
    # (the column predates the span), the straddling 2→3 correction
    # feeds mixed-vintage before-images with zero channel migrations,
    # and the per-(year, channel) view maintained by signed GROUP
    # MOVES (u35's algebra with a mutable group key) equals the
    # recompute cell-exactly after every application.  The enabling
    # machinery change (snapshot_read/snapshot_changes NULL-backfill
    # vintage gaps) is crash-replacing only — mixed schemas previously
    # raised AnalysisException, so every previously-succeeding
    # consumer is byte-identical and no changed-code slot is owed
    # (the u37 precedent).  Displaced the s13 fill slot.
    "u50_schema_evolution_feed",
    # round-18 NEW registration (round-19 candidate (b) pulled
    # forward): resharding a LIVE maintenance fleet — st25's 2-shard
    # fleet grows to 3 mid-lifecycle by splitting the hot band's
    # store (derived from the PUBLISHED view alone, watermark carried
    # verbatim — never a fact scan or feed replay), retiring the old
    # store behind the typed ViewStoreRetiredError fence (a stale
    # daemon wake-up refuses byte-untouched), and resuming on FRESH
    # checkpoints whose history redelivery the store watermark gates
    # (mode ledgers pin [(2, skip), (3, incremental)] on both
    # successors).  Deliberate contrast with st29: keyed state must
    # drain through the fold; a foreachBatch daemon's durable state
    # is the store, so its checkpoint is disposable.  Oracle is
    # st25's VERBATIM (a reshard that changes one cell is not a
    # reshard).  Displaced the u9d fill slot.
    "st30_fleet_reshard",
    # CHANGED-code queries (widening plan items (1)-(3), the round-17
    # ADVICE fixes): identical oracles, but a rewrite must earn fresh
    # driver evidence before stale-green refresh (their r17 rows
    # predate this round's rewrite).  txn_expire's head rollback now
    # reclaims aged unpointed residue manifests above the rolled-back
    # head (the crashed-expiry wedge) with the deferral receipt kept
    # accurate, and its dropped-table sweep defers when the table dir
    # itself churns mid-listing -> u37; u41's strict proper-subset
    # pruning tooth is asserted explicitly whenever out-of-band
    # rewrites exist -> u41.  The two insertions displaced the s4/s3
    # fill slots from the back.  The new expiry branch is reachable
    # only on inputs where the old code CRASHED (unpointed aged
    # residue above a rolled-back head), so every other txn_expire
    # consumer is behavior-identical on every previously-succeeding
    # input — pinned by the deterministic repro and the
    # crash x restore-drop fuzz in tests/test_txn_retention_fuzz.py.
    "u37_txn_retention",
    "u41_cdc_stats_pruned",
    # the forty-one r12-stale leaders the evidence-age guard forces
    # at newest=18 (round-17 verdict ask #1; recomputed from the
    # artifacts in this rotation commit)
    "a14_kmv_sketch",
    "a1d_pricing_summary_decimal",
    "a9b_percentile_approx",
    "dq_null_profile",
    "dq_referential_integrity",
    "j11_null_safe_join",
    "j12_bloom_prefilter",
    "j13_interval_bin_join",
    "j1d_star_join_revenue_decimal",
    "j2_left_join_order_counts",
    "j3_semi_join_active_customers",
    "j4_anti_join_inactive_customers",
    "j5_cross_join_region_status",
    "j6_theta_band_join",
    "j7_range_join_daily_windows",
    "l8_tfidf_top_terms",
    "mm_resize_downsample",
    "s11_dpp_join",
    "s14_stats_only_count",
    "st15_stream_ingest_bridge",
    "st16_stream_mor_cdc",
    "t_unigram_logprob",
    "tr_decontamination",
    "tr_hash_split",
    "tr_shuffle_shard",
    "tr_stratified_sample",
    "ts_cross_sectional_zscore",
    "ts_max_drawdown",
    "ts_resample_monthly_ohlc",
    "ts_rsi",
    "ts_sessionize_batch",
    "ts_twap",
    "ts_vwap",
    "u10_table_checksum",
    "u1_incremental_diff",
    "u3_scd2_history",
    "u4_idempotent_rerun",
    "u5_calendar_backfill",
    "u6_schema_evolution",
    "u7_compaction",
    "u8_cow_partition_merge",
    # r13-stale fill: opened at 9 slots (the round-18 budget,
    # riskiest families first — the u9/u9d incremental-rollup pair,
    # then the storage/format round-trip block); every new or
    # changed-code registration above displaces one from the back
    # (the 2 changed-code ADVICE entries displaced s4 and s3)
    "u9_incremental_rollup",
]

# Every other query has a driver-green row in r13-r17 -> back of the
# line.  The complement is listed explicitly (no overlap with the
# front list) so the "no stragglers" test keeps proving every
# registered query was either prioritized or consciously deferred.
_DRIVER_VERIFIED_R13_R17 = [
    "a10_moment_statistics",
    "a11_geometric_mean",
    "a12_mode_per_group",
    "a13_histogram_equiwidth",
    "a15_heavy_hitters",
    "a16_quantile_sketch",
    "a16b_grouped_quantile_sketch",
    "a17_countmin_sketch",
    "a18_hll_sketch",
    "a19_grouped_hll",
    "a1_pricing_summary",
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
    "dq3_mad_outliers",
    "dq4_freshness_audit",
    "dq5_reconciliation",
    "e1_event_funnel",
    "e2_interval_concurrency",
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
    "j14_asof_tolerance",
    "j1_star_join_revenue",
    "j2b_full_outer_join",
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
    "l9_lexicon_sentiment",
    "mm_binary_decode",
    "mm_chunk_expansion",
    "mm_feature_extract",
    "o1_global_sort",
    "o2_global_topk_orders",
    "o4_union_high_balance",
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
    "s12_incremental_ingest",
    "s13_file_skipping_index",
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
    "sql_correlated_subquery",
    "st10_stream_stream_join",
    "st11_streaming_ohlc",
    "st12_stream_cdc_apply",
    "st13_stream_outer_join",
    "st14_dedup_within_watermark",
    "st17_stream_quantile_sketch",
    "st18_stream_cms",
    "st19_stream_hll",
    "st20_cdc_compact_live",
    "st21_gated_compact_live",
    "st22_stream_view_maintenance",
    "st23_feed_rebaseline",
    "st24_state_repartition_restore",
    "st25_sharded_view_daemon",
    "st26_restore_inverse_view",
    "st27_state_relocation",
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
    "t_oov_rate",
    "t_quality_score",
    "t_redact_blocklist",
    "t_repetition_ratio",
    "t_token_count",
    "tr_domain_cap",
    "tr_k_anonymity",
    "tr_label_centroids",
    "tr_mix_weights",
    "tr_sequence_pack",
    "tr_token_budget",
    "tr_weighted_sample",
    "ts_backtest_snaive",
    "ts_bollinger_bands",
    "ts_ewma",
    "ts_gapfill_interpolate",
    "ts_rolling_corr",
    "u11_wind_update_pipeline",
    "u12_cdc_classify",
    "u13_cdc_merge_sink",
    "u14_retention_delete",
    "u15_time_travel",
    "u16_join_view_maintenance",
    "u17_write_expectations",
    "u18_mor_delete",
    "u19_txn_snapshot",
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
    "u34_txn_change_feed",
    "u35_feed_view_maintenance",
    "u36_stats_layout_coherence",
    "u38_txn_tag_retention",
    "u39_group_erasure_gc",
    "u40_txn_age_retention",
    "u42_group_optimize",
    "u43_txn_feed_pruned",
    "u44_txn_restore",
    "u45_feed_driven_optimize",
    "u46_sharded_optimize",
    "u47_age_policy_daemon",
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

reorder(_ROUND18_FRONT, defer=_DRIVER_VERIFIED_R13_R17)
