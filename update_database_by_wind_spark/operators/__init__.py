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
# the registry.  Latest-green distribution entering round 15 (computed
# from CORRECTNESS_r01..r14): r14 50, r13 49, r12 44, r11 41, r10 45,
# r9 20.  Round 14 cleared the last of the r7 debt; round 15 opens, per
# the round-14 verdict's ask #1, by paying exactly the debt the
# evidence-age guard names at newest=15 — the TWENTY r9-stale queries
# (threshold: latest green <= 15 - 6 = 9 must sit inside the window).
# Window spend, in order of evidence value:
# (a) the twenty r9-stale leaders (a1_pricing_summary, a16b, the seven
#     r9 f_* scalar families, o5/o5b/o6, p2/p3, s12_incremental_ingest,
#     the four tr_* plumbing queries, ts_ewma).  With these refreshed,
#     every registered query is within five rounds of driver evidence;
# (b) r10-stale fill, riskiest families first (streaming CDC, the
#     update lifecycle, pandas UDFs, windows, joins, the dedup/ANN
#     l-family) and pure-expression aggregates last — so that as
#     round-15 code work landed and new / changed-code queries
#     displaced fill from the back (the "no untested registration"
#     rule, extended to rewrites), what dropped out was the
#     lowest-risk block.  The rotation opened with THIRTY fill slots;
#     the round's 13 new + 7 changed registrations displaced
#     twenty (a2, a4, a4b, a4c, a5, a6, a7, a8, g2, l3b, l3c, l3h,
#     l3k, l4, l4b, l4c, l5_ann_lsh, l5c, l6, l7), leaving 10 in the
#     final window.  Round 16's forced leaders are therefore
#     THIRTY-FIVE r10-stale queries: the fifteen never in fill (a9, a10-a13
#     moment/mode/histogram expression aggregates, e1_event_funnel,
#     f_array/f_map, o1_global_sort, p1, q3 — re-benched implicitly
#     via the TPC-H block, s10_zorder_clustering — its machinery
#     earned r14 evidence via s17, sql_correlated_subquery,
#     t_bpe_pair_counts, ts_rolling_corr; NOT a9b — its latest green
#     is r12) plus the twenty displaced; the guard will force them
#     at r16 exactly as it forced this round's twenty, and 35 fits
#     the 50-window with 15 slots for new work — hold round 16's
#     widening to that budget.
#     Recompute from the CORRECTNESS artifacts when rotating — this
#     paragraph is planning context, the artifacts are truth.
#
# Round-15 widening plan — ALL FOUR ITEMS EXECUTED this round:
# (a) landed as st21_gated_compact_live (st20's live-compaction
# lifecycle gated by u31's small-file census through
# mor_compact_seq's new parts scope — the scoped fold that removes
# only the folded partitions' vector subdirs — with receipts pinning
# BOTH branches: a broad batch that provably does not fire and a hot
# burst that fires for exactly the months it fragmented); (b) landed
# as s18_partition_clustering_health (partition_zspan_census — s17's
# z-span rule per PARTITION dir — feeding a targeted re-sort into
# bit-aligned curve quarters); (c) BOTH slots-remain surfaces landed:
# s19_snapshot_stats_travel (snapshot_commit_stats /
# snapshot_stats_for / snapshot_read_pruned — S13 stats published per
# commit and reassembled through U15 manifests, version-exact
# skipping on non-partition predicates) and u34_txn_change_feed
# (txn_changes — U20's changelog resolved through U19's transaction
# pointer, mutually consistent multi-table deltas with the
# untouched-table metadata short-circuit).  The three round-14
# ADVICE fixes shipped as changed-code entries (partition_orphan_gc
# unquote -> u32, self-healing compact_partitions -> u31, the
# txn_occ_commit refusal contract -> u33), and the scoped-fold core
# change pulled st20/u18/u21/u24 into changed-code slots.  Two more
# surfaces landed late-round: u35_feed_view_maintenance (the consumer
# that justifies u34 — a cross-table materialized view maintained
# incrementally from txn_changes deltas through the shared
# apply_feed_deltas algebra, recompute-checked cell-exact after every
# application) and st22_stream_view_maintenance (the SAME algebra as
# the checkpointed daemon: commit-log notifications,
# watermark-inside-the-rename idempotent application proven against
# redelivery AND an empty re-run; oracle shared verbatim with u35,
# identity pinned in the order test).  The stats-commit wrapper also
# landed (snapshot_commit_with_stats, crash-ordering unit-tested), and
# a review pass closed six gaps (txn_changes added-table inserts
# feed, scoped-fold merge of insert-fragmented partitions via
# compact_partitions' `only` work order, the st9 delta-log tag
# scoping, kept-list receipts in snapshot_read_pruned, this ledger's
# arithmetic, u34's docstring).  The two round-16 candidate surfaces
# named here in the executed plan ALSO landed late-round, after the
# planned window was green: u36_stats_layout_coherence
# (snapshot_compact_stats = compact_partitions inside v{k} +
# snapshot_stats_resync — existence-driven, partition-proportional
# ledger repair, so a compaction inside a version dir republishes
# exactly that version's travelling ledger and every snapshot
# referencing it keeps pruning exactly) and u37_txn_retention
# (txn_expire — u26's expiry lifted through the txn pointer: head
# guard, crashed-attempt orphan reclaim, pointers removed before any
# data reclaim so a crash can only leak, per-table snapshot_expire
# with retained-pointer versions as roots, stats ledgers dying with
# their version dirs).  Both of the round-16 candidates named here
# were THEMSELVES pulled in late-round once the planned window was
# green (s20_snapshot_clustering_stats — range clustering inside a
# version dir under the same coherence protocol, with the
# kept-fraction sharpness receipt; u38_txn_tag_retention — named
# refs on transactions as GC roots with the computed keep-last-N
# policy), plus the interaction they expose (st23_feed_rebaseline —
# the st22 daemon re-baselines when retention expires its watermark,
# then resumes incremental service) and a txn_expire hypothesis fuzz
# (random histories x random keep sets vs a dict-model replay).
# Two of the three fresh candidates ALSO landed before round close
# (the compose-and-certify loop ran three times this round):
# s21_snapshot_multiband (conjunctive multi-column bands through one
# stats probe, the kept set pinned as the intersection of the
# single-band reads, with partitioning x clustering giving both
# dimensions real pruning) and u39_group_erasure_gc
# (txn_partition_gc — u32's partition GC lifted through the txn
# pointer behind a manifests-match-pointers consistency guard, with
# the auditor's-disk-walk receipt that erased bytes are GONE and the
# no-op-on-fully-retained receipt).  Remaining candidate round-16
# surfaces (write the plan before registering, and mind the 15-slot
# budget above): age-based txn retention (keep-by-age computing
# keep_txns from an embedded commit stamp, composing with
# txn_expire_untagged's tag roots); stats-aware snapshot_changes (the
# U20 diff pruned through the travelling ledgers so a CDC diff of a
# band-disjoint version pair is metadata-only); and a group-level
# OPTIMIZE planner (partition_zspan_census + small_file_census across
# every table of a txn group feeding one maintenance work order).

_ROUND15_FRONT = [
    # round-15 NEW registrations (widening plan items (a), (b) and
    # both slots-remain surfaces (c)): an untested registration never
    # waits behind stale refresh
    "s18_partition_clustering_health",
    "s19_snapshot_stats_travel",
    "st21_gated_compact_live",
    "st22_stream_view_maintenance",
    "u34_txn_change_feed",
    "u35_feed_view_maintenance",
    # the two round-16 candidate surfaces the ledger named, landed
    # late-round once the planned window was green: stats/layout
    # coherence (compaction inside a version dir republishes that
    # version's travelling ledger) and transaction-group retention
    # (u26's expiry lifted through the txn pointer)
    "u36_stats_layout_coherence",
    "u37_txn_retention",
    # the composition that makes txn_expire deployable: named refs on
    # transactions as GC roots + the computed keep-last-N policy
    # (u28's tags-reconcile-retention story at group granularity)
    "u38_txn_tag_retention",
    # the retention <-> consumer interaction those two make
    # inevitable: the st22 daemon wakes to an expired watermark,
    # refuses the torn diff, re-baselines once, resumes incremental
    "st23_feed_rebaseline",
    # the other rewriter under the same coherence protocol: range
    # clustering inside a version dir (skipping gets SHARPER, not
    # just cheaper), ledger republished, kept-fraction receipt
    "s20_snapshot_clustering_stats",
    # conjunctive multi-column bands through the travelling stats —
    # partitioning x clustering makes BOTH dimensions prune, and the
    # kept set is pinned as the intersection of the single-band reads
    "s21_snapshot_multiband",
    # group erasure made physically complete: u32's partition GC
    # lifted through the txn pointer, no-op-when-retained receipt
    "u39_group_erasure_gc",
    # CHANGED-code queries: identical oracles, but a rewrite must earn
    # fresh driver evidence before stale-green refresh.  st20/u18/u21/
    # u24 route through the compaction core that grew the scoped-fold
    # path (mor_compact_seq(parts=...) / _compact_core vector_scope);
    # u31's compact_partitions now self-heals an interrupted rename
    # swap on every pass, u32's partition_orphan_gc probes the live
    # set with DECODED dir suffixes, u33's txn_occ_commit refuses an
    # expired base pointer under the ValueError contract (the three
    # round-14 ADVICE fixes)
    "st20_cdc_compact_live",
    "u18_mor_delete",
    "u21_mor_seq_compact",
    "u24_mor_seq_erasure",
    "u31_compaction_scheduler",
    "u32_erasure_hold_lifecycle",
    "u33_txn_occ_multi_table",
    # the twenty r9-stale leaders the evidence-age guard forces at
    # newest=15 (round-14 verdict ask #1; named in the r14 ledger)
    "a16b_grouped_quantile_sketch",
    "a1_pricing_summary",
    "f_datetime_functions",
    "f_hash_functions",
    "f_json_extraction",
    "f_math_null_functions",
    "f_string_functions",
    "f_try_functions",
    "f_variant_json",
    "o5_intersect_except_nations",
    "o5b_intersect_except_all",
    "o6_distinct_flag_combos",
    "p2_filter_kitchen_sink",
    "p3_case_when_tiers",
    "s12_incremental_ingest",
    "tr_k_anonymity",
    "tr_mix_weights",
    "tr_sequence_pack",
    "tr_token_budget",
    "ts_ewma",
    # r10-stale fill, riskiest families first (displacement from the
    # back drops pure-expression aggregates, not lifecycle/streaming)
    "st12_stream_cdc_apply",
    "u11_wind_update_pipeline",
    "u20_change_data_feed",
    "u2_upsert_merge",
    "ud2_pandas_scalar_udf",
    "ud3_pandas_grouped_agg",
    "w4_cumulative_spend",
    "j10_salted_skew_join",
    "j2b_full_outer_join",
    "l1_exact_dedup",
]

# Every other query has a driver-green row in r10-r14 -> back of the
# line.  The complement is listed explicitly (no overlap with the
# front list) so the "no stragglers" test keeps proving every
# registered query was either prioritized or consciously deferred.
_DRIVER_VERIFIED_R10_R14 = [
    "a10_moment_statistics",
    "a11_geometric_mean",
    "a12_mode_per_group",
    "a13_histogram_equiwidth",
    "a14_kmv_sketch",
    "a15_heavy_hitters",
    "a16_quantile_sketch",
    "a17_countmin_sketch",
    "a18_hll_sketch",
    "a19_grouped_hll",
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
    "e2_interval_concurrency",
    "e3_touch_attribution",
    "e4_transition_matrix",
    "e5_rfm_segmentation",
    "f_array_functions",
    "f_map_functions",
    "g2_pagerank",
    "g3_triangle_count",
    "g4_bfs_hops",
    "j11_null_safe_join",
    "j12_bloom_prefilter",
    "j13_interval_bin_join",
    "j14_asof_tolerance",
    "j1_star_join_revenue",
    "j1d_star_join_revenue_decimal",
    "j2_left_join_order_counts",
    "j3_semi_join_active_customers",
    "j4_anti_join_inactive_customers",
    "j5_cross_join_region_status",
    "j6_theta_band_join",
    "j7_range_join_daily_windows",
    "j8_asof_join_last_click",
    "j8b_asof_join_pandas",
    "l10_multimodal_join",
    "l11_quality_filter",
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
    "l3m_containment_dedup",
    "l3n_edit_distance_blocked",
    "l3k_incremental_index",
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
    "o7_incremental_topk",
    "o8_pareto_concentration",
    "p1_project_rename_cast",
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
    "s13_file_skipping_index",
    "s14_stats_only_count",
    "s15_bucketed_join",
    "s16_pruned_reader_consumer",
    "s17_zorder_maintenance",
    "s1b_partitioned_parquet",
    "s2_csv_roundtrip",
    "s2b_orc_roundtrip",
    "s2c_xml_roundtrip",
    "s3_json_roundtrip",
    "s4_jdbc_roundtrip",
    "s9_external_feed",
    "sql_correlated_subquery",
    "st10_stream_stream_join",
    "st11_streaming_ohlc",
    "st13_stream_outer_join",
    "st14_dedup_within_watermark",
    "st15_stream_ingest_bridge",
    "st16_stream_mor_cdc",
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
    "st9_foreach_batch_sink",
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
    "tr_label_centroids",
    "tr_shuffle_shard",
    "tr_stratified_sample",
    "tr_weighted_sample",
    "ts_backtest_snaive",
    "ts_bollinger_bands",
    "ts_cross_sectional_zscore",
    "ts_gapfill_interpolate",
    "ts_max_drawdown",
    "ts_resample_monthly_ohlc",
    "ts_rolling_corr",
    "ts_rsi",
    "ts_sessionize_batch",
    "ts_twap",
    "ts_vwap",
    "u10_table_checksum",
    "u12_cdc_classify",
    "u13_cdc_merge_sink",
    "u14_retention_delete",
    "u15_time_travel",
    "u16_join_view_maintenance",
    "u17_write_expectations",
    "u19_txn_snapshot",
    "u1_incremental_diff",
    "u22_merge_schema_evolution",
    "u23_snapshot_restore",
    "u25_partition_evolution",
    "u26_snapshot_vacuum",
    "u27_orphan_gc",
    "u28_snapshot_tags",
    "u29_occ_commit",
    "u30_occ_multi_writer_stress",
    "u3_scd2_history",
    "u4_idempotent_rerun",
    "u5_calendar_backfill",
    "u6_schema_evolution",
    "u7_compaction",
    "u8_cow_partition_merge",
    "u9_incremental_rollup",
    "u9d_incremental_rollup_decimal",
    "ud1_scalar_python_udf",
    "ud5_udtf_bigrams",
    "w10_event_runs",
    "w11_cumulative_distinct",
    "w1_rank_top_orders_per_segment",
    "w2_lag_daily_returns",
    "w3_moving_average",
    "w3b_time_range_rolling",
    "w5_forward_fill",
    "w6_ntile_acctbal_quartiles",
    "w7_percent_rank_cume_dist",
    "w8_value_window_family",
    "w9_gaps_islands",
]

reorder(_ROUND15_FRONT, defer=_DRIVER_VERIFIED_R10_R14)
