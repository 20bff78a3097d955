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

# The driver's per-round correctness check covers a ~50-entry prefix of the
# registry.  Round 1's window verified aggregates/analytics/dedup/similarity
# (CORRECTNESS_r01.json); round 2 front-loads everything that has never had
# a driver-verified row — the join family, the update pipeline (the
# namesake), windows, TPC-H shapes — plus queries whose semantics changed
# this round (l3e's stop-shingle cap).  Already-verified queries are
# deferred to the back so the window is spent only on new evidence.
_ROUND2_FRONT = [
    # §2.3 joins J1–J11
    "j1_star_join_revenue",
    "j2_left_join_order_counts",
    "j3_semi_join_active_customers",
    "j4_anti_join_inactive_customers",
    "j5_cross_join_region_status",
    "j6_theta_band_join",
    "j7_range_join_daily_windows",
    "j8_asof_join_last_click",
    "j10_salted_skew_join",
    "j11_null_safe_join",
    # §2.9 update pipeline U1–U10 + DQ audits (the namesake)
    "u1_incremental_diff",
    "u2_upsert_merge",
    "u3_scd2_history",
    "u4_idempotent_rerun",
    "u5_calendar_backfill",
    "u6_schema_evolution",
    "u7_compaction",
    "u8_cow_partition_merge",
    "u9_incremental_rollup",
    "u10_table_checksum",
    "dq_referential_integrity",
    "dq_null_profile",
    # §2.5 windows W1–W6
    "w1_rank_top_orders_per_segment",
    "w2_lag_daily_returns",
    "w3_moving_average",
    "w3b_time_range_rolling",
    "w4_cumulative_spend",
    "w5_forward_fill",
    "w6_ntile_acctbal_quartiles",
    # TPC-H depth shapes
    "q5_local_supplier_volume",
    "q10_returned_item_revenue",
    "q12_late_shipment_priority",
    "q14_promo_revenue",
    "q18_large_volume_orders",
    "q22_dormant_high_balance",
    # semantics changed this round (stop-shingle cap) → re-verify
    "l3e_ngram_jaccard",
    # new this round: trained k-means IVF + its recall gate
    "l5_ivf_kmeans_topk",
    "l5b2_ivf_kmeans_recall",
    # upgraded this round: rows-only → real JDBC staged-MERGE with oracle
    "st9_foreach_batch_sink",
    # new this round: DECIMAL-typed money paths (lossless string rendering)
    "a1d_pricing_summary_decimal",
    "j1d_star_join_revenue_decimal",
    "u9d_incremental_rollup_decimal",
    # upgraded this round: rows-only → oracle (recursive-CTE replay /
    # error-bound bracket)
    "ts_ewma",
    "a9b_percentile_approx",
    # new this round: the six most distinctive of the 14 added TPC-H
    # shapes (subquery decorrelation family) — the other eight, plus the
    # scalar families and set ops, queue in the middle for round 3.
    "q2_min_cost_supplier",
    "q4_order_priority_check",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q21_suppliers_kept_waiting",
    # positions 51+: first in line if the driver's window is larger
    "l3f_dup_clusters",
    "l3g_cluster_dedup_keep",
    "l3h_portable_minhash",
    "st3_sliding_window",
    "st4_session_window",
    "a3_approx_distinct",
    "tr_sequence_pack",
]

# round-1 driver-verified window (CORRECTNESS_r01.json keys) → back of the
# line; names listed in _ROUND2_FRONT (e.g. l3e) stay front.
_ROUND1_VERIFIED = [
    "a1_pricing_summary",
    "a2_distinct_counts",
    # a3 deliberately NOT deferred: upgraded this round from rows-only to a
    # bracket oracle, so it queues mid-registry for a fresh verified row.
    "a4_rollup_balances",
    "a5_conditional_agg",
    "a6_collect_sorted_lists",
    "a7_pivot_segment_revenue",
    "a8_unpivot_status_revenue",
    "a9_percentiles",
    "a10_moment_statistics",
    "a4c_grouping_sets",
    "a11_geometric_mean",
    "a12_mode_per_group",
    "a13_histogram_equiwidth",
    "w7_percent_rank_cume_dist",
    "ts_max_drawdown",
    "ts_rsi",
    "ts_vwap",
    "w8_value_window_family",
    "l1_exact_dedup",
    "l2_hash_dedup",
    "l3a_near_dup_signatures",
    "l3b_minhash_lsh_pairs",
    "j2b_full_outer_join",
    "a4b_cube_quantities",
    "f_map_functions",
    "f_array_functions",
    "ts_resample_monthly_ohlc",
    "ts_sessionize_batch",
    "q3_shipping_priority",
    "ts_cross_sectional_zscore",
    "ts_bollinger_bands",
    "l4_cosine_topk_exact",
    "l4b_cosine_topk_blocked",
    # l5_ann_lsh deliberately NOT deferred: upgraded this round from
    # rows-only to a recall-guarantee oracle → queues for a verified row.
    "l6_vector_norms",
    "l5_ivf_topk",
    "l4c_cosine_topk_vectorized",
    "l5b_ivf_recall",
    "l3c_embedding_neardup",
    "l3d_simhash",
    "t_token_count",
    "ud1_scalar_python_udf",
    "ud5_udtf_bigrams",
    "p1_project_rename_cast",
    "o1_global_sort",
]

reorder(_ROUND2_FRONT, defer=_ROUND1_VERIFIED)
