"""Registry iteration order IS evidence policy: the round driver's
external correctness check covers a prefix window of the registry, so
these tests pin the contract that the window is spent first on
never-yet-verified queries, then on queries whose code changed this
round, then on the stalest regression evidence.
"""

import update_database_by_wind_spark.operators as ops
from update_database_by_wind_spark.registry import REGISTRY

# The new round-11 operators, in window order.  Grows during the round:
# every newly-registered query is appended HERE and to the top of
# _ROUND11_FRONT in the same commit — and its oracle-match test plus
# this file must be run BEFORE that commit (the round-10 judge's "no
# untested registration" rule; g2/r9 and s13/r10 both entered the
# registry broken in end-of-round commits that skipped the mirror).
_R11_NEW = [
    "g3_triangle_count",
    "a17_countmin_sketch",
    "u22_merge_schema_evolution",
    "st17_stream_quantile_sketch",
    "o7_incremental_topk",
    "dq3_mad_outliers",
    "u23_snapshot_restore",
    "e3_touch_attribution",
    "s14_stats_only_count",
    "u24_mor_seq_erasure",
    "a18_hll_sketch",
    "ts_gapfill_interpolate",
    "s15_bucketed_join",
    "w10_event_runs",
    "a19_grouped_hll",
    "u25_partition_evolution",
    "a20_kmv_set_algebra",
    "u26_snapshot_vacuum",
    "g4_bfs_hops",
    "l3m_containment_dedup",
    "mm_feature_extract",
    "e4_transition_matrix",
    "st18_stream_cms",
    "j13_interval_bin_join",
    "dq4_freshness_audit",
    "u27_orphan_gc",
    "st19_stream_hll",
    "l5d_pq_topk",
    "l5d_pq_recall",
    "w11_cumulative_distinct",
    "t_oov_rate",
    "u28_snapshot_tags",
    "u29_occ_commit",
    "j14_asof_tolerance",
    "l3n_edit_distance_blocked",
    "e5_rfm_segmentation",
    "dq5_reconciliation",
    "ts_backtest_snaive",
    "o8_pareto_concentration",
]

# Queries whose CODE changed this round without being new: s13's crash
# fix (AttributeError on ParquetSchema.num_columns) plus the advisor's
# edge-case hardening landed this round, and s13 has never had a
# driver-green row — it leads the changed-code slots.
_R11_CHANGED = [
    "s13_file_skipping_index",
    # the vector family's micro-grid refactor (ROUND(double,6)
    # representation-midpoint fix, found by a hypothesis counterexample
    # in the generative embeddings sweep): IVF assignment, k-means
    # quantizer, both recall gates, and the label-centroid means now
    # run on exact integer micro-grid arithmetic
    "l5_ivf_topk",
    "l5_ivf_kmeans_topk",
    "l5b_ivf_recall",
    "l5b2_ivf_kmeans_recall",
    "tr_label_centroids",
]


def test_front_window_is_the_priority_list():
    names = list(REGISTRY)
    assert names[: len(ops._ROUND11_FRONT)] == ops._ROUND11_FRONT


def test_driver_verified_queries_are_deferred_to_the_back():
    names = list(REGISTRY)
    front = set(ops._ROUND11_FRONT)
    deferred = list(
        dict.fromkeys(
            n for n in ops._DRIVER_VERIFIED_R7_R10 if n not in front
        )
    )
    assert names[-len(deferred) :] == deferred


def test_priority_names_all_exist():
    # reorder() raises on unknown FRONT names but silently skips unknown
    # defer names — a typo there would quietly weaken the ordering
    for n in [*ops._ROUND11_FRONT, *ops._DRIVER_VERIFIED_R7_R10]:
        assert n in REGISTRY, n


def test_front_and_defer_do_not_overlap():
    """The round-6 advisor found a query listed in both the front and
    the defer list — harmless to reorder() (front wins) but it breaks
    the 'complement is listed explicitly' framing.  Keep the two lists
    disjoint by construction."""
    dup = set(ops._ROUND11_FRONT) & set(ops._DRIVER_VERIFIED_R7_R10)
    assert not dup, dup


def test_every_query_is_either_prioritized_or_known_verified():
    """No stragglers in the middle: every registered query must appear
    in the round-11 front (new + changed-code + stalest regression
    slots) or in the r7–r10 driver-green defer list.  A query in
    neither would sit just past the window and earn no evidence this
    round without anyone deciding that — exactly how s13 missed round
    10 (it was registered but in neither list)."""
    covered = set(ops._ROUND11_FRONT) | set(ops._DRIVER_VERIFIED_R7_R10)
    stragglers = [n for n in REGISTRY if n not in covered]
    assert not stragglers, stragglers


def test_changed_code_queries_lead_the_window():
    """NEW round-11 operators first (first-possible-green), then s13 —
    never driver-checked AND crash-fixed this round (the round-10
    judge's #1 ask), then the eight r5-stale queries (the window-edge
    overflow of rounds 9 AND 10, led by the twice-overflowed u12/u13),
    then the whole r6 block alphabetically.  Positions past ~50 — the
    r5 tail and all of r6 — are the conscious overflow and round 12's
    leaders."""
    names = list(REGISTRY)
    n_new = len(_R11_NEW)
    assert names[:n_new] == _R11_NEW
    n_chg = len(_R11_CHANGED)
    assert names[n_new : n_new + n_chg] == _R11_CHANGED
    assert names[n_new + n_chg : n_new + n_chg + 8] == [
        # u12/u13 first: they overflowed the r9 AND r10 window edges —
        # within equal staleness, most-missed goes first
        "u12_cdc_classify",
        "u13_cdc_merge_sink",
        "t_token_count",
        "tr_domain_cap",
        "ts_bollinger_bands",
        "ts_cross_sectional_zscore",
        "ts_max_drawdown",
        "ts_resample_monthly_ohlc",
    ]
    # the r6 block fills the rest of the window, alphabetically (48
    # entries entering the round, minus the two kmeans queries promoted
    # into the changed-code slot by the micro-grid refactor)
    tail = names[n_new + n_chg + 8 : len(ops._ROUND11_FRONT)]
    assert len(tail) == 46 and tail == sorted(tail)
    assert len(ops._ROUND11_FRONT) == n_new + n_chg + 54


def test_st15_oracle_is_verbatim_s12_oracle():
    """ST15's whole claim is that streaming discovery lands the table
    the batch manifest loop lands — the two queries must share ONE
    oracle, byte for byte.  (The string is inlined in pipelines.py to
    avoid a worker-side import cycle; this test is the tie.)"""
    from update_database_by_wind_spark.operators.sources_ops import (
        _S12_ORACLE,
    )
    from update_database_by_wind_spark.streaming.pipelines import (
        _ST15_ORACLE,
    )

    assert _ST15_ORACLE == _S12_ORACLE
