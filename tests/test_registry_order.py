"""Registry iteration order IS evidence policy: the round driver's
external correctness check covers a prefix window of the registry, so
these tests pin the contract that the window is spent first on
never-yet-verified queries, then on queries whose code changed this
round, then on the stalest regression evidence.  Round 12 added the
evidence-age GUARD: staleness past six rounds is a red test, not a
ledger comment — round 16 opens by paying exactly the debt the guard
names against CORRECTNESS_r15 at newest=16 (the thirty-five r10-stale
queries), which keeps every registered query within five rounds of
driver evidence.
"""

import glob
import json
import os
import re

import update_database_by_wind_spark.operators as ops
from update_database_by_wind_spark.registry import REGISTRY

# Newly-registered queries this round.  Every newly-registered query
# is appended here and to the top of _ROUND16_FRONT in the same commit
# — and its oracle-match test plus this file must be run BEFORE that
# commit (the round-10 judge's "no untested registration" rule; g2/r9
# and s13/r10 both entered the registry broken in end-of-round commits
# that skipped the mirror).
_R16_NEW: list[str] = [
    # widening plan (2): "keep 15 days + every tagged release" as one
    # computed keep set over the group — txn_commit_at's embedded
    # stamp + txn_expire_by_age over txn_expire's machinery
    "u40_txn_age_retention",
    # widening plan (3): snapshot_changes_pruned — U20's diff pruned
    # through S19's travelling ledgers, partition-level both-sides
    # band rule, metadata-only on disjoint pairs
    "u41_cdc_stats_pruned",
    # widening plan (4): txn_optimize_plan/_run — small_file_census +
    # partition_zspan_census across the group's head-referenced
    # version dirs, one work order, u36-coherent execution
    "u42_group_optimize",
    # widening plan (5): the checkpoint owns the state partition
    # count — restore-and-continue at N under a mismatched session
    "st24_state_repartition_restore",
    # u34 x u41: the band-scoped group feed — three cost classes
    # (pointer short-circuit / band-pruned diff / file-pruned insert
    # feed) in one txn_changes_pruned call
    "u43_txn_feed_pruned",
    # group RESTORE through the pointer: one metadata write, inverse
    # change feed, retention-composing (the r17 candidate pulled in)
    "u44_txn_restore",
    # st22 x u43: two shard daemons, disjoint bucket ranges, pruned
    # per-shard pulls conserving the manifest diff, union exact
    "st25_sharded_view_daemon",
    # u42 x u34: feed-driven OPTIMIZE planning — O(commits) scope,
    # physical skip tooth, typed retention fallback
    "u45_feed_driven_optimize",
]

# Queries whose CODE changed this round: identical oracles, but a
# rewrite must earn fresh driver evidence before stale-green refresh
# (the "no untested registration" rule extended to rewrites).
# Populated as the round-16 work lands (the four round-15 ADVICE fixes
# to txn_expire and the view daemon, the widening plan); each addition
# moves the query to the front of _ROUND16_FRONT in the same commit as
# the code change.
_R16_CHANGED: list[str] = [
    # the four round-15 ADVICE fixes (widening plan item (1)):
    # txn_expire crash-idempotent recovery + min_age_s concurrent-
    # writer guard; txn_changes' typed RetentionExpiredError;
    # _apply_view_notification rebaselining only on that type;
    # _ViewStore healing the interrupted rename swap
    "st22_stream_view_maintenance",
    "st23_feed_rebaseline",
    "u34_txn_change_feed",
    "u35_feed_view_maintenance",
    "u37_txn_retention",
    "u38_txn_tag_retention",
    "u39_group_erasure_gc",
]

# Round 15's named overflow: last driver-green row is round 10 — the
# thirty-five queries the evidence-age guard forces into this window
# at newest=16 (round-15 verdict ask #1; recomputed from the artifacts
# in the rotation commit, identical to the r15 ledger's list).
_R10_STALE_LEADERS = [
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
]

# The r11-stale fill's family-block sequence, riskiest first: when new
# or changed-code registrations displace fill from the back, what
# drops out is the dedup/ANN trio and the window pair, never the
# update-lifecycle CDC/snapshot block.  (The round-14 advisor asked
# for this explicit sequence assertion — the generic sorted-blocks
# check alone cannot see ordering BETWEEN families.)
_FILL_FAMILY_SEQUENCE = ["u", "w", "j", "l"]


def test_front_window_is_the_priority_list():
    names = list(REGISTRY)
    assert names[: len(ops._ROUND16_FRONT)] == ops._ROUND16_FRONT


def test_driver_verified_queries_are_deferred_to_the_back():
    names = list(REGISTRY)
    front = set(ops._ROUND16_FRONT)
    deferred = list(
        dict.fromkeys(
            n for n in ops._DRIVER_VERIFIED_R11_R15 if n not in front
        )
    )
    assert names[-len(deferred) :] == deferred


def test_priority_names_all_exist():
    # reorder() raises on unknown FRONT names but silently skips unknown
    # defer names — a typo there would quietly weaken the ordering
    for n in [*ops._ROUND16_FRONT, *ops._DRIVER_VERIFIED_R11_R15]:
        assert n in REGISTRY, n


def test_front_and_defer_do_not_overlap():
    """The round-6 advisor found a query listed in both the front and
    the defer list — harmless to reorder() (front wins) but it breaks
    the 'complement is listed explicitly' framing.  Keep the two lists
    disjoint by construction."""
    dup = set(ops._ROUND16_FRONT) & set(ops._DRIVER_VERIFIED_R11_R15)
    assert not dup, dup


def test_every_query_is_either_prioritized_or_known_verified():
    """No stragglers in the middle: every registered query must appear
    in the round-16 front (new + changed-code + stalest regression
    slots) or in the r11–r15 driver-green defer list.  A query in
    neither would sit just past the window and earn no evidence this
    round without anyone deciding that — exactly how s13 missed round
    10 (it was registered but in neither list)."""
    covered = set(ops._ROUND16_FRONT) | set(ops._DRIVER_VERIFIED_R11_R15)
    stragglers = [n for n in REGISTRY if n not in covered]
    assert not stragglers, stragglers


def test_window_structure():
    """New queries first, then changed-code, then the thirty-five
    r10-stale leaders the evidence-age guard named, then the r11-stale
    fill in the pinned family sequence (riskiest first, each block
    sorted).  Round 17's forced leaders are the r11-green queries that
    neither this fill nor displacement refreshes — recompute from the
    artifacts when rotating; the guard forces them at r17 exactly as
    it forced this round's thirty-five."""
    names = list(REGISTRY)
    n_new = len(_R16_NEW)
    assert names[:n_new] == _R16_NEW
    n_chg = len(_R16_CHANGED)
    assert names[n_new : n_new + n_chg] == _R16_CHANGED
    # leaders follow, minus any promoted into the new/changed blocks
    leaders = [
        n
        for n in _R10_STALE_LEADERS
        if n not in set(_R16_CHANGED) and n not in set(_R16_NEW)
    ]
    lead_start = n_new + n_chg
    lead_end = lead_start + len(leaders)
    assert names[lead_start:lead_end] == leaders
    # the r11 fill: every remaining window slot is grouped by family,
    # each block sorted, and the blocks follow the pinned risk order
    # (a prefix of it once displacement starts dropping the back)
    fill = names[lead_end : len(ops._ROUND16_FRONT)]
    blocks: list[list[str]] = []
    for n in fill:
        fam = re.match(r"[a-z]+", n).group(0)
        if blocks and re.match(r"[a-z]+", blocks[-1][-1]).group(0) == fam:
            blocks[-1].append(n)
        else:
            blocks.append([n])
    for b in blocks:
        assert b == sorted(b), b
    fams = [re.match(r"[a-z]+", b[0]).group(0) for b in blocks]
    assert fams == _FILL_FAMILY_SEQUENCE[: len(fams)], fams
    assert len(ops._ROUND16_FRONT) == lead_end + len(fill)
    assert len(ops._ROUND16_FRONT) == 50


def _latest_green_rounds() -> tuple[dict[str, int], int, int]:
    """Latest driver-green round per query, from the CORRECTNESS
    artifacts committed in-repo, plus the newest artifact round and
    its query count (the observed window size)."""
    root = os.path.join(os.path.dirname(__file__), "..")
    latest: dict[str, int] = {}
    newest, window = 0, 50
    for f in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        with open(f) as fh:
            data = json.load(fh)
        if rnd > newest:
            newest, window = rnd, len(data)
        for q, v in data.items():
            if (
                v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match")
                and not v.get("err")
            ):
                latest[q] = max(latest.get(q, 0), rnd)
    return latest, newest, window


def test_evidence_age_guard():
    """The round-11 judge's ask #8: staleness becomes a RED TEST.  Any
    registered query whose latest driver-green CORRECTNESS row is more
    than six rounds older than the newest artifact — or that has no
    green row at all — must sit inside the upcoming window (the first
    `window` registry positions, where `window` is the newest
    artifact's query count), so the next driver run refreshes it.
    When this fails, rotate _ROUND{N}_FRONT; do not widen the
    threshold."""
    latest, newest, window = _latest_green_rounds()
    assert newest >= 15, "CORRECTNESS artifacts missing from the repo"
    in_window = set(list(REGISTRY)[:window])
    overdue = [
        q
        for q in REGISTRY
        if latest.get(q, 0) <= newest - 6 and q not in in_window
    ]
    assert not overdue, (
        f"queries with driver evidence older than six rounds sit "
        f"outside the {window}-query window: {overdue}"
    )


def test_rotation_anticipates_next_round():
    """The r16 rotation must ALSO hold when CORRECTNESS_r16 lands: at
    newest=16 the guard threshold moves to <=10, so every query whose
    latest green row is round 10 or earlier must already sit inside
    the current window.  This is the assertion that failed silently in
    rounds 12–14's planning (the ledger said it; no test checked it
    before the artifact arrived), and the tripwire that correctly went
    red on the round-15 tree the moment CORRECTNESS_r15 landed."""
    latest, newest, window = _latest_green_rounds()
    in_window = set(list(REGISTRY)[:window])
    next_overdue = [
        q
        for q in REGISTRY
        if latest.get(q, 0) <= (newest + 1) - 6 and q not in in_window
    ]
    assert not next_overdue, next_overdue


def test_st22_oracle_is_verbatim_u35_oracle():
    """ST22's whole claim is that the checkpointed daemon lands the
    view u35's batch maintenance lands — the two queries must share
    ONE oracle, byte for byte (the st15/s12 pattern)."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        _U35_ORACLE,
    )

    assert REGISTRY["st22_stream_view_maintenance"].oracle == _U35_ORACLE
    assert REGISTRY["u35_feed_view_maintenance"].oracle == _U35_ORACLE


def test_st15_oracle_is_verbatim_s12_oracle():
    """ST15's whole claim is that streaming discovery lands the table
    the batch manifest loop lands — the two queries must share ONE
    oracle, byte for byte.  (The string is inlined in pipelines.py to
    avoid a worker-side import cycle; this test is the tie.)"""
    from update_database_by_wind_spark.operators.sources_ops import (
        _S12_ORACLE,
    )

    assert REGISTRY["st15_stream_ingest_bridge"].oracle == _S12_ORACLE
