"""Registry iteration order IS evidence policy: the round driver's
external correctness check covers a prefix window of the registry, so
these tests pin the contract that the window is spent first on
never-yet-verified queries, then on queries whose code changed this
round, then on the stalest regression evidence.  Round 12 added the
evidence-age GUARD: staleness past six rounds is a red test, not a
ledger comment — round 15 opens by paying exactly the debt the guard
names against CORRECTNESS_r14 at newest=15 (the twenty r9-stale
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
# is appended here and to the top of _ROUND15_FRONT in the same commit
# — and its oracle-match test plus this file must be run BEFORE that
# commit (the round-10 judge's "no untested registration" rule; g2/r9
# and s13/r10 both entered the registry broken in end-of-round commits
# that skipped the mirror).
_R15_NEW: list[str] = [
    # widening plan (b): s17's z-span census per PARTITION dir feeding
    # the u31 scheduler shape — per-partition clustering health with
    # the re-sort scoped to the degraded files of the degraded dirs
    "s18_partition_clustering_health",
    # widening plan (c): S13 stats published per COMMIT and reassembled
    # through U15 manifests — version-exact file skipping on
    # non-partition predicates (hidden-partitioning read path)
    "s19_snapshot_stats_travel",
    # widening plan (a): st20's live-compaction lifecycle gated by
    # u31's small-file census policy through mor_compact_seq's scoped
    # fold — receipts pin the fired AND the not-fired branch
    "st21_gated_compact_live",
    # u35's algebra as the streaming daemon: checkpointed commit-log
    # notifications, watermark-inside-the-rename idempotent
    # application, exactly-once across runs
    "st22_stream_view_maintenance",
    # widening plan (c): u20's row-level changelog resolved through
    # u19's transaction pointer (txn_changes) — mutually consistent
    # multi-table deltas with a metadata short-circuit for untouched
    # tables
    "u34_txn_change_feed",
    # the feed's consumer: a cross-table materialized view maintained
    # incrementally from txn_changes deltas, recompute-checked after
    # every application
    "u35_feed_view_maintenance",
    # the two round-16 candidate surfaces the ledger named, pulled
    # into this round once the planned window was green: travelling
    # stats republished across a compaction inside a version dir
    "u36_stats_layout_coherence",
    # u26's expiry lifted through the txn pointer — group GC that can
    # never break a retained transaction's reads
    "u37_txn_retention",
    # named refs on transactions as GC roots + the computed
    # keep-last-N policy over txn_expire
    "u38_txn_tag_retention",
    # the retention <-> consumer interaction: the maintenance daemon
    # re-baselines when its watermark transaction was expired, then
    # resumes incremental service
    "st23_feed_rebaseline",
    # range clustering inside a version dir under the same stats
    # coherence protocol — skipping gets sharper, not just cheaper
    "s20_snapshot_clustering_stats",
    # conjunctive multi-column bands through the travelling stats
    "s21_snapshot_multiband",
    # group erasure made physically complete via pointer-lifted
    # partition GC
    "u39_group_erasure_gc",
]

# Queries whose CODE changed this round: identical oracles, but a
# rewrite must earn fresh driver evidence before stale-green refresh
# (the "no untested registration" rule extended to rewrites).
# Populated as the round-15 work lands (ADVICE fixes to the lifecycle
# primitives, the widening plan); each addition moves the query to the
# front of _ROUND15_FRONT in the same commit as the code change.
_R15_CHANGED: list[str] = [
    # the compaction core grew the scoped-fold path
    # (mor_compact_seq(parts=...) / _compact_core vector_scope):
    # every query routing through it re-earns driver evidence
    "st20_cdc_compact_live",
    "u18_mor_delete",
    "u21_mor_seq_compact",
    "u24_mor_seq_erasure",
    # the three round-14 ADVICE fixes
    "u31_compaction_scheduler",
    "u32_erasure_hold_lifecycle",
    "u33_txn_occ_multi_table",
]

# Round 14's named overflow: last driver-green row is round 9 — the
# twenty queries the evidence-age guard forces into this window at
# newest=15 (round-14 verdict ask #1; named verbatim in the r14
# ledger).
_R9_STALE_LEADERS = [
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
]

# The r10-stale fill's family-block sequence, riskiest first: when new
# or changed-code registrations displace fill from the back, what
# drops out is the pure-expression aggregate block, never the
# streaming/lifecycle shapes.  (The round-14 advisor asked for this
# explicit sequence assertion — the generic sorted-blocks check alone
# cannot see ordering BETWEEN families.)
_FILL_FAMILY_SEQUENCE = ["st", "u", "ud", "w", "j", "l", "g", "a"]


def test_front_window_is_the_priority_list():
    names = list(REGISTRY)
    assert names[: len(ops._ROUND15_FRONT)] == ops._ROUND15_FRONT


def test_driver_verified_queries_are_deferred_to_the_back():
    names = list(REGISTRY)
    front = set(ops._ROUND15_FRONT)
    deferred = list(
        dict.fromkeys(
            n for n in ops._DRIVER_VERIFIED_R10_R14 if n not in front
        )
    )
    assert names[-len(deferred) :] == deferred


def test_priority_names_all_exist():
    # reorder() raises on unknown FRONT names but silently skips unknown
    # defer names — a typo there would quietly weaken the ordering
    for n in [*ops._ROUND15_FRONT, *ops._DRIVER_VERIFIED_R10_R14]:
        assert n in REGISTRY, n


def test_front_and_defer_do_not_overlap():
    """The round-6 advisor found a query listed in both the front and
    the defer list — harmless to reorder() (front wins) but it breaks
    the 'complement is listed explicitly' framing.  Keep the two lists
    disjoint by construction."""
    dup = set(ops._ROUND15_FRONT) & set(ops._DRIVER_VERIFIED_R10_R14)
    assert not dup, dup


def test_every_query_is_either_prioritized_or_known_verified():
    """No stragglers in the middle: every registered query must appear
    in the round-15 front (new + changed-code + stalest regression
    slots) or in the r10–r14 driver-green defer list.  A query in
    neither would sit just past the window and earn no evidence this
    round without anyone deciding that — exactly how s13 missed round
    10 (it was registered but in neither list)."""
    covered = set(ops._ROUND15_FRONT) | set(ops._DRIVER_VERIFIED_R10_R14)
    stragglers = [n for n in REGISTRY if n not in covered]
    assert not stragglers, stragglers


def test_window_structure():
    """New queries first, then changed-code, then the twenty r9-stale
    leaders the evidence-age guard named, then the r10-stale fill in
    the pinned family sequence (riskiest first, each block sorted).
    Round 16's forced leaders are the THIRTY-FIVE r10-stale queries
    outside the final window — the fifteen never in fill (a9, a10–a13,
    e1, f_array/f_map, o1, p1, q3, s10, sql_correlated, t_bpe,
    ts_rolling_corr; not a9b, whose latest green is r12) plus the
    twenty the round's registrations displaced (a2, a4–a8 family, g2,
    l3b, l3c, l3h, l3k, the l4 cosine block, l5_ann_lsh, l5c, l6,
    l7) — recompute from the artifacts when rotating; the guard
    forces them at r16 exactly as it forced this round's twenty."""
    names = list(REGISTRY)
    n_new = len(_R15_NEW)
    assert names[:n_new] == _R15_NEW
    n_chg = len(_R15_CHANGED)
    assert names[n_new : n_new + n_chg] == _R15_CHANGED
    # leaders follow, minus any promoted into the changed-code block
    leaders = [
        n
        for n in _R9_STALE_LEADERS
        if n not in set(_R15_CHANGED) and n not in set(_R15_NEW)
    ]
    lead_start = n_new + n_chg
    lead_end = lead_start + len(leaders)
    assert names[lead_start:lead_end] == leaders
    # the r10 fill: every remaining window slot is grouped by family,
    # each block sorted, and the blocks follow the pinned risk order
    # (a prefix of it once displacement starts dropping the back)
    fill = names[lead_end : len(ops._ROUND15_FRONT)]
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
    assert len(ops._ROUND15_FRONT) == lead_end + len(fill)
    assert len(ops._ROUND15_FRONT) == 50


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
    assert newest >= 14, "CORRECTNESS artifacts missing from the repo"
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
    """The r15 rotation must ALSO hold when CORRECTNESS_r15 lands: at
    newest=15 the guard threshold moves to <=9, so every query whose
    latest green row is round 9 or earlier must already sit inside the
    current window.  This is the assertion that failed silently in
    rounds 12–14's planning (the ledger said it; no test checked it
    before the artifact arrived)."""
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
