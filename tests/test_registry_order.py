"""Registry iteration order IS evidence policy: the round driver's
external correctness check covers a prefix window of the registry, so
these tests pin the contract that the window is spent first on
never-yet-verified queries, then on queries whose code changed this
round, then on the stalest regression evidence.  Round 12 added the
evidence-age GUARD: staleness past six rounds is a red test, not a
ledger comment — round 14 opens by paying exactly the debt the guard
named against CORRECTNESS_r13 (the final thirteen r7-stale queries),
which puts every registered query within six rounds of driver
evidence for the first time since the window rotation began.
"""

import glob
import json
import os
import re

import update_database_by_wind_spark.operators as ops
from update_database_by_wind_spark.registry import REGISTRY

# Newly-registered queries this round.  Every newly-registered query
# is appended here and to the top of _ROUND14_FRONT in the same commit
# — and its oracle-match test plus this file must be run BEFORE that
# commit (the round-10 judge's "no untested registration" rule; g2/r9
# and s13/r10 both entered the registry broken in end-of-round commits
# that skipped the mirror).
_R14_NEW = [
    # widening plan (a): the second driver-checked read_parquet_pruned
    # consumer — an ordinary band aggregation with actual-files receipts
    "s16_pruned_reader_consumer",
    # Z-order clustering maintenance: z-span census -> targeted
    # re-sort of only the unclustered appends (u31's scheduler shape
    # on clustering health)
    "s17_zorder_maintenance",
    # trajectory surface: CDC stream with mid-stream seq-aware
    # compaction — one lifecycle, same checkpoint across the rewrite
    "st20_cdc_compact_live",
    # widening plan (b): OCC under interleaved multi-writer stress —
    # depth-2 rebase chain + refuse-then-retry
    "u30_occ_multi_writer_stress",
    # trajectory surface: small-file census -> targeted compaction of
    # only the fragmented partitions
    "u31_compaction_scheduler",
    # erasure-under-legal-hold lifecycle: delete -> tag root -> vacuum
    # -> partition-granular orphan GC (the new reclamation primitive)
    "u32_erasure_hold_lifecycle",
    # transaction-level OCC: u19's atomic pointer + u29/u30's conflict
    # ledger — concurrent writers to different tables of one group
    "u33_txn_occ_multi_table",
]

# Queries whose CODE changed this round: identical oracles, but a
# rewrite must earn fresh driver evidence before stale-green refresh
# (the "no untested registration" rule extended to rewrites).
# Populated as the round-14 widening plan lands (streaming pin swap,
# default-reader consumer); each addition moves the query to the front
# of _ROUND14_FRONT in the same commit as the code change.
_R14_CHANGED = [
    # widening plan (c): every harness-routed streaming query now
    # executes through run_stream_pinned — the foreachBatch parquet
    # sink replacing the memory-sink driver collect.  st14 is ALSO an
    # r7-stale leader; it sits here because changed-code outranks
    # stale-refresh.  st9/st12/st15/st16 are NOT here: their sinks
    # (foreachBatch JDBC / their own pinned writeStream paths) never
    # routed through the swapped harness.
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
]

# Round 13's named overflow: last driver-green row is round 7 — seven
# rounds stale, the queries the evidence-age guard forced into this
# window (round-13 verdict ask #1).
_R7_STALE_LEADERS = [
    "e2_interval_concurrency",
    "l11_quality_filter",
    "l3d_simhash",
    "l9_lexicon_sentiment",
    "mm_binary_decode",
    "mm_chunk_expansion",
    "st14_dedup_within_watermark",
    "tr_weighted_sample",
    "u14_retention_delete",
    "u16_join_view_maintenance",
    "u17_write_expectations",
    "w6_ntile_acctbal_quartiles",
    "w9_gaps_islands",
]


def test_front_window_is_the_priority_list():
    names = list(REGISTRY)
    assert names[: len(ops._ROUND14_FRONT)] == ops._ROUND14_FRONT


def test_driver_verified_queries_are_deferred_to_the_back():
    names = list(REGISTRY)
    front = set(ops._ROUND14_FRONT)
    deferred = list(
        dict.fromkeys(
            n for n in ops._DRIVER_VERIFIED_R9_R13 if n not in front
        )
    )
    assert names[-len(deferred) :] == deferred


def test_priority_names_all_exist():
    # reorder() raises on unknown FRONT names but silently skips unknown
    # defer names — a typo there would quietly weaken the ordering
    for n in [*ops._ROUND14_FRONT, *ops._DRIVER_VERIFIED_R9_R13]:
        assert n in REGISTRY, n


def test_front_and_defer_do_not_overlap():
    """The round-6 advisor found a query listed in both the front and
    the defer list — harmless to reorder() (front wins) but it breaks
    the 'complement is listed explicitly' framing.  Keep the two lists
    disjoint by construction."""
    dup = set(ops._ROUND14_FRONT) & set(ops._DRIVER_VERIFIED_R9_R13)
    assert not dup, dup


def test_every_query_is_either_prioritized_or_known_verified():
    """No stragglers in the middle: every registered query must appear
    in the round-14 front (new + changed-code + stalest regression
    slots) or in the r9–r13 driver-green defer list.  A query in
    neither would sit just past the window and earn no evidence this
    round without anyone deciding that — exactly how s13 missed round
    10 (it was registered but in neither list)."""
    covered = set(ops._ROUND14_FRONT) | set(ops._DRIVER_VERIFIED_R9_R13)
    stragglers = [n for n in REGISTRY if n not in covered]
    assert not stragglers, stragglers


def test_window_structure():
    """New queries first, then changed-code, then the thirteen
    r7-stale leaders the evidence-age guard named, then the r9-stale
    fill (streaming block first — most of it becomes changed-code when
    the pin swap lands — then joins, dedup/similarity, lifecycle, set
    ops, filters, ingest, training, time series).  The nine r9-stale
    queries past the window edge (a1 — re-executed by bench.py every
    round, a16b — its ranks machinery earned r13 evidence via
    a16/st17, and the seven f_* scalar families) are round 15's
    leaders — the guard will force them at r15 exactly as it forced
    this round's thirteen."""
    names = list(REGISTRY)
    n_new = len(_R14_NEW)
    assert names[:n_new] == _R14_NEW
    n_chg = len(_R14_CHANGED)
    assert names[n_new : n_new + n_chg] == _R14_CHANGED
    lead_end = n_new + n_chg + len(_R7_STALE_LEADERS)
    leaders = [
        n for n in _R7_STALE_LEADERS if n not in set(_R14_CHANGED)
    ]
    assert (
        names[n_new + n_chg : n_new + n_chg + len(leaders)] == leaders
    )
    lead_end = n_new + n_chg + len(leaders)
    # the r9 fill: every remaining window slot is an r9-stale query,
    # grouped by family with each block sorted
    fill = names[lead_end : len(ops._ROUND14_FRONT)]
    blocks: list[list[str]] = []
    for n in fill:
        fam = re.match(r"[a-z]+", n).group(0)
        if blocks and re.match(r"[a-z]+", blocks[-1][-1]).group(0) == fam:
            blocks[-1].append(n)
        else:
            blocks.append([n])
    for b in blocks:
        assert b == sorted(b), b
    assert len(ops._ROUND14_FRONT) == lead_end + len(fill)
    assert len(ops._ROUND14_FRONT) == 50


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
    assert newest >= 13, "CORRECTNESS artifacts missing from the repo"
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


def test_st15_oracle_is_verbatim_s12_oracle():
    """ST15's whole claim is that streaming discovery lands the table
    the batch manifest loop lands — the two queries must share ONE
    oracle, byte for byte.  (The string is inlined in pipelines.py to
    avoid a worker-side import cycle; this test is the tie.)"""
    from update_database_by_wind_spark.operators.sources_ops import (
        _S12_ORACLE,
    )

    assert REGISTRY["st15_stream_ingest_bridge"].oracle == _S12_ORACLE
