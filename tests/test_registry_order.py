"""Registry iteration order IS evidence policy: the round driver's
external correctness check covers a prefix window of the registry, so
these tests pin the contract that the window is spent first on
never-yet-verified queries, then on queries whose code changed this
round, then on the stalest regression evidence.
"""

import update_database_by_wind_spark.operators as ops
from update_database_by_wind_spark.registry import REGISTRY


def test_front_window_is_the_priority_list():
    names = list(REGISTRY)
    assert names[: len(ops._ROUND8_FRONT)] == ops._ROUND8_FRONT


def test_driver_verified_queries_are_deferred_to_the_back():
    names = list(REGISTRY)
    front = set(ops._ROUND8_FRONT)
    deferred = list(
        dict.fromkeys(
            n for n in ops._DRIVER_VERIFIED_R5_R7 if n not in front
        )
    )
    assert names[-len(deferred) :] == deferred


def test_priority_names_all_exist():
    # reorder() raises on unknown FRONT names but silently skips unknown
    # defer names — a typo there would quietly weaken the ordering
    for n in [*ops._ROUND8_FRONT, *ops._DRIVER_VERIFIED_R5_R7]:
        assert n in REGISTRY, n


def test_front_and_defer_do_not_overlap():
    """The round-6 advisor found a query listed in both the front and
    the defer list — harmless to reorder() (front wins) but it breaks
    the 'complement is listed explicitly' framing.  Keep the two lists
    disjoint by construction."""
    dup = set(ops._ROUND8_FRONT) & set(ops._DRIVER_VERIFIED_R5_R7)
    assert not dup, dup


def test_every_query_is_either_prioritized_or_known_verified():
    """No stragglers in the middle: every registered query must appear
    in the round-8 front (new + changed-code + stalest regression
    slots) or in the r5–r7 driver-green defer list.  A query in
    neither would sit just past the window and earn no evidence this
    round without anyone deciding that."""
    covered = set(ops._ROUND8_FRONT) | set(ops._DRIVER_VERIFIED_R5_R7)
    stragglers = [n for n in REGISTRY if n not in covered]
    assert not stragglers, stragglers


def test_changed_code_queries_lead_the_window():
    """The five NEW round-8 operators (first-possible-green), then
    the three queries whose round-8 diff changes their code (atomic
    manifest + retry-safe snapshot commits behind u15/s12; ts_ewma's
    bit-exact across-users kernel), then the three round-3-stale
    stragglers the r7 verdict named as round 8's rotation leaders,
    then the 45 round-4-stale queries."""
    names = list(REGISTRY)
    assert names[:11] == [
        "u18_mor_delete",
        "u19_txn_snapshot",
        "a16_quantile_sketch",
        "a16b_grouped_quantile_sketch",
        "st15_stream_ingest_bridge",
        "u15_time_travel",
        "s12_incremental_ingest",
        "ts_ewma",
        "tr_k_anonymity",
        "tr_label_centroids",
        "tr_sequence_pack",
    ]
    # the r4 backlog fills the rest of the window, alphabetically
    assert names[11:56] == sorted(names[11:56])
    assert len(ops._ROUND8_FRONT) == 56


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
