"""Registry iteration order IS evidence policy: the round driver's
external correctness check covers a prefix window of the registry, so
these tests pin the contract that the window is spent first on
never-yet-verified queries, then on queries whose code changed this
round, then on the stalest regression evidence.
"""

import update_database_by_wind_spark.operators as ops
from update_database_by_wind_spark.registry import REGISTRY

# The new round-10 operators, in window order.  Grows during the round:
# every newly-registered query is appended HERE and to the top of
# _ROUND10_FRONT in the same commit.
_R10_NEW = [
    "u21_mor_seq_compact",
]


def test_front_window_is_the_priority_list():
    names = list(REGISTRY)
    assert names[: len(ops._ROUND10_FRONT)] == ops._ROUND10_FRONT


def test_driver_verified_queries_are_deferred_to_the_back():
    names = list(REGISTRY)
    front = set(ops._ROUND10_FRONT)
    deferred = list(
        dict.fromkeys(
            n for n in ops._DRIVER_VERIFIED_R6_R9 if n not in front
        )
    )
    assert names[-len(deferred) :] == deferred


def test_priority_names_all_exist():
    # reorder() raises on unknown FRONT names but silently skips unknown
    # defer names — a typo there would quietly weaken the ordering
    for n in [*ops._ROUND10_FRONT, *ops._DRIVER_VERIFIED_R6_R9]:
        assert n in REGISTRY, n


def test_front_and_defer_do_not_overlap():
    """The round-6 advisor found a query listed in both the front and
    the defer list — harmless to reorder() (front wins) but it breaks
    the 'complement is listed explicitly' framing.  Keep the two lists
    disjoint by construction."""
    dup = set(ops._ROUND10_FRONT) & set(ops._DRIVER_VERIFIED_R6_R9)
    assert not dup, dup


def test_every_query_is_either_prioritized_or_known_verified():
    """No stragglers in the middle: every registered query must appear
    in the round-10 front (new + changed-code + stalest regression
    slots) or in the r6–r9 driver-green defer list.  A query in
    neither would sit just past the window and earn no evidence this
    round without anyone deciding that."""
    covered = set(ops._ROUND10_FRONT) | set(ops._DRIVER_VERIFIED_R6_R9)
    stragglers = [n for n in REGISTRY if n not in covered]
    assert not stragglers, stragglers


def test_changed_code_queries_lead_the_window():
    """NEW round-10 operators first (first-possible-green), then the
    three round-9 operators the missed r9 rotation orphaned (the r9
    window replayed the r8 front verbatim), then u18 whose code
    changed this round (MOR refusal guards + shared _compact_core),
    then the six r4-stale queries the r8 rotation consciously
    overflowed, then the whole 47-query r5 block alphabetically."""
    names = list(REGISTRY)
    n_new = len(_R10_NEW)
    assert names[:n_new] == _R10_NEW
    assert names[n_new : n_new + 4] == [
        "g2_pagerank",
        "u20_change_data_feed",
        "st16_stream_mor_cdc",
        "u18_mor_delete",
    ]
    assert names[n_new + 4 : n_new + 10] == [
        "ts_rolling_corr",
        "u11_wind_update_pipeline",
        "u2_upsert_merge",
        "ud2_pandas_scalar_udf",
        "ud3_pandas_grouped_agg",
        "w4_cumulative_spend",
    ]
    # the r5 block fills the rest of the window, alphabetically
    tail = names[n_new + 10 : len(ops._ROUND10_FRONT)]
    assert len(tail) == 47 and tail == sorted(tail)
    assert len(ops._ROUND10_FRONT) == n_new + 57


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
