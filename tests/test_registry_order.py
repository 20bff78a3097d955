"""Registry iteration order IS evidence policy: the round driver's
external correctness check covers a prefix window of the registry, so
these tests pin the contract that the window is spent first on queries
that have never earned a driver-verified row, then on regression
evidence for this round's churn.
"""

import update_database_by_wind_spark.operators as ops
from update_database_by_wind_spark.registry import REGISTRY


def test_front_window_is_the_priority_list():
    names = list(REGISTRY)
    assert names[: len(ops._ROUND4_FRONT)] == ops._ROUND4_FRONT


def test_driver_verified_queries_are_deferred_to_the_back():
    names = list(REGISTRY)
    front = set(ops._ROUND4_FRONT)
    deferred = list(
        dict.fromkeys(
            n for n in ops._DRIVER_VERIFIED_R1_R3 if n not in front
        )
    )
    assert names[-len(deferred) :] == deferred


def test_priority_names_all_exist():
    # reorder() raises on unknown FRONT names but silently skips unknown
    # defer names — a typo there would quietly weaken the ordering
    for n in [*ops._ROUND4_FRONT, *ops._DRIVER_VERIFIED_R1_R3]:
        assert n in REGISTRY, n


def test_every_query_is_either_prioritized_or_known_verified():
    """No stragglers in the middle: every registered query must appear
    in the round-4 front (never-verified residue + this round's
    regression slots) or in the r1∪r2∪r3 driver-green defer list.  A
    query in neither would sit just past the window and earn no
    evidence this round without anyone deciding that."""
    covered = set(ops._ROUND4_FRONT) | set(ops._DRIVER_VERIFIED_R1_R3)
    stragglers = [n for n in REGISTRY if n not in covered]
    assert not stragglers, stragglers


def test_never_verified_queries_lead_the_window():
    """The 19 queries with no driver CORRECTNESS row in any round
    (r1–r3) must occupy the very front of the window — the whole point
    of the round-4 ordering."""
    never = [
        n
        for n in ops._ROUND4_FRONT
        if n not in set(ops._DRIVER_VERIFIED_R1_R3)
        and n
        not in (
            "l3j_chunk_dedup",
            "tr_mix_weights",
            "tr_token_budget",
            "l2b_canonical_dedup",
            "u12_cdc_classify",
        )
    ]
    names = list(REGISTRY)
    assert names[: len(never)] == never
