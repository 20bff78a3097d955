"""Registry iteration order IS evidence policy: the round driver's
external correctness check covers a prefix window of the registry, so
these tests pin the contract that the window is spent on queries that
have never earned (or need a fresh) driver-verified row.
"""

import update_database_by_wind_spark.operators as ops
from update_database_by_wind_spark.registry import REGISTRY


def test_front_window_is_the_priority_list():
    names = list(REGISTRY)
    assert names[: len(ops._ROUND3_FRONT)] == ops._ROUND3_FRONT


def test_driver_verified_queries_are_deferred_to_the_back():
    names = list(REGISTRY)
    deferred = [
        n
        for n in ops._DRIVER_VERIFIED_R1_R2
        if n not in set(ops._ROUND3_FRONT)
    ]
    assert names[-len(deferred) :] == deferred


def test_priority_names_all_exist():
    for n in [*ops._ROUND3_FRONT, *ops._DRIVER_VERIFIED_R1_R2]:
        assert n in REGISTRY, n


def test_front_window_covers_the_never_verified_residue():
    """Every query without a round-1/2 driver row must sit ahead of
    every already-verified one (the 50-entry window is spent only on
    new evidence)."""
    names = list(REGISTRY)
    verified = set(ops._DRIVER_VERIFIED_R1_R2)
    first_verified = min(
        i for i, n in enumerate(names) if n in verified
    )
    stragglers = [
        n for n in names[first_verified:] if n not in verified
    ]
    assert not stragglers, stragglers
