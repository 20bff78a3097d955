"""Registry iteration order IS evidence policy: the round driver's
external correctness check covers a prefix window of the registry, so
these tests pin the contract that the window is spent on queries that
have never earned (or need a fresh) driver-verified row.
"""

import update_database_by_wind_spark.operators as ops
from update_database_by_wind_spark.registry import REGISTRY


def test_front_window_is_the_priority_list():
    names = list(REGISTRY)
    assert names[: len(ops._ROUND2_FRONT)] == ops._ROUND2_FRONT


def test_round1_verified_queries_are_deferred_to_the_back():
    names = list(REGISTRY)
    deferred = [
        n for n in ops._ROUND1_VERIFIED if n not in set(ops._ROUND2_FRONT)
    ]
    assert names[-len(deferred) :] == deferred


def test_priority_names_all_exist():
    for n in [*ops._ROUND2_FRONT, *ops._ROUND1_VERIFIED]:
        assert n in REGISTRY, n
