"""Registry iteration order IS evidence policy: the round driver's
external correctness check covers a prefix window of the registry, so
these tests pin the contract that the window is spent first on queries
whose code changed this round, then on the stalest regression evidence
(round-1 green, then round-2 green).
"""

import update_database_by_wind_spark.operators as ops
from update_database_by_wind_spark.registry import REGISTRY


def test_front_window_is_the_priority_list():
    names = list(REGISTRY)
    assert names[: len(ops._ROUND6_FRONT)] == ops._ROUND6_FRONT


def test_driver_verified_queries_are_deferred_to_the_back():
    names = list(REGISTRY)
    front = set(ops._ROUND6_FRONT)
    deferred = list(
        dict.fromkeys(
            n for n in ops._DRIVER_VERIFIED_R3_R5 if n not in front
        )
    )
    assert names[-len(deferred) :] == deferred


def test_priority_names_all_exist():
    # reorder() raises on unknown FRONT names but silently skips unknown
    # defer names — a typo there would quietly weaken the ordering
    for n in [*ops._ROUND6_FRONT, *ops._DRIVER_VERIFIED_R3_R5]:
        assert n in REGISTRY, n


def test_every_query_is_either_prioritized_or_known_verified():
    """No stragglers in the middle: every registered query must appear
    in the round-6 front (changed-code + stalest regression slots) or
    in the r3–r5 driver-green defer list.  A query in neither would sit
    just past the window and earn no evidence this round without
    anyone deciding that."""
    covered = set(ops._ROUND6_FRONT) | set(ops._DRIVER_VERIFIED_R3_R5)
    stragglers = [n for n in REGISTRY if n not in covered]
    assert not stragglers, stragglers


def test_changed_code_queries_lead_the_window():
    """The six NEW round-6 operators (first-possible-green) and the
    six queries whose round-6 diff changes their output or plan — the
    Bloom-prefilter and shard/bucket hash fixes (advisor-proved
    degeneracies) plus l8's count()-fold — must occupy the very front,
    followed by the seven whose driver evidence is round-1 stale."""
    names = list(REGISTRY)
    assert names[:13] == [
        "u14_retention_delete",
        "s11_dpp_join",
        "st13_stream_outer_join",
        "a14_kmv_sketch",
        "mm_resize_downsample",
        "ts_twap",
        "j12_bloom_prefilter",
        "tr_shuffle_shard",
        "tr_hash_split",
        "tr_decontamination",
        "tr_stratified_sample",
        "l8_tfidf_top_terms",
        "t_unigram_logprob",
    ]
    assert set(names[13:20]) == {
        "ts_rsi",
        "ts_sessionize_batch",
        "ts_vwap",
        "ud1_scalar_python_udf",
        "ud5_udtf_bigrams",
        "w7_percent_rank_cume_dist",
        "w8_value_window_family",
    }
