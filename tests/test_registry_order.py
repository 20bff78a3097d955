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
    assert names[: len(ops._ROUND7_FRONT)] == ops._ROUND7_FRONT


def test_driver_verified_queries_are_deferred_to_the_back():
    names = list(REGISTRY)
    front = set(ops._ROUND7_FRONT)
    deferred = list(
        dict.fromkeys(
            n for n in ops._DRIVER_VERIFIED_R4_R6 if n not in front
        )
    )
    assert names[-len(deferred) :] == deferred


def test_priority_names_all_exist():
    # reorder() raises on unknown FRONT names but silently skips unknown
    # defer names — a typo there would quietly weaken the ordering
    for n in [*ops._ROUND7_FRONT, *ops._DRIVER_VERIFIED_R4_R6]:
        assert n in REGISTRY, n


def test_front_and_defer_do_not_overlap():
    """The round-6 advisor found a query listed in both the front and
    the defer list — harmless to reorder() (front wins) but it breaks
    the 'complement is listed explicitly' framing.  Keep the two lists
    disjoint by construction."""
    dup = set(ops._ROUND7_FRONT) & set(ops._DRIVER_VERIFIED_R4_R6)
    assert not dup, dup


def test_every_query_is_either_prioritized_or_known_verified():
    """No stragglers in the middle: every registered query must appear
    in the round-7 front (new + changed-code + stalest regression
    slots) or in the r4–r6 driver-green defer list.  A query in
    neither would sit just past the window and earn no evidence this
    round without anyone deciding that."""
    covered = set(ops._ROUND7_FRONT) | set(ops._DRIVER_VERIFIED_R4_R6)
    stragglers = [n for n in REGISTRY if n not in covered]
    assert not stragglers, stragglers


def test_changed_code_queries_lead_the_window():
    """The nine NEW round-7 operators (first-possible-green), then the
    two queries whose round-7 diff changes their code (cow_delete's
    VOID-partition + NULL-predicate fixes behind u14; ts_ewma's
    vectorized kernel), then the 13 round-2-stale queries the r6
    verdict named as the rotation backlog."""
    names = list(REGISTRY)
    assert names[:11] == [
        "a15_heavy_hitters",
        "e2_interval_concurrency",
        "st14_dedup_within_watermark",
        "tr_weighted_sample",
        "u15_time_travel",
        "u16_join_view_maintenance",
        "s12_incremental_ingest",
        "w9_gaps_islands",
        "u17_write_expectations",
        "u14_retention_delete",
        "ts_ewma",
    ]
    assert set(names[11:24]) == {
        "q10_returned_item_revenue",
        "q12_late_shipment_priority",
        "q13_customer_distribution",
        "q14_promo_revenue",
        "q15_top_supplier",
        "q17_small_quantity_revenue",
        "q18_large_volume_orders",
        "q21_suppliers_kept_waiting",
        "q22_dormant_high_balance",
        "q2_min_cost_supplier",
        "q4_order_priority_check",
        "q5_local_supplier_volume",
        "w6_ntile_acctbal_quartiles",
    }
