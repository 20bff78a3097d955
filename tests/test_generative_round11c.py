"""Generative differential testing for the round-11 third-session
library functions: hypothesis drives the REAL occ_commit / bfs_hops
machinery against pure-Python dict models under arbitrary schedules —
the MOR-family fuzz pattern (round 8) applied to the new surfaces.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
        HealthCheck.data_too_large,
    ],
)

_PARTS = ["p0", "p1", "p2"]

# a writer op: (base_choice, parts-mask) — base_choice indexes into the
# list of versions that existed when the op runs (0 = the initial v1,
# -1 = the current head), the mask picks a non-empty partition subset
_OPS = st.lists(
    st.tuples(st.integers(0, 5), st.integers(1, 7)),
    min_size=1,
    max_size=5,
)


@given(ops=_OPS)
@settings(**_SETTINGS)
def test_occ_commit_matches_conflict_model(spark, ops):
    """Arbitrary interleavings of writers with arbitrary (possibly
    stale) base snapshots: the real occ_commit must refuse exactly
    when the dict model says a wanted partition was rewritten past the
    writer's base, rebase exactly otherwise, and the final head read
    must equal the model's table."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        occ_commit,
        snapshot_commit,
        snapshot_read,
    )

    root = tempfile.mkdtemp(prefix="occ_fuzz_")
    base = f"{root}/ledger"
    try:
        init = spark.createDataFrame(
            [(p, 0, 0) for p in _PARTS], "p string, k long, c long"
        )
        snapshot_commit(init, base, 1, "p")
        owner = {p: 1 for p in _PARTS}  # partition -> owning version
        content = {p: (0, 0) for p in _PARTS}  # partition -> (k, c)
        head = 1
        versions = [1]
        for i, (base_choice, mask) in enumerate(ops, start=1):
            expected_base = versions[min(base_choice, len(versions) - 1)]
            parts = [p for b, p in enumerate(_PARTS) if mask & (1 << b)]
            df = spark.createDataFrame(
                [(p, i, i * 10) for p in parts], "p string, k long, c long"
            )
            model_conflict = any(owner[p] > expected_base for p in parts)
            if model_conflict:
                with pytest.raises(ValueError, match="conflict on partitions"):
                    occ_commit(df, base, expected_base, "p", parts=parts)
                continue  # refused writers leave no trace
            r = occ_commit(df, base, expected_base, "p", parts=parts)
            head += 1
            versions.append(head)
            assert r == {"version": head, "rebased": expected_base < head - 1}
            for p in parts:
                owner[p] = head
                content[p] = (i, i * 10)
        got = {
            r.p: (r.k, r.c)
            for r in snapshot_read(spark, base, head, "p").collect()
        }
        assert got == content
    finally:
        shutil.rmtree(root, ignore_errors=True)


_EDGES = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)),
    min_size=1,
    max_size=18,
)


@given(edges=_EDGES)
@settings(max_examples=5, deadline=None, suppress_health_check=[
    HealthCheck.too_slow,
    HealthCheck.function_scoped_fixture,
])
def test_bfs_hops_matches_model_on_random_graphs(spark, edges):
    """Random graphs incl. self-loops, parallel edges, and isolated
    tangles: frontier BFS from the minimum vertex must reproduce the
    dict-model distances exactly and omit unreachable vertices."""
    from update_database_by_wind_spark.operators.graph import bfs_hops

    source = min(min(u, v) for u, v in edges)
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    want = {source: 0}
    frontier, d = [source], 0
    while frontier:
        d += 1
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in want:
                    want[v] = d
                    nxt.append(v)
        frontier = nxt
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r.id: r.dist for r in bfs_hops(df, source).collect()}
    assert got == want
