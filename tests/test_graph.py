"""connected_components unit tests — shapes the documents fixture
can't produce: a long chain (pointer-jumping's worst case), multiple
disjoint components, and label determinism under repartitioning."""

import pytest
from pyspark.sql import functions as F


def _cc(spark, edge_tuples, **kw):
    from update_database_by_wind_spark.operators.graph import (
        connected_components,
    )

    edges = spark.createDataFrame(edge_tuples, "u long, v long")
    got = connected_components(edges, **kw)
    return {r["id"]: r["cluster_id"] for r in got.collect()}


def test_chain_converges_logarithmically(spark):
    # 0-1-2-...-40: diameter 40, naive min-propagation needs 40 rounds;
    # pointer jumping must close it well inside max_iter=10.
    n = 40
    labels = _cc(spark, [(i, i + 1) for i in range(n)], max_iter=10)
    assert labels == {i: 0 for i in range(n + 1)}


def test_disjoint_components_and_min_label(spark):
    edges = [
        (5, 3),  # component {3, 5}
        (10, 11), (11, 12), (10, 12),  # triangle {10, 11, 12}
        (100, 7), (7, 8),  # chain {7, 8, 100}
    ]
    labels = _cc(spark, edges)
    assert labels == {
        3: 3, 5: 3,
        10: 10, 11: 10, 12: 10,
        7: 7, 8: 7, 100: 7,
    }


def test_deterministic_under_partitioning(spark):
    from update_database_by_wind_spark.operators.graph import (
        connected_components,
    )

    edges = [(i, i + 1) for i in range(0, 30, 2)] + [(0, 29)]
    df1 = spark.createDataFrame(edges, "u long, v long").repartition(1)
    df17 = spark.createDataFrame(edges, "u long, v long").repartition(17)
    a = sorted(map(tuple, connected_components(df1).collect()))
    b = sorted(map(tuple, connected_components(df17).collect()))
    assert a == b


def test_nonconvergence_raises(spark):
    from update_database_by_wind_spark.operators.graph import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "u long, v long"
    )
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(edges, max_iter=1)


def test_cluster_sizes_consistent(spark, sf_oracle):
    from update_database_by_wind_spark.registry import REGISTRY
    import update_database_by_wind_spark.operators  # noqa: F401

    df = REGISTRY["l3f_dup_clusters"].fn(spark, sf_oracle)
    by_cluster = (
        df.groupBy("cluster_id")
        .agg(
            F.count("*").alias("n"),
            F.first("cluster_size").alias("sz"),
            F.min("doc_id").alias("min_doc"),
        )
        .collect()
    )
    assert by_cluster, "fixture must contain at least one near-dup cluster"
    for r in by_cluster:
        assert r["n"] == r["sz"] >= 2
        assert r["min_doc"] == r["cluster_id"]


def _pagerank_model(edge_tuples, iterations=5, scale=1_000_000, damp=85):
    """Driver-side mirror of pagerank_integer's exact recurrence."""
    verts = sorted({u for u, _ in edge_tuples} | {v for _, v in edge_tuples})
    deg = {}
    for u, _ in edge_tuples:
        deg[u] = deg.get(u, 0) + 1
    base = scale * (100 - damp) // 100
    pr = {v: scale for v in verts}
    for _ in range(iterations):
        nxt = {v: base for v in verts}
        for u, v in edge_tuples:
            nxt[v] += (pr[u] * damp) // (100 * deg[u])
        pr = nxt
    return pr


def _pagerank_spark(spark, edge_tuples, **kw):
    from update_database_by_wind_spark.operators.graph import (
        pagerank_integer,
    )

    edges = spark.createDataFrame(edge_tuples, "src long, dst long")
    got = pagerank_integer(edges, **kw)
    return {r["node"]: r["pr"] for r in got.collect()}


def test_pagerank_directed_source_mass_survives(spark):
    # 0 has zero in-degree; its outbound mass must keep flowing to 1
    # every round (the round-9 advisor's finding: dropping 0 from the
    # rank table after round 1 starves the whole chain).
    edges = [(0, 1), (1, 2), (2, 1)]
    got = _pagerank_spark(spark, edges, iterations=5)
    want = _pagerank_model(edges, iterations=5)
    assert got == want
    # 0 itself stays at BASE every round.
    assert got[0] == 150_000


def test_pagerank_sink_vertex_retained(spark):
    # 3 is a pure sink (no out-edges): it must appear in the result
    # with its received rank, not vanish from the vertex set.
    edges = [(0, 3), (1, 3), (0, 1)]
    got = _pagerank_spark(spark, edges, iterations=3)
    want = _pagerank_model(edges, iterations=3)
    assert got == want


def test_pagerank_symmetrized_matches_model_and_partitioning(spark):
    base_edges = [(1, 2), (2, 3), (3, 4), (4, 1), (2, 4)]
    sym = base_edges + [(v, u) for u, v in base_edges]
    want = _pagerank_model(sym, iterations=4)
    from update_database_by_wind_spark.operators.graph import (
        pagerank_integer,
    )

    for parts in (1, 13):
        edges = spark.createDataFrame(sym, "src long, dst long").repartition(
            parts
        )
        got = {
            r["node"]: r["pr"]
            for r in pagerank_integer(edges, iterations=4).collect()
        }
        assert got == want


# --- triangle_count ------------------------------------------------------------


def _tri(spark, edge_tuples):
    from update_database_by_wind_spark.operators.graph import triangle_count

    edges = spark.createDataFrame(edge_tuples, "a long, b long")
    return {r["vtx"]: r["n_tri"] for r in triangle_count(edges).collect()}


def _tri_brute(edge_tuples):
    """Reference: enumerate all canonical x<y<z vertex triples over the
    adjacency set."""
    import itertools

    adj = set()
    verts = set()
    for a, b in edge_tuples:
        adj.add((min(a, b), max(a, b)))
        verts.update((a, b))
    counts = {}
    for x, y, z in itertools.combinations(sorted(verts), 3):
        if (x, y) in adj and (x, z) in adj and (y, z) in adj:
            for v in (x, y, z):
                counts[v] = counts.get(v, 0) + 1
    return counts


def test_triangle_shapes(spark):
    # one triangle + a pendant edge + a square (no triangle)
    edges = [
        (1, 2), (2, 3), (1, 3),  # triangle
        (3, 4),  # pendant
        (10, 11), (11, 12), (12, 13), (10, 13),  # 4-cycle, 0 triangles
    ]
    assert _tri(spark, edges) == {1: 1, 2: 1, 3: 1}


def test_k4_every_vertex_in_three(spark):
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert _tri(spark, edges) == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_random_graphs_match_brute_force(spark):
    """Seeded pseudo-random graphs (including degree ties, hubs, and
    disconnected pieces) against the canonical-triple reference — the
    degree-orientation single-count claim, fuzzed."""
    for seed in range(6):
        edges = sorted(
            {
                (min(a, b), max(a, b))
                for k in range(60)
                for a in [(seed * 7919 + k * 104729) % 23]
                for b in [(seed * 31 + k * 130363) % 23]
                if a != b
            }
        )
        assert _tri(spark, edges) == _tri_brute(edges), seed


def test_triangle_deterministic_under_partitioning(spark):
    from update_database_by_wind_spark.operators.graph import triangle_count

    edges = [(a, b) for a in range(8) for b in range(a + 1, 8) if (a + b) % 3]
    df1 = spark.createDataFrame(edges, "a long, b long").repartition(1)
    df13 = spark.createDataFrame(edges, "a long, b long").repartition(13)
    one = sorted(map(tuple, triangle_count(df1).collect()))
    many = sorted(map(tuple, triangle_count(df13).collect()))
    assert one == many
