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
