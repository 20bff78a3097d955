"""Oracle-differential test over every registered query (SURVEY.md §5.1/§5.3).

Mirrors the driver's t2 gate at sf0.01: each QuerySpec with oracle SQL
must match DuckDB exactly; specs without an oracle get a rows-run
smoke check (the driver's weaker rows-only path).
"""

from __future__ import annotations

import pytest

import update_database_by_wind_spark.operators  # noqa: F401
from update_database_by_wind_spark.registry import REGISTRY

from tests.oracle_harness import compare, run_oracle

ORACLE_SPECS = sorted(n for n, s in REGISTRY.items() if s.oracle)
ROWS_ONLY_SPECS = sorted(n for n, s in REGISTRY.items() if not s.oracle)


@pytest.mark.parametrize("name", ORACLE_SPECS)
def test_oracle_match(spark, sf_oracle, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_oracle)
    oracle = run_oracle(spec.oracle, sf_oracle)
    problems = compare(df, oracle)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_SPECS)
def test_rows_only_runs(spark, sf_oracle, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_oracle)
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_oracle_keys_subset():
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) == len(REGISTRY)
