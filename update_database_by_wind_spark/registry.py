"""Query registry — the single source of truth for the driver contract.

Every operator from SURVEY.md §2 registers here as a ``QuerySpec``:
a named callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are ANSI-SQL expressible) the equivalent DuckDB oracle SQL.
``__spark_entry__`` re-exports the registry as ``queries()`` /
``oracle_sql()``; the local pytest mirror (tests/test_oracle.py) runs
the same comparison the driver does, so a spec that passes locally
passes the round gate.

Column-name discipline: the oracle comparator sorts columns by name
and hash-compares values, so every computed column is aliased
identically in the DataFrame code and the SQL (SURVEY.md §2 P4).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register ``fn`` as a driver-visible query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=(fn.__doc__ or "")
        )
        return fn

    return deco
