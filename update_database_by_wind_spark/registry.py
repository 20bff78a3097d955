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


def reorder(front: list[str], defer: list[str] = ()) -> None:
    """Rebuild REGISTRY iteration order (it is an insertion-ordered dict).

    The round driver's external correctness check covers a prefix window
    of the registry in iteration order, so ordering is evidence policy:
    ``front`` lists the queries that most need a fresh driver-verified
    row this round (never-yet-verified operators + anything whose
    semantics changed), ``defer`` lists queries already green in a
    previous round's CORRECTNESS file — they go last, unlisted entries
    keep registration order in between.  Unknown ``front`` names raise
    (a typo here would silently waste the round's verification window).
    """
    missing = [n for n in front if n not in REGISTRY]
    if missing:
        raise KeyError(f"reorder: unknown queries {missing}")
    front_set = set(front)
    defer_list = [n for n in defer if n in REGISTRY and n not in front_set]
    defer_set = set(defer_list)
    middle = [n for n in REGISTRY if n not in front_set and n not in defer_set]
    ordered = {n: REGISTRY[n] for n in [*front, *middle, *defer_list]}
    REGISTRY.clear()
    REGISTRY.update(ordered)


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
