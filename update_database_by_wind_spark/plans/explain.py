"""Physical-plan inspection (SURVEY.md §5.5 plan-shape assertions).

We write no Catalyst rules (§4.2 — every gap closes at the DataFrame
layer), so the optimizer contract is enforced observationally: tests
assert the *shape* of the physical plan — broadcasts where dimensions
are small, pushed filters, pruned scan schemas, no accidental
cartesian products — so a regression that silently de-optimizes a
query (e.g. a lost broadcast after a refactor) fails CI rather than
surfacing as a 100× slowdown at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The 'formatted' explain output as a string."""
    return df._jdf.queryExecution().explainString(  # noqa: SLF001
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(  # noqa: SLF001
            "formatted"
        )
    )


def optimized_plan(df: DataFrame) -> str:
    """The optimized LOGICAL plan as a string — used where a test needs
    window partition specs (``windowspecdefinition(partCols...,
    ordCols..., frame)``), which the formatted physical output does not
    spell out."""
    return df._jdf.queryExecution().optimizedPlan().toString()  # noqa: SLF001


def plan_contains(df: DataFrame, *needles: str) -> dict[str, bool]:
    plan = formatted_plan(df)
    return {n: (n in plan) for n in needles}
