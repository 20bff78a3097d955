"""Plan-inspection helpers (SURVEY.md §3.2, §5.5)."""

from update_database_by_wind_spark.plans.explain import (
    formatted_plan,
    plan_contains,
)

__all__ = ["formatted_plan", "plan_contains"]
