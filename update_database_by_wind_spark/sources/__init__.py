"""Sources & sinks (SURVEY.md §2.1)."""

from update_database_by_wind_spark.sources.tables import (
    TABLES,
    fan_out,
    load,
    load_all,
    register_views,
)

__all__ = ["TABLES", "fan_out", "load", "load_all", "register_views"]
