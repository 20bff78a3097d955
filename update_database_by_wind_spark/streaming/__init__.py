"""Structured Streaming operators (SURVEY.md §2.10)."""

from update_database_by_wind_spark.streaming.pipelines import (
    events_stream,
    run_stream_pinned,
)

__all__ = ["events_stream", "run_stream_pinned"]
