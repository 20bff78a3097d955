"""Operator inventory (SURVEY.md §2).

Importing this package registers every query in
``update_database_by_wind_spark.registry.REGISTRY``.
"""

from update_database_by_wind_spark.operators import (  # noqa: F401
    aggregates,
    analytics_extra,
    dedup,
    extended,
    extended2,
    joins,
    multimodal,
    quality,
    scalars,
    setops,
    sources_ops,
    similarity,
    storage,
    text,
    tpch_extra,
    training,
    udfs,
    update_pipeline,
    windows,
)
from update_database_by_wind_spark.streaming import (  # noqa: F401, E402
    pipelines,
    stateful,
)
