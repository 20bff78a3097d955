"""update_database_by_wind_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the capabilities of the
reference repo ``Jaylee615/Update-database-by-wind`` (incremental
"fetch → reshape → upsert" ETL over (security_code, trade_date)-keyed
time-series; see SURVEY.md §0.1 for the evidence basis — the reference
snapshot at /root/reference is empty, so the build targets the driver
contract plus the category profile documented in SURVEY.md).

Everything is declared through the DataFrame API so Catalyst/Tungsten
(whole-stage codegen, AQE, predicate pushdown, broadcast selection)
do the physical planning; no RDDs, and Python UDFs only where Spark
genuinely lacks the primitive (see operators/ docstrings).
"""

from update_database_by_wind_spark.session import get_session, prepare
from update_database_by_wind_spark.registry import REGISTRY, query

__all__ = ["get_session", "prepare", "REGISTRY", "query"]
