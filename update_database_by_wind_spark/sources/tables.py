"""Parquet table loaders for the driver corpus (SURVEY.md §2.1 S1).

The corpus (TESTDATA.md) is one parquet file per table under an
sf-dir.  Parquet carries its own schema; the declared StructTypes in
``schemas.py`` act as assertions, not casts.

Scale note: ``spark.read.parquet`` is the vectorized columnar reader —
predicate pushdown and column pruning happen automatically when the
downstream plan is declarative (verified in tests/test_plans.py).  At
100 TB each "table" is a directory of many files, which this loader
handles unchanged (the path just globs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from update_database_by_wind_spark.session import prepare

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    prepare(spark)
    if name == "events":
        # events.parquet stores ts as parquet TIMESTAMP(NANOS), which
        # Spark's reader rejects outright.  Read the raw INT64 nanos via
        # the legacy conf and truncate to microseconds with *integer*
        # division (double division rounds and lands 1µs off DuckDB,
        # which also truncates ns→µs).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
