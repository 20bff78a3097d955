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
    """Resolved-plan memo (round-18 optimization): ``spark.read.parquet``
    costs ~130-220 ms per call even fully warm (py4j round trips +
    InMemoryFileIndex + footer schema inference), and a query path calls
    ``load`` one-to-five times per build — measured 40-60% of every
    headline bench pass at sf0.1 (plans/r18/decomp.py).  The corpus
    tables are immutable fixture files, so the *unresolved relation* is
    memoized per (session, sf_dir, table) on the session object itself
    (dies with the session; a foreign session gets its own dict).  This
    caches only the analyzed read plan — every action still scans
    parquet; results are never cached.  ``prepare`` still runs on every
    call so a conf-drifted foreign session is always re-pinned.  At
    100 TB the same reuse matters more, not less: repeated resolution
    of a large table re-lists files and re-reads footers; production
    code holds the DataFrame (or a catalog temp view) exactly like
    this."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    prepare(spark)
    try:
        cache = spark._wind_load_cache  # noqa: SLF001
    except AttributeError:
        cache = {}
        spark._wind_load_cache = cache  # noqa: SLF001
    key = (sf_dir, name)
    df = cache.get(key)
    if df is None:
        df = _read_table(spark, sf_dir, name)
        cache[key] = df
    return df


def _read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # fixture generations store ts as parquet TIMESTAMP(NANOS) or
        # TIMESTAMP(MICROS).  NANOS is rejected by Spark's reader, so
        # read the raw INT64 nanos via the legacy conf and truncate to
        # microseconds with *integer* division (double division rounds
        # and lands 1µs off DuckDB, which also truncates ns→µs); the
        # dtype check leaves a natively-readable MICROS column alone
        # (streaming mirror: pipelines._events_raw_schema).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        dt = dict(df.dtypes).get("ts")
        if dt == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif dt == "timestamp_ntz":
            # normalize to TIMESTAMP (LTZ): the session is pinned to UTC
            # (session.prepare) so the instant is unchanged, and every
            # downstream consumer sees ONE type regardless of fixture
            # vintage — epoch casts like CAST(ts AS BIGINT) are legal on
            # LTZ but rejected on NTZ in Spark 4's ANSI analyzer
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition an under-partitioned input up to the
    session's core count — and a no-op otherwise.

    Single-file fixture tables are written as ONE parquet row group, so
    the scan cannot split below one task no matter how small
    ``spark.sql.files.maxPartitionBytes`` goes; a CPU-bound stage fed by
    such a scan (per-pair similarity folds, corpus-wide tokenization)
    would run single-threaded.  A production 100 TB corpus is thousands
    of files/row groups, where this helper does nothing — the guard
    makes the fan-out strictly a small-input correction, never an extra
    full-corpus shuffle at scale."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
