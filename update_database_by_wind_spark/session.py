"""SparkSession factory + runtime-conf preparation.

Two entry styles:

* ``get_session()`` — build our own tuned session (tests, bench.py).
* ``prepare(spark)`` — the driver hands us *its* session
  (``__spark_entry__.queries()`` callables receive it); we may only
  touch runtime-settable SQL confs.  Crucially we pin the session
  time zone to UTC so Spark timestamps hash-match the DuckDB oracle
  (DuckDB timestamps are UTC-naive), and we size
  ``spark.sql.shuffle.partitions`` for the local harness — the
  200-partition default is pathological at sf≤0.1.

Scale note (100 TB): shuffle partition count here is a *local-mode*
setting.  On a real cluster the same code runs with AQE coalescing
(`spark.sql.adaptive.enabled=true`) so the initial number only needs
to be an upper bound; every operator in this package is written so
that partitioning decisions stay inside Catalyst/AQE rather than
being hard-coded.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def _cpus() -> str:
    return os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_session(
    app_name: str = "update-database-by-wind-spark",
    master: str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
) -> SparkSession:
    # Broadcast-threshold sizing (round-18, guide §3.1): Spark's 10 MB
    # default badly under-uses modern memory — size *estimates* after
    # filters are conservative, and a build side in the tens of MB is
    # far cheaper to broadcast than to shuffle-sort the fact side
    # (measured: j1's lineitem⋈orders at the 20× replica flips from
    # SortMergeJoin back to the broadcast plan, 1.23 s → 0.88 s).
    # Parameterised via SPARK_GRAFT_BROADCAST_MB; 64 MB is a sane
    # production default for executors with multi-GB heaps (the guide's
    # "a few hundred MB is usually fine" with margin), not a local-mode
    # special.  Applied to both the static and the AQE runtime
    # threshold so re-planning uses the same bar.
    bcast = int(os.environ.get("SPARK_GRAFT_BROADCAST_MB", "64")) << 20
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{_cpus()}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.autoBroadcastJoinThreshold", str(bcast))
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", str(bcast))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    prepare(spark)
    return spark


def prepare(spark: SparkSession) -> SparkSession:
    """Set runtime-safe SQL confs on a (possibly foreign) session.

    Idempotent; called by every table loader so each ``queries()``
    callable is correct regardless of which session the driver built.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        # only rescue the pathological default (200 partitions over tiny
        # local data), and ONLY in local mode: on a real cluster >64
        # shuffle partitions is deliberate tuning we must not clobber
        master = spark.conf.get("spark.master", "")
        if master.startswith("local") and (
            int(spark.conf.get("spark.sql.shuffle.partitions")) > 64
        ):
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS)
            )
        # local-mode split sizing: the fixture tables are single files,
        # so the 128 MB default gives a ~600 MB lineitem scan only 5
        # splits on 32 cores.  8 MB makes the multi-row-group fact
        # files scan at core-count parallelism (measured −20% on the
        # sf1 headline total); single-row-group files are unaffected
        # (fan_out covers those).  Only the untouched DEFAULT is
        # lowered, never a deliberately tuned value, and never off
        # local mode — a production 128 MB-file layout wants 128 MB.
        if master.startswith("local") and (
            spark.conf.get("spark.sql.files.maxPartitionBytes")
            in ("134217728", "134217728b")
        ):
            spark.conf.set("spark.sql.files.maxPartitionBytes", str(8 << 20))
    except Exception:
        pass  # never fail a query over a tuning conf
    return spark
