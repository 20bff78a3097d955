"""Custom stateful streaming (SURVEY.md §2.10 ST6, ST9).

ST6: per-key arbitrary state via ``applyInPandasWithState`` — a
running (count, total) per user that survives across micro-batches in
the state store.  This is the shape for custom stateful operators the
built-in windows can't express (counters, rate limiters, model state).

ST9: ``foreachBatch`` sink — each micro-batch is a *batch* DataFrame,
so the full batch engine (including the U2 upsert merge and the JDBC
sink in sources/jdbc.py) applies per batch; the canonical OSS-Spark
way to stream into a store with upsert semantics.

Note on Spark 4's ``transformWithStateInPandas``: the successor API
imports cleanly here but its driver worker requires a working
``google.protobuf`` install, which this environment lacks (verified:
state-schema pre-init crashes with ``ImportError: cannot import name
'descriptor' from 'google.protobuf'``; installs are not permitted).
``applyInPandasWithState`` is therefore the supported arbitrary-state
path in this repo; the TWS port is a mechanical swap
(StatefulProcessor.init/handleInputRows over the same state tuple)
once the dependency exists.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from update_database_by_wind_spark.registry import query
from update_database_by_wind_spark.streaming.pipelines import (
    events_stream,
    run_to_memory,
)

_STATE_SCHEMA = "count LONG, total DOUBLE"
_OUTPUT_SCHEMA = "user_id LONG, n_events LONG, total_value DOUBLE"


def _running_totals(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold each micro-batch's rows for this user into persistent
    (count, total) state; emit the running values once per batch."""
    count, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        count += len(pdf)
        # binary-safe accumulation: values are 2-decimal fixture doubles;
        # state equality across batch splits is asserted in tests
        total += float(pdf["value"].sum())
    state.update((count, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [count], "total_value": [total]}
    )


def st6_stateful_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST6: per-user running counters with explicit state."""
    ev = events_stream(spark, sf_dir)
    return (
        ev.groupBy("user_id")
        .applyInPandasWithState(
            _running_totals,
            outputStructType=_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


@query("st6_stateful_running_totals", oracle=None, tags=("streaming", "stateful"))
def st6_stateful_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST6 driver entry: availableNow replay of the stateful per-user
    counters; update-mode memory sink captures the per-batch emissions
    (single-batch replay → one final row per user).  Arbitrary-state
    output is engine-specific (emission cadence, float fold order), so
    this is a rows-only check; exact batch-equivalence of the final
    counts is asserted in tests/test_streaming.py."""
    return run_to_memory(st6_stateful_counters(spark, sf_dir), "update")


def st9_foreach_batch_upsert(
    spark: SparkSession, sf_dir: str, target: dict[int, tuple[int, float]]
) -> None:
    """ST9: stream → foreachBatch upsert into ``target`` (stand-in for
    an RDBMS; the JDBC variant plugs sources/jdbc.py:upsert in here).
    Each batch is aggregated batch-side first so the sink receives one
    row per key per batch — the at-scale shape (pre-aggregated
    micro-batch, idempotent key-wise merge)."""
    import tempfile

    ev = events_stream(spark, sf_dir)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        rows = (
            batch_df.groupBy("user_id")
            .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
            .collect()
        )
        for r in rows:
            n0, v0 = target.get(r["user_id"], (0, 0.0))
            target[r["user_id"]] = (n0 + r["n"], v0 + r["v"])

    q = (
        ev.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="wind_spark_fb_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


@query("st9_foreach_batch_sink", oracle=None, tags=("streaming", "sink"))
def st9_foreach_batch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST9 driver entry: run the foreachBatch upsert sink to completion
    and surface the merged target as a DataFrame.  The sink itself is
    side-effecting (the point of foreachBatch), so the check is
    rows-only; exact batch-equivalence of the merged counts is
    asserted in tests/test_streaming.py."""
    target: dict[int, tuple[int, float]] = {}
    st9_foreach_batch_upsert(spark, sf_dir, target)
    return spark.createDataFrame(
        [(k, n, round(v, 2)) for k, (n, v) in sorted(target.items())],
        "user_id long, n_events long, total_value double",
    )
