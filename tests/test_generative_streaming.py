"""Generative differential testing for the streaming family (round-3
verdict ask #5): hypothesis builds events corpora — out-of-order
timestamps, session-gap boundary hits, both parquet timestamp
encodings — writes them fixture-shaped, and drives the REAL registry
streaming queries (availableNow replay through run_stream_pinned) against
their REAL DuckDB oracles on that input.

Two deliberate axes the driver fixtures never cover:

* **Encoding**: events.ts is written as TIMESTAMP(MICROS) in one
  parametrization and TIMESTAMP(NANOS) in the other — the fixture
  generations have flip-flopped between the two across rounds, and the
  nanosAsLong loader path would otherwise be tested only when the
  current fixture happens to use nanos.
* **Order**: rows are written in generation order, NOT time order.  A
  single-file availableNow replay is one batch, so complete-mode
  results must be identical to the batch oracle regardless of
  intra-batch disorder — that equivalence is exactly what these tests
  pin.  (Cross-batch disorder — real lateness — is the separate
  watermark-drop test at the bottom.)
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oracle_harness import compare, run_oracle

import update_database_by_wind_spark.operators  # noqa: F401 — registers queries
from update_database_by_wind_spark.registry import REGISTRY

_SETTINGS = dict(
    max_examples=3,  # each example replays a stream: seconds, not ms
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
# exact binary fractions: double→decimal casts agree bit-for-bit on
# both engines without depending on rounding of repeating fractions
_VALUES = [0.0, 0.25, 1.5, -2.75, 10.0, 99.5]

_BASE_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC in µs

# minute offsets quantized to 10 so exact 30-minute session gaps (the
# st4 merge-vs-split boundary) and exact window boundaries are common
_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=288),  # ×10 minutes ≈ 2 days
        st.integers(min_value=0, max_value=13),  # user_id (incl. %7==0)
        st.sampled_from(_EVENT_TYPES),
        st.sampled_from(_VALUES),
    ),
    min_size=1,
    max_size=40,
)


def _write_events(events, unit: str) -> str:
    """Write a fixture-shaped events.parquet (rows in generation order,
    i.e. NOT time-sorted) with ts encoded at the requested unit."""
    sf_dir = tempfile.mkdtemp(prefix="wind_spark_genstream_")
    ts_us = [_BASE_US + m * 10 * 60 * 1_000_000 for m, _, _, _ in events]
    table = pa.table(
        {
            "event_id": pa.array(range(len(events)), pa.int64()),
            "ts": pa.array(ts_us, pa.timestamp("us")).cast(
                pa.timestamp(unit)
            ),
            "user_id": pa.array([u for _, u, _, _ in events], pa.int64()),
            "event_type": pa.array(
                [t for _, _, t, _ in events], pa.string()
            ),
            "value": pa.array([v for _, _, _, v in events], pa.float64()),
            "props": pa.array(["{}"] * len(events), pa.string()),
        }
    )
    pq.write_table(table, os.path.join(sf_dir, "events.parquet"))
    return sf_dir


@pytest.mark.parametrize("unit", ["us", "ns"])
@pytest.mark.parametrize(
    "name",
    [
        "st2_tumbling_window",
        "st3_sliding_window",
        "st4_session_window",
        "st5_streaming_dedup",
        "st11_streaming_ohlc",
        "st8_stream_static_join",
        "st10_stream_stream_join",
        # stateful + sink paths: st6's integer-cents fold is exact on
        # the generated value set (every value×100 is an integer, so
        # numpy's half-even vs DuckDB's half-away rounding never
        # diverges), st9's last-per-key MERGE needs only unique
        # event_ids, which the generator guarantees
        "st6_stateful_running_totals",
        "st9_foreach_batch_sink",
        # st12's tombstone CDC: generated corpora where a user's latest
        # event is an 'error' must leave the user absent from the
        # read-back whatever the batch split; duplicate values and
        # unordered rows exercise the monotone event_id guard
        "st12_stream_cdc_apply",
        # e1 is batch, but it consumes the same events table: sparse
        # generated users exercise partial funnels (signup w/o click,
        # click before signup must NOT count) and the n1=0 NULLIF leg
        "e1_event_funnel",
        # st13's LEFT OUTER join: sparse corpora hit every regime —
        # zero clicks (empty result), clicks with no purchases (all
        # null-padded rows via the watermark heartbeat), purchases
        # exactly at the 30-minute bound (10-minute quantization makes
        # boundary hits common), and empty %7 cohorts
        "st13_stream_outer_join",
        # ts_twap is batch over the same events: duplicate timestamps
        # exercise the zero-duration tiebreak, single-event users the
        # NULL-TWAP leg, and the quantized offsets make exact-tie
        # orderings common
        "ts_twap",
    ],
)
@given(events=_EVENTS)
@settings(**_SETTINGS)
def test_streaming_query_matches_oracle_on_generated_events(
    spark, name, unit, events
):
    sf_dir = _write_events(events, unit)
    try:
        spec = REGISTRY[name]
        problems = compare(
            spec.fn(spark, sf_dir), run_oracle(spec.oracle, sf_dir)
        )
        assert not problems, (name, unit, problems)
    finally:
        shutil.rmtree(sf_dir, ignore_errors=True)


# --- watermark drop: generative lateness injection ---------------------------

_ON_TIME = st.lists(
    st.integers(min_value=0, max_value=59), min_size=1, max_size=8
)
_STRAGGLERS = st.lists(
    st.integers(min_value=0, max_value=59), min_size=1, max_size=4
)


@given(on_time=_ON_TIME, stragglers=_STRAGGLERS)
@settings(**_SETTINGS)
def test_watermark_drops_generated_stragglers(spark, on_time, stragglers):
    """Generalizes st7's fixed replay: hypothesis picks the on-time
    rows for window A [00:00, 01:00) and the straggler rows that
    arrive after the watermark has passed 01:00.  Whatever their
    minute offsets and counts, the contract is invariant — window A
    emits exactly len(on_time) rows, every straggler is dropped, and
    the still-open 02:00 window never appears.  The four-trigger
    replay is pinned by file mtime + maxFilesPerTrigger=1, exactly the
    mechanics of st7_late_data_watermark."""
    from pyspark.sql import functions as F

    from update_database_by_wind_spark.session import prepare
    from update_database_by_wind_spark.streaming.pipelines import (
        run_stream_pinned,
        scratch_dir,
    )

    prepare(spark)
    d = scratch_dir("wind_spark_genlate_")
    try:
        batches = [
            [
                (i + 1, f"2024-01-01 00:{m:02d}:00", 1.0)
                for i, m in enumerate(on_time)
            ],
            [(100, "2024-01-01 02:00:00", 3.0)],  # advance the watermark
            [(101, "2024-01-01 02:10:00", 5.0)],  # watermark takes effect
            [
                (200 + i, f"2024-01-01 00:{m:02d}:00", 4.0)
                for i, m in enumerate(stragglers)
            ],
        ]
        for i, rows in enumerate(batches):
            (
                spark.createDataFrame(
                    rows, "event_id long, ts_s string, value double"
                )
                .select(
                    "event_id",
                    F.col("ts_s").cast("timestamp").alias("ts"),
                    "value",
                )
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(f"{d}/batch{i}")
            )
            for root, _, files in os.walk(f"{d}/batch{i}"):
                for fn in files:
                    os.utime(
                        os.path.join(root, fn),
                        (1_700_000_000 + i * 100, 1_700_000_000 + i * 100),
                    )
        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/batch*")
        )
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour"))
            .agg(F.count("*").alias("n_on_time"))
            .select(F.col("window.start").alias("window_start"), "n_on_time")
        )
        rows = run_stream_pinned(agg, "test_gen_late", "append").collect()
        assert len(rows) == 1, rows
        assert str(rows[0].window_start) == "2024-01-01 00:00:00", rows
        assert rows[0].n_on_time == len(on_time), rows
    finally:
        shutil.rmtree(d, ignore_errors=True)
