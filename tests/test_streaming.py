"""Streaming semantics tests (SURVEY.md §5.6, §2.10).

Batch-equivalence: the same windowed aggregation run as a stream
(availableNow replay) and as a plain batch query must agree exactly.
Late data: a hand-built out-of-order replay must show watermark drops.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from update_database_by_wind_spark.sources import load
from update_database_by_wind_spark.streaming.pipelines import (
    events_stream,
    run_stream_pinned,
    st3_sliding_stream,
    st4_session_stream,
)
from update_database_by_wind_spark.streaming.stateful import (
    st6_stateful_counters,
    st9_foreach_batch_upsert,
)


def _as_sorted_rows(df, cols):
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


def test_st3_sliding_batch_equivalence(spark, sf_oracle):
    stream_out = run_stream_pinned(
        st3_sliding_stream(spark, sf_oracle), "test_st3"
    )
    batch = (
        load(spark, sf_oracle, "events")
        .groupBy(F.window("ts", "1 hour", "15 minutes"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("window.start").alias("window_start"), "n_events")
    )
    cols = ["window_start", "n_events"]
    assert _as_sorted_rows(stream_out, cols) == _as_sorted_rows(batch, cols)


def test_st4_session_batch_equivalence(spark, sf_oracle):
    stream_out = run_stream_pinned(
        st4_session_stream(spark, sf_oracle), "test_st4"
    )
    batch = (
        load(spark, sf_oracle, "events")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            "user_id",
            "n_events",
        )
    )
    cols = ["session_start", "user_id", "n_events"]
    assert _as_sorted_rows(stream_out, cols) == _as_sorted_rows(batch, cols)


def test_st6_stateful_final_counts_match_batch(spark, sf_oracle):
    out = run_stream_pinned(
        st6_stateful_counters(spark, sf_oracle), "test_st6", "update"
    )
    # single-batch availableNow replay → one emission per user = final
    batch = (
        load(spark, sf_oracle, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )
    got = {r["user_id"]: r["n_events"] for r in out.collect()}
    want = {r["user_id"]: r["n_events"] for r in batch.collect()}
    assert got == want


def test_st9_foreach_batch_upsert_matches_batch(spark, sf_oracle):
    merged = st9_foreach_batch_upsert(spark, sf_oracle)
    batch = (
        load(spark, sf_oracle, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
    )
    want = {r["user_id"]: r["n"] for r in batch.collect()}
    assert {r["user_id"]: r["n"] for r in merged.collect()} == want


def test_st7_late_data_dropped_by_watermark(spark):
    """ST7: a row older than (max ts seen − watermark) arriving in a
    later batch must be excluded from its (already finalized) window.

    Build a 4-file replay: file0 = window A rows, file1 = rows two
    hours later (advances the watermark past A), file2 = a filler
    batch (the new watermark takes effect one trigger after the max
    is *seen* — measured on this Spark build), file3 = a straggler
    for window A.  With a 10-minute watermark and append mode, the
    straggler is dropped, so window A counts only file0's rows.
    """
    d = tempfile.mkdtemp(prefix="wind_spark_late_")
    rows0 = [(1, "2024-01-01 00:05:00", 1.0), (2, "2024-01-01 00:20:00", 2.0)]
    rows1 = [(3, "2024-01-01 02:00:00", 3.0)]
    rows2 = [(5, "2024-01-01 02:10:00", 5.0)]  # filler: watermark now effective
    rows3 = [(4, "2024-01-01 00:10:00", 4.0)]  # straggler for window A
    for i, rows in enumerate([rows0, rows1, rows2, rows3]):
        (
            spark.createDataFrame(rows, "event_id long, ts_s string, value double")
            .select(
                "event_id",
                F.col("ts_s").cast("timestamp").alias("ts"),
                "value",
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{d}/batch{i}")
        )
        # the file source orders files by modification time; space them
        # out so batch0 < batch1 < batch2 is the replay order
        for root, _, files in os.walk(f"{d}/batch{i}"):
            for f in files:
                p = os.path.join(root, f)
                os.utime(p, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/batch*")
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("ws"), "n")
    )
    name = "late_test_result"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="wind_spark_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {str(r["ws"]): r["n"] for r in spark.table(name).collect()}
    # window A (00:00) closed with 2 rows; the straggler (event 4) was dropped
    assert got.get("2024-01-01 00:00:00") == 2, got


def test_streaming_dedup_within_watermark_drops_replays(spark):
    """ST5 watermark variant: dropDuplicatesWithinWatermark removes a
    duplicate event_id that re-arrives within the watermark window."""
    d = tempfile.mkdtemp(prefix="wind_spark_dupe_")
    rows0 = [(1, "2024-01-01 00:05:00", 1.0), (2, "2024-01-01 00:06:00", 2.0)]
    rows1 = [(1, "2024-01-01 00:07:00", 1.0), (3, "2024-01-01 00:08:00", 3.0)]
    for i, rows in enumerate([rows0, rows1]):
        (
            spark.createDataFrame(rows, "event_id long, ts_s string, value double")
            .select(
                "event_id", F.col("ts_s").cast("timestamp").alias("ts"), "value"
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{d}/batch{i}")
        )
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/batch*")
    )
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    name = "dedup_test_result"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="wind_spark_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    ids = sorted(r["event_id"] for r in spark.table(name).collect())
    assert ids == [1, 2, 3], ids


def test_events_stream_matches_batch_timestamps(spark):
    """The streaming source must read events.ts on the same clock as the
    batch loader regardless of the fixture's parquet encoding (NANOS in
    early fixture generations, MICROS later — `_events_raw_schema`
    decides from the footer).  A wrong branch compresses or inflates
    every timestamp 1000×, so comparing the min/max over the corpus
    against the batch loader catches it immediately."""
    sf_dir = "/root/testdata/sf0.001"
    stream_minmax = run_stream_pinned(
        events_stream(spark, sf_dir)
        .withWatermark("ts", "1 minute")
        .agg(
            F.min("ts").alias("ts_min"),
            F.max("ts").alias("ts_max"),
            F.count("*").alias("n"),
        ),
        "test_ts_clock",
    ).collect()[0]
    batch = (
        load(spark, sf_dir, "events")
        .agg(
            F.min("ts").alias("ts_min"),
            F.max("ts").alias("ts_max"),
            F.count("*").alias("n"),
        )
        .collect()[0]
    )
    assert stream_minmax["n"] == batch["n"]
    # naive-vs-UTC representations of the same instant (batch reads NTZ,
    # the stream declares LTZ under a UTC session) compare equal once
    # both are rendered naive
    for c in ("ts_min", "ts_max"):
        sv, bv = stream_minmax[c], batch[c]
        sv = sv.replace(tzinfo=None) if sv.tzinfo else sv
        bv = bv.replace(tzinfo=None) if bv.tzinfo else bv
        assert sv == bv, (c, sv, bv)


def test_dedup_within_watermark_evicts_state_after_expiry(spark):
    """ST14's bounded-state guarantee, both directions: a key
    re-delivered while its state lives is dropped (the previous test),
    and once the watermark passes the key's expiry its state is
    EVICTED — a later re-delivery with a fresh event time is treated
    as new and re-emitted.  That re-emission is the observable proof
    the store does not grow with the stream's lifetime (plain
    dropDuplicates would have dropped it forever).  Batch order is
    pinned via file mtimes (the file source processes oldest-first);
    the spacer batch matters because eviction for batch N's watermark
    runs as N completes, while matching in N still sees pre-eviction
    state."""
    import os

    d = tempfile.mkdtemp(prefix="wind_spark_evict_")
    batches = [
        # key 1 @ t0 + a watermark advancer 2h later (delay = 10 min,
        # so key 1's state expiry ~t0+10min is far below the watermark)
        ("f1", [(1, "2024-01-01 00:00:00"), (99, "2024-01-01 02:00:00")]),
        # spacer: lets the eviction computed from f1's watermark run
        ("f2", [(98, "2024-01-01 02:00:01")]),
        # fresh-timestamp redelivery of key 1 AFTER its state is gone
        ("f3", [(1, "2024-01-01 02:00:02")]),
    ]
    for i, (name, rows) in enumerate(batches):
        (
            spark.createDataFrame(rows, "event_id long, ts_s string")
            .select("event_id", F.col("ts_s").cast("timestamp").alias("ts"))
            .coalesce(1)
            .write.parquet(f"{d}/{name}")
        )
        t = 1_700_000_000 + i * 10
        for root, _, files in os.walk(f"{d}/{name}"):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))
    stream = (
        spark.readStream.schema("event_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/f*")
    )
    deduped = stream.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    name = "evict_test_result"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="wind_spark_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = [r["event_id"] for r in spark.table(name).collect()]
    assert emitted.count(1) == 2, emitted  # re-emitted after eviction
    assert sorted(set(emitted)) == [1, 98, 99]
    # and the store really shrank: some batch reports an eviction
    assert any(
        op.get("numRowsRemoved", 0) > 0
        for p in q.recentProgress
        for op in p["stateOperators"]
    )


def test_run_stream_pinned_mode_mapping_multi_batch(spark):
    """The pinned sink's mode→write mapping must mirror the memory
    sink it replaced ACROSS micro-batches, not just on single-batch
    replays: ``complete`` re-emits the whole result every batch and
    the pin must hold ONLY the final emission (overwrite — an append
    here would duplicate every earlier batch's rows), while
    ``update`` accumulates per-batch emissions (append — an overwrite
    here would lose every non-final emission).  A 3-file replay with
    ``maxFilesPerTrigger=1`` forces three micro-batches over the same
    two keys."""
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="wind_spark_pinmode_")
    try:
        for i in range(3):
            (
                spark.createDataFrame(
                    [(i * 2, "a"), (i * 2 + 1, "b")], "event_id long, k string"
                )
                .coalesce(1)
                .write.parquet(f"{d}/batch{i}")
            )
        def stream():
            return (
                spark.readStream.schema("event_id long, k string")
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{d}/batch*")
                .groupBy("k")
                .agg(F.count("*").alias("n"))
            )

        done = run_stream_pinned(stream(), "test_pinmode_c", "complete")
        # overwrite semantics: exactly the final totals, once each
        assert sorted(map(tuple, done.collect())) == [("a", 3), ("b", 3)]
        upd = run_stream_pinned(stream(), "test_pinmode_u", "update")
        rows = sorted(map(tuple, upd.collect()))
        # append semantics: one emission per key per batch (counts
        # 1, 2, 3 each) — the memory sink's update-mode accumulation
        assert rows == [("a", 1), ("a", 2), ("a", 3),
                        ("b", 1), ("b", 2), ("b", 3)]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_view_notification_gap_and_redelivery(spark, tmp_path):
    """The daemon notification law (round-15 review): application
    spans (watermark, t), so a LOST notification is healed by the next
    one — the feed covers the whole gap — and the late redelivery of
    the lost transaction is a skip, never a double-apply.  The
    original (t-1, t) span applied only the tail delta onto the stale
    view and advanced the watermark past the unapplied transaction
    forever."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        txn_commit,
    )
    from update_database_by_wind_spark.streaming.pipelines import (
        _ViewStore,
        _apply_view_notification,
        _feed_group_view,
    )

    base = str(tmp_path / "g")
    spec = {
        "orders": ("o_month", "k", ["cents"]),
        "lineitem": ("o_month", "k", ["qty"]),
    }

    def odf(rows):
        return spark.createDataFrame(
            rows, "o_month string, k long, cents long"
        )

    def ldf(rows):
        return spark.createDataFrame(
            rows, "o_month string, k long, qty long"
        )

    txn_commit(base, 1, {
        "orders": (odf([("m1", 1, 100), ("m2", 2, 200)]), "o_month", None),
        "lineitem": (ldf([("m1", 1, 5), ("m2", 2, 7)]), "o_month", None),
    })
    # txn 2 re-prices m1; txn 3 re-prices m2 — distinct months so a
    # missed txn-2 application is VISIBLE in the final state
    txn_commit(base, 2, {
        "orders": (odf([("m1", 1, 110)]), "o_month", ["m1"]),
    })
    txn_commit(base, 3, {
        "orders": (odf([("m2", 2, 220)]), "o_month", ["m2"]),
    })

    store = _ViewStore(spark, str(tmp_path))
    recompute = lambda t: _feed_group_view(spark, base, t)  # noqa: E731
    store.publish(recompute(1), 1)

    def rows():
        return sorted(
            map(
                tuple,
                store.read()
                .select("o_month", "n_orders", "total_cents", "total_qty")
                .collect(),
            )
        )

    # notification for txn 2 is LOST; txn 3 arrives first
    assert _apply_view_notification(
        spark, base, store, spec, 3, recompute
    ) == "incremental"
    assert store.watermark() == 3
    assert rows() == [("m1", 1, 110, 5), ("m2", 1, 220, 7)], (
        "the (watermark, t) span must carry txn 2's m1 re-price "
        "through the gap"
    )
    # the late redelivery of txn 2 is a skip with the store untouched
    before = store.listing()
    assert _apply_view_notification(
        spark, base, store, spec, 2, recompute
    ) == "skip"
    assert store.listing() == before
