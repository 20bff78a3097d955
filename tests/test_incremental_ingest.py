"""S12 checkpointed-ingest laws (operators/sources_ops.py):

exactly-once under normal operation (covered by the registry query's
own asserts + oracle), and the documented at-least-once recovery
story: a crash BETWEEN the data append and the manifest commit makes
the next run reprocess that batch — duplicates appear in the raw
target and the keep-latest dedup (U4's primitive) heals them, which
is why the docstring names idempotent downstream dedup as the
companion primitive.
"""

from update_database_by_wind_spark.operators.sources_ops import (
    incremental_ingest,
)


def test_crash_between_append_and_commit_heals_via_dedup(spark, tmp_path):
    src = str(tmp_path / "src")
    target = str(tmp_path / "t")
    state = str(tmp_path / "state.json")
    rows = "pk long, val long"

    b1 = spark.createDataFrame([(i, i * 10) for i in range(5)], rows)
    b1.write.parquet(f"{src}/batch1")
    assert incremental_ingest(spark, src, target, state) == ["batch1"]

    b2 = spark.createDataFrame([(i, i * 10) for i in range(5, 10)], rows)
    b2.write.parquet(f"{src}/batch2")
    # simulate the crash window: data appended, manifest NOT committed
    b2.write.mode("append").parquet(target)

    # recovery run: the manifest has never seen batch2 -> reprocessed
    assert incremental_ingest(spark, src, target, state) == ["batch2"]
    raw = spark.read.parquet(target)
    assert raw.count() == 15  # batch2 landed twice

    healed = raw.dropDuplicates(["pk"])
    assert sorted(map(tuple, healed.collect())) == [
        (i, i * 10) for i in range(10)
    ]
    # manifest now committed: a further run is a no-op
    assert incremental_ingest(spark, src, target, state) == []


def test_streaming_bridge_lands_identical_table_to_batch_loop(
    spark, tmp_path
):
    """ST15 × S12: the same landed batches ingested once through the
    manifest loop and once through the file-source/foreachBatch bridge
    must produce identical target tables — the two discovery paths are
    interchangeable."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    bt, st_t = str(tmp_path / "batch_t"), str(tmp_path / "stream_t")
    state, ckpt = str(tmp_path / "state.json"), str(tmp_path / "ckpt")
    rows = spark.range(40).select(
        F.concat(F.lit("k"), (F.col("id") % 4)).alias("o_month"),
        F.col("id").alias("cents"),
    )
    rows.filter(F.col("id") < 25).write.parquet(f"{src}/batch1")

    def run_stream():
        stream = spark.readStream.schema(
            "o_month string, cents long"
        ).parquet(f"{src}/*")
        h = (
            stream.writeStream.foreachBatch(
                lambda b, _i: b.write.mode("append").parquet(st_t)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        h.awaitTermination()

    assert incremental_ingest(spark, src, bt, state) == ["batch1"]
    run_stream()
    rows.filter(F.col("id") >= 25).write.parquet(f"{src}/batch2")
    assert incremental_ingest(spark, src, bt, state) == ["batch2"]
    run_stream()
    assert incremental_ingest(spark, src, bt, state) == []
    run_stream()  # no-op too

    batch_rows = sorted(
        map(tuple, spark.read.parquet(bt).select("o_month", "cents").collect())
    )
    stream_rows = sorted(
        map(
            tuple,
            spark.read.parquet(st_t).select("o_month", "cents").collect(),
        )
    )
    assert batch_rows == stream_rows and len(batch_rows) == 40
