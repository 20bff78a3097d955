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
