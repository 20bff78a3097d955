"""JDBC source/sink/upsert tests against the bundled Derby engine
(in-memory DB inside the Spark JVM — real JDBC protocol end-to-end).
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from update_database_by_wind_spark.sources import load
from update_database_by_wind_spark.sources.jdbc import (
    foreach_batch_upsert,
    read_jdbc_partitioned,
    upsert_jdbc,
    write_jdbc,
)


@pytest.fixture()
def derby_url(spark):
    name = "testdb_" + uuid.uuid4().hex[:10]
    return f"jdbc:derby:memory:{name};create=true"


def test_jdbc_write_then_partitioned_read_roundtrip(spark, sf_oracle, derby_url):
    orders = (
        load(spark, sf_oracle, "orders")
        .filter(F.col("o_orderkey") % 5 == 0)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    )
    write_jdbc(orders, derby_url, "orders_t", mode="overwrite")
    lo, hi = 0, orders.agg(F.max("o_orderkey")).first()[0] + 1
    back = read_jdbc_partitioned(
        spark, derby_url, "orders_t", "o_orderkey", lo, hi, num_partitions=4
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == orders.count()
    a = sorted(map(tuple, orders.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b  # doubles/strings round-trip bit-exactly


def test_jdbc_upsert_source_wins_and_inserts(spark, derby_url):
    initial = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c")],
        "pk long, val double, tag string",
    )
    write_jdbc(initial, derby_url, "t", mode="overwrite")
    updates = spark.createDataFrame(
        [(2, 99.0, "b2"), (4, 40.0, "d")], "pk long, val double, tag string"
    )
    upsert_jdbc(updates, derby_url, "t", pk_cols=["pk"])
    got = {
        r["pk"]: (r["val"], r["tag"])
        for r in spark.read.jdbc(derby_url, "t").collect()
    }
    assert got == {
        1: (10.0, "a"),
        2: (99.0, "b2"),  # updated
        3: (30.0, "c"),
        4: (40.0, "d"),  # inserted
    }


def test_jdbc_upsert_is_idempotent(spark, derby_url):
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "pk long, val double")
    write_jdbc(df, derby_url, "t", mode="overwrite")
    updates = spark.createDataFrame([(2, 5.0), (3, 3.0)], "pk long, val double")
    upsert_jdbc(updates, derby_url, "t", pk_cols=["pk"])
    upsert_jdbc(updates, derby_url, "t", pk_cols=["pk"])  # re-run: no-op
    got = sorted(map(tuple, spark.read.jdbc(derby_url, "t").collect()))
    assert got == [(1, 1.0), (2, 5.0), (3, 3.0)]


def test_jdbc_upsert_dedupes_source_keep_latest(spark, derby_url):
    df = spark.createDataFrame([(1, 0.0, 0)], "pk long, val double, v int")
    write_jdbc(df, derby_url, "t", mode="overwrite")
    # two versions of pk=1 in one batch; v (order_col) picks the winner
    updates = spark.createDataFrame(
        [(1, 111.0, 2), (1, 110.0, 1)], "pk long, val double, v int"
    )
    upsert_jdbc(updates, derby_url, "t", pk_cols=["pk"], order_col="v")
    got = spark.read.jdbc(derby_url, "t").collect()
    assert len(got) == 1 and got[0]["val"] == 111.0


def test_streaming_foreach_batch_jdbc_upsert(spark, sf_oracle, derby_url):
    """S8/ST9 end-to-end: stream → foreachBatch → stage+MERGE into
    Derby; final table equals the batch-mode per-user latest value."""
    from update_database_by_wind_spark.streaming.pipelines import events_stream

    # seed the target with a sentinel so MERGE exercises both branches
    seed = spark.createDataFrame(
        [(-1, -1, 0.0)], "user_id long, event_id long, last_value double"
    )
    write_jdbc(seed, derby_url, "user_state", mode="overwrite")

    stream = events_stream(spark, sf_oracle).select(
        "user_id", "event_id", F.col("value").alias("last_value")
    )
    import tempfile

    q = (
        stream.writeStream.foreachBatch(
            foreach_batch_upsert(
                derby_url, "user_state", ["user_id"], order_col="event_id"
            )
        )
        .option("checkpointLocation", tempfile.mkdtemp(prefix="wind_spark_jdbc_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    batch_latest = (
        load(spark, sf_oracle, "events")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
            ),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", "value")
    )
    want = {r["user_id"]: r["value"] for r in batch_latest.collect()}
    got_rows = spark.read.jdbc(derby_url, "user_state").collect()
    got = {r["user_id"]: r["last_value"] for r in got_rows if r["user_id"] >= 0}
    assert got == want


def test_jdbc_read_pushes_filters_and_prunes_columns(spark, sf_oracle, derby_url):
    """The filter and the projection must cross the JDBC wire as SQL —
    at 100 TB the database does the filtering, not Spark.  The plan's
    PushedFilters entries must be *-starred (fully handled by the
    source, no residual Spark Filter) and ReadSchema must carry only
    the projected column (SELECT c_custkey ... WHERE ..., not
    SELECT *)."""
    from update_database_by_wind_spark.plans import formatted_plan

    cust = load(spark, sf_oracle, "customer").select("c_custkey", "c_acctbal")
    write_jdbc(cust, derby_url, "cust_t", mode="overwrite")
    back = (
        spark.read.jdbc(derby_url, "cust_t")
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey")
    )
    plan = formatted_plan(back)
    assert "*GreaterThan(c_acctbal,5000.0)" in plan, plan
    read_schema = next(
        ln for ln in plan.splitlines() if "ReadSchema" in ln
    )
    assert "c_custkey" in read_schema and "c_acctbal" not in read_schema
    # and the pushed plan returns the right rows
    expected = cust.filter(F.col("c_acctbal") > 5000).count()
    assert back.count() == expected
