"""Source/sink round-trip operators (SURVEY.md §2.1 S2–S5).

Each query writes a slice of the corpus out through a format (CSV /
JSON lines / JDBC), reads it back through the matching source with an
explicit schema (never inference — inference is nondeterministic on
malformed rows and costs an extra pass at scale), aggregates, and is
oracle-checked against the ORIGINAL parquet — so the round trip is
proven lossless, not just runnable.

Scale notes: CSV/JSON writers shard per partition (a directory of
part files, exactly how a 100 TB export lands); the JDBC read-back is
range-partitioned so every executor pulls its own key range.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from update_database_by_wind_spark.functions.numeric import dec_sum, sql_dec_sum
from update_database_by_wind_spark.registry import query
from update_database_by_wind_spark.sources import load
from update_database_by_wind_spark.sources.jdbc import (
    read_jdbc_partitioned,
    write_jdbc,
)

_S2_ORACLE = f"""
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       {sql_dec_sum('c_acctbal', 'total_balance')}
FROM customer
WHERE c_custkey % 3 = 0
GROUP BY c_mktsegment
"""


@query("s2_csv_roundtrip", oracle=_S2_ORACLE, tags=("source", "csv"))
def s2_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: CSV write→read round trip with explicit schema (header on,
    no inference pass).  Doubles survive CSV because Spark writes
    shortest-roundtrip representations."""
    customer = load(spark, sf_dir, "customer").filter(F.col("c_custkey") % 3 == 0)
    out = tempfile.mkdtemp(prefix="wind_spark_csv_") + "/customer"
    customer.write.mode("overwrite").option("header", True).csv(out)
    back = (
        spark.read.schema(
            "c_custkey long, c_name string, c_nationkey int,"
            " c_acctbal double, c_mktsegment string"
        )
        .option("header", True)
        .csv(out)
    )
    return back.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        dec_sum("c_acctbal", "total_balance"),
    )


_S3_ORACLE = f"""
SELECT event_type,
       COUNT(*) AS n_events,
       {sql_dec_sum('value', 'total_value')},
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT)
         AS sum_k
FROM events
WHERE event_id % 4 = 1
GROUP BY event_type
"""


@query("s3_json_roundtrip", oracle=_S3_ORACLE, tags=("source", "json"))
def s3_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: JSON-lines write→read round trip (explicit schema) with
    nested JSON-in-string extraction after the trip — the event-log
    interchange format."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") % 4 == 1)
    out = tempfile.mkdtemp(prefix="wind_spark_json_") + "/events"
    ev.write.mode("overwrite").json(out)
    back = spark.read.schema(
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    ).json(out)
    k = F.from_json(F.col("props"), "k INT").getField("k")
    return back.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        dec_sum("value", "total_value"),
        F.sum(k).cast("long").alias("sum_k"),
    )


_S4_ORACLE = f"""
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       {sql_dec_sum('o_totalprice', 'total_price')}
FROM orders
WHERE o_orderkey % 5 = 0
GROUP BY o_orderstatus
"""


@query("s4_jdbc_roundtrip", oracle=_S4_ORACLE, tags=("source", "jdbc"))
def s4_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4+S5: real JDBC round trip — parallel write into Derby
    (bundled with Spark), range-partitioned parallel read back, then
    aggregate; oracle-checked against the original parquet so the
    JDBC path is proven value-exact, not just connected."""
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 5 == 0)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
    )
    url = f"jdbc:derby:memory:q_{uuid.uuid4().hex[:10]};create=true"
    write_jdbc(orders, url, "orders_t", mode="overwrite")
    hi = orders.agg(F.max("o_orderkey")).first()[0] + 1
    back = read_jdbc_partitioned(
        spark, url, "orders_t", "o_orderkey", 0, hi, num_partitions=8
    )
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        dec_sum("o_totalprice", "total_price"),
    )


_S2B_ORACLE = f"""
SELECT p_brand,
       COUNT(*) AS n_parts,
       {sql_dec_sum('p_retailprice', 'total_price')},
       CAST(MAX(p_size) AS INTEGER) AS max_size
FROM part
WHERE p_partkey % 2 = 1
GROUP BY p_brand
"""


@query("s2b_orc_roundtrip", oracle=_S2B_ORACLE, tags=("source", "orc"))
def s2b_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2b: ORC write→read round trip — the second columnar format a
    warehouse migration meets (Hive estates are ORC).  Same contract
    as the CSV/JSON trips: explicit schema on read-back, aggregate,
    oracle-checked against the ORIGINAL parquet so the trip is proven
    lossless (ORC stores doubles/longs natively, so value fidelity is
    structural, not luck)."""
    part = load(spark, sf_dir, "part").filter(F.col("p_partkey") % 2 == 1)
    out = tempfile.mkdtemp(prefix="wind_spark_orc_") + "/part"
    part.write.mode("overwrite").orc(out)
    back = spark.read.schema(
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double"
    ).orc(out)
    return back.groupBy("p_brand").agg(
        F.count("*").alias("n_parts"),
        dec_sum("p_retailprice", "total_price"),
        F.max("p_size").alias("max_size"),
    )
