"""Storage-layout operators (SURVEY.md §2.1 S1b, §2.6 O3): partitioned
parquet writes with partition-pruned read-back.

This is the 100 TB bedrock: a fact table laid out as
``.../o_month=1996-01/part-*.parquet`` turns a month-range query from
a full scan into a directory listing — pruning happens before any
byte is read.  ``sortWithinPartitions`` (O3) before the write gives
each file internally sorted row groups (tighter min/max stats →
row-group skipping for key lookups) without a global sort.

The bucketed-table variant (co-located shuffle-free joins via
``bucketBy`` + ``saveAsTable``) is exercised in
tests/test_plans.py::test_bucketed_join_avoids_shuffle — it needs a
warehouse catalog, so it lives in the test tier rather than the
registry.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from update_database_by_wind_spark.functions.numeric import dec_sum, sql_dec_sum
from update_database_by_wind_spark.registry import query
from update_database_by_wind_spark.sources import load

_S1B_ORACLE = f"""
SELECT strftime(o_orderdate, '%Y-%m') AS o_month,
       o_orderstatus,
       COUNT(*) AS n_orders,
       {sql_dec_sum('o_totalprice', 'total_price')}
FROM orders
WHERE strftime(o_orderdate, '%Y-%m') IN ('1996-01', '1996-02')
GROUP BY 1, 2
"""


@query("s1b_partitioned_parquet", oracle=_S1B_ORACLE, tags=("source", "layout"))
def s1b_partitioned_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1b+O3: write orders hive-partitioned by month (sorted within
    partitions by orderkey for row-group stats), read back with a
    two-month filter — the scan lists only the two matching
    directories (PartitionFilters; asserted in tests/test_plans.py) —
    and aggregate; oracle-checked against the original parquet so the
    layout round trip is proven lossless."""
    orders = load(spark, sf_dir, "orders").withColumn(
        "o_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    out = tempfile.mkdtemp(prefix="wind_spark_part_") + "/orders"
    (
        orders.sortWithinPartitions("o_orderkey")
        .write.mode("overwrite")
        .partitionBy("o_month")
        .parquet(out)
    )
    back = spark.read.parquet(out).filter(
        F.col("o_month").isin("1996-01", "1996-02")
    )
    return back.groupBy("o_month", "o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        dec_sum("o_totalprice", "total_price"),
    )
