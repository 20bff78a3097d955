"""Aggregation operators (SURVEY.md §2.4 A1–A10).

All hash aggregates: Spark plans partial (map-side) + final aggregation
automatically, so a groupBy on (l_returnflag, l_linestatus) over 100 TB
shuffles only 6 partially-aggregated rows per map task — the shuffle is
O(groups × tasks), not O(rows).  Money sums use the decimal-exact
helpers in functions/numeric.py so results are order-independent
(identical under any partitioning — see that module's docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from update_database_by_wind_spark.functions.numeric import (
    dec_avg,
    dec_sum,
    sql_dec_avg,
    sql_dec_sum,
)
from update_database_by_wind_spark.registry import query
from update_database_by_wind_spark.sources import load

# Flagship: TPC-H Q1-shaped pricing summary (SURVEY.md §7 M0).
# In the reference category this is the daily OHLC/volume rollup over
# (code, date) series; here it rolls lineitem up by flag/status.
_A1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dec_sum('l_quantity', 'sum_qty')},
  {sql_dec_sum('l_extendedprice', 'sum_base_price')},
  {sql_dec_sum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
  {sql_dec_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
  {sql_dec_avg('l_quantity', 'avg_qty')},
  {sql_dec_avg('l_extendedprice', 'avg_price')},
  {sql_dec_avg('l_discount', 'avg_disc')},
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("a1_pricing_summary", oracle=_A1_ORACLE, tags=("agg", "flagship"))
def a1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: multi-aggregate hash rollup (sum/avg/count) with pushed filter.

    Plan shape: parquet scan with PushedFilters on l_shipdate +
    ReadSchema pruned to 7 columns → partial HashAggregate →
    6-row shuffle → final HashAggregate (whole-stage codegen).
    """
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity", "sum_qty"),
            dec_sum("l_extendedprice", "sum_base_price"),
            dec_sum(disc_price, "sum_disc_price"),
            dec_sum(charge, "sum_charge"),
            dec_avg("l_quantity", "avg_qty"),
            dec_avg("l_extendedprice", "avg_price"),
            dec_avg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
