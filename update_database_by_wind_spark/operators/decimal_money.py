"""Decimal-typed variants of the money paths (SURVEY.md §1.2 trade-off,
round-2 item: prove the engine is not double-only).

The standard registry queries cast exact decimal sums back to double so
they hash-match DuckDB's float64 dataframe output.  A financial
deployment instead keeps money DECIMAL end to end; these variants do
exactly that — per-row cast to DECIMAL(38,6), exact decimal SUM, and
the total emitted as the decimal's *canonical string rendering*
("1234.500000"), which both engines produce identically, so the
lossless decimal value itself is what the driver hash-compares.  The
value never transits IEEE double on the output side: any silent
double-rounding anywhere in the pipeline would change the last digits
of the string and fail the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from update_database_by_wind_spark.functions.numeric import PREC, SCALE
from update_database_by_wind_spark.registry import query
from update_database_by_wind_spark.sources import load

_DEC = f"decimal({PREC},{SCALE})"


def dec_sum_str(c, alias: str):
    """Exact decimal SUM rendered as its canonical string (lossless)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(col.cast(_DEC)).cast(_DEC).cast("string").alias(alias)


def sql_dec_sum_str(expr: str, alias: str) -> str:
    return (
        f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL({PREC},{SCALE})))"
        f" AS DECIMAL({PREC},{SCALE})) AS VARCHAR) AS {alias}"
    )


# --- A1 decimal: pricing summary with DECIMAL money columns -------------------

_A1D_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dec_sum_str('l_quantity', 'sum_qty_dec')},
  {sql_dec_sum_str('l_extendedprice', 'sum_base_price_dec')},
  {sql_dec_sum_str('l_extendedprice * (1 - l_discount)', 'sum_disc_price_dec')},
  {sql_dec_sum_str('l_extendedprice * (1 - l_discount) * (1 + l_tax)',
                   'sum_charge_dec')},
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@query("a1d_pricing_summary_decimal", oracle=_A1D_ORACLE, tags=("agg", "decimal"))
def a1d_pricing_summary_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 decimal variant: the TPC-H Q1 money sums kept DECIMAL(38,6)
    through aggregation and surfaced as canonical decimal strings —
    the exact total a ledger would store, not its double approximation.
    Same plan shape as a1 (pushed filter, two-phase hash agg); decimal
    sums partial-aggregate map-side exactly like longs."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(
            F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum_str("l_quantity", "sum_qty_dec"),
            dec_sum_str("l_extendedprice", "sum_base_price_dec"),
            dec_sum_str(disc_price, "sum_disc_price_dec"),
            dec_sum_str(charge, "sum_charge_dec"),
            F.count("*").alias("count_order"),
        )
    )


# --- J1 decimal: star-join revenue as DECIMAL ---------------------------------

_J1D_ORACLE = f"""
SELECT r_name, n_name,
       {sql_dec_sum_str('l_extendedprice * (1 - l_discount)', 'revenue_dec')},
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY r_name, n_name
"""


@query(
    "j1d_star_join_revenue_decimal", oracle=_J1D_ORACLE, tags=("join", "decimal")
)
def j1d_star_join_revenue_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 decimal variant: the star-join revenue rollup with the money
    total kept DECIMAL(38,6) and emitted losslessly.  Identical join
    strategy to j1 (dims broadcast, fact shuffles once)."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            dec_sum_str(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue_dec",
            ),
            F.count("*").alias("n_items"),
        )
    )


# --- U9 decimal: incremental rollup whose merged state stays DECIMAL ----------

_U9D_ORACLE = f"""
SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP_NS) AS day,
       COUNT(*) AS n_orders,
       {sql_dec_sum_str('o_totalprice', 'day_revenue_dec')}
FROM orders
GROUP BY date_trunc('day', o_orderdate)
"""


@query(
    "u9d_incremental_rollup_decimal",
    oracle=_U9D_ORACLE,
    tags=("update", "rollup", "decimal"),
)
def u9d_incremental_rollup_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U9 decimal variant: merge(state, delta) ≡ recompute with the
    materialized revenue kept DECIMAL(38,6) through the partial sums,
    the full-outer merge, AND the output.  Decimal addition is exact
    and associative, so the incremental path cannot drift from the
    recompute by even a ULP — the property that makes a stored
    financial rollup auditable."""
    _CUT = "1999-01-01 00:00:00"
    orders = load(spark, sf_dir, "orders")
    day = F.date_trunc("day", "o_orderdate").alias("day")

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy(day).agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast(_DEC)).alias("rev"),
        )

    state = rollup(
        orders.filter(F.col("o_orderdate") < F.lit(_CUT).cast("timestamp"))
    )
    delta = rollup(
        orders.filter(F.col("o_orderdate") >= F.lit(_CUT).cast("timestamp"))
    )
    merged = state.alias("s").join(
        delta.alias("d"), F.col("s.day") == F.col("d.day"), "full_outer"
    )
    zero = F.lit(0).cast(_DEC)
    return merged.select(
        F.coalesce(F.col("s.day"), F.col("d.day")).alias("day"),
        (
            F.coalesce(F.col("s.n"), F.lit(0))
            + F.coalesce(F.col("d.n"), F.lit(0))
        ).alias("n_orders"),
        (F.coalesce(F.col("s.rev"), zero) + F.coalesce(F.col("d.rev"), zero))
        .cast(_DEC)
        .cast("string")
        .alias("day_revenue_dec"),
    )
