"""Deeper TPC-H-shaped relational queries (SURVEY.md §2.2–2.6, §5.7).

The harness fixtures are "TPC-H-ish" (TESTDATA.md), so the classic
TPC-H query *shapes* — multi-way star joins with selective filters,
conditional-aggregate ratios, HAVING-style group filters, top-k with
deterministic tie-breaks — are the natural templates for relational
depth, adapted to the columns that actually exist (FIXTURES.md; e.g.
there is no l_shipmode / l_commitdate, so Q12's shape uses
o_orderpriority and ship-lag instead).

Scale notes (100 TB): every query here keeps the fact table in a
single scan, broadcasts all bounded dimensions, and pushes the
selective date/flag filters into the parquet scan (verified patterns
in tests/test_plans.py for the same shapes).  The only fact⋈fact
shuffle is lineitem⋈orders on the order key.  Money aggregates use the
decimal-exact helpers (functions/numeric.py) so results are
partitioning-independent — identical on local[32] and on 1000
executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from update_database_by_wind_spark.functions.numeric import (
    dec_sum,
    sql_dec_sum,
)
from update_database_by_wind_spark.registry import query
from update_database_by_wind_spark.sources import load

# --- Q5 shape: local-supplier volume ---------------------------------
# The full TPC-H Q5 join graph: lineitem⋈orders⋈customer⋈supplier⋈
# nation⋈region with the "local" constraint c_nationkey = s_nationkey.
# Distinct from j1_star_join_revenue, which has no supplier leg and no
# locality constraint.

_Q5_ORACLE = f"""
SELECT n_name,
       {sql_dec_sum('l_extendedprice * (1 - l_discount)', 'revenue')},
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


@query("q5_local_supplier_volume", oracle=_Q5_ORACLE, tags=("join", "tpch"))
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue from orders where the supplier and the
    customer share a nation, one region, one order-year.  The locality
    predicate (c_nationkey = s_nationkey) rides the broadcast joins as
    a residual filter — no extra shuffle beyond lineitem⋈orders."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .filter(customer.c_nationkey == supplier.s_nationkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


# --- Q10 shape: returned-item revenue, top 20 customers ---------------

_Q10_ORACLE = f"""
SELECT c_custkey, c_name, n_name,
       {sql_dec_sum('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("q10_returned_item_revenue", oracle=_Q10_ORACLE, tags=("join", "tpch"))
def q10_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in
    one half-year.  The LIMIT is deterministic across engines because
    revenue is decimal-exact (identical doubles) and ties break on the
    unique c_custkey.  Plans as TakeOrderedAndProject — no global
    sort materialization."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load(spark, sf_dir, "nation")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# --- Q12 shape: priority mix of late-shipped lines --------------------
# No l_shipmode/l_commitdate in the fixtures; the adapted shape
# classifies lines shipped > 60 days after order by linestatus and
# counts high- vs low-priority orders among them (the Q12 CASE-count
# pattern verbatim).

_Q12_ORACLE = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_lines,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_priority_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
GROUP BY l_linestatus
"""


@query("q12_late_shipment_priority", oracle=_Q12_ORACLE, tags=("join", "tpch"))
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counts (CASE inside SUM) of high-
    vs low-priority orders among late-shipped lines.  The 60-day lag
    predicate is a residual on the single lineitem⋈orders shuffle."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("interval 60 days"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_priority_lines"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_priority_lines"),
        )
    )


# --- Q14 shape: promo revenue ratio -----------------------------------

_Q14_ORACLE = """
SELECT 100.0 *
       CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(38,6)) END) AS DOUBLE)
     / NULLIF(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                            AS DECIMAL(38,6))) AS DOUBLE), 0)
       AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
"""


@query("q14_promo_revenue", oracle=_Q14_ORACLE, tags=("join", "tpch"))
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: percentage of one month's revenue from PROMO
    parts.  Both the conditional and the total sum are decimal-exact;
    the single division happens in double on two bit-identical inputs,
    so the ratio matches the oracle exactly.  part is broadcast — the
    lineitem scan (with the shipdate filter pushed down) never
    shuffles."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    dec = "decimal(38,6)"
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", rev.cast(dec))
    ).cast("double")
    total = F.nullif(F.sum(rev.cast(dec)).cast("double"), F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg((F.lit(100.0) * promo / total).alias("promo_revenue_pct"))
    )


# --- Q18 shape: large-volume orders (HAVING over fact agg) ------------

_Q18_ORACLE = f"""
WITH big AS (
  SELECT l_orderkey,
         {sql_dec_sum('l_quantity', 'total_qty')}
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 250
)
SELECT c_custkey, c_name, o_orderkey,
       CAST(o_orderdate AS TIMESTAMP_NS) AS o_orderdate,
       o_totalprice, total_qty
FROM big
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


@query("q18_large_volume_orders", oracle=_Q18_ORACLE, tags=("join", "tpch"))
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose summed quantity exceeds 250
    (≈ 99th percentile, measured), with customer enrichment.  The
    HAVING filter runs on the aggregated (small) side *before* the
    joins — at 100 TB the post-agg row set is ~1% of orders, so the
    subsequent joins are cheap; customer is broadcast."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dec_sum("l_quantity", "total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
    )


# --- Q22 shape: high-balance customers with no orders -----------------

_Q22_ORACLE = f"""
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
         / COUNT(c_acctbal) AS ab
  FROM customer WHERE c_acctbal > 0.0
)
SELECT n_name,
       COUNT(*) AS n_customers,
       {sql_dec_sum('c_acctbal', 'total_balance')}
FROM customer
JOIN nation ON c_nationkey = n_nationkey
CROSS JOIN avg_bal
WHERE c_acctbal > ab
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c_custkey)
GROUP BY n_name
"""


@query("q22_dormant_high_balance", oracle=_Q22_ORACLE, tags=("join", "tpch"))
def q22_dormant_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers holding above-average balances who
    have never ordered (the sales-opportunity report), grouped by
    nation in place of Q22's phone country code.  The scalar average
    is a 1-row broadcast (decimal-exact so the comparison threshold is
    bit-identical across engines); the no-orders predicate is a
    left-anti join — never a per-row subquery."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    avg_bal = (
        customer.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(38,6)")).cast("double")
                / F.count("c_acctbal")
            ).alias("ab")
        )
    )
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            dec_sum("c_acctbal", "total_balance"),
        )
    )
