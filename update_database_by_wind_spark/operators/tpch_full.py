"""The remaining TPC-H query shapes — full 22-of-22 coverage
(SURVEY.md §2.3/§2.4/§5.7; complements operators/tpch_extra.py which
carries Q3/Q5/Q10/Q12/Q14/Q18/Q22 and operators/aggregates.py whose
a1_pricing_summary is Q1 verbatim).

The fixtures are TPC-H-ish but narrower than the spec (TESTDATA.md):
there is no ``partsupp`` table and no l_shipmode / l_commitdate /
l_receiptdate / p_container / p_mfgr columns.  Adaptation conventions,
consistent with tpch_extra.py:

* part↔supplier relationships (Q2/Q11/Q16/Q20's partsupp) are derived
  from ``lineitem`` — the observed (l_partkey, l_suppkey) pairs — with
  unit cost MIN(l_extendedprice / l_quantity) standing in for
  ps_supplycost and shipped quantity standing in for ps_availqty.
* commit/receipt lateness (Q4/Q21) uses the ship-lag convention Q12
  established: a line is "late" when l_shipdate > o_orderdate + N days.
* Q22's phone-prefix grouping was already adapted to nations.

Every query keeps the classic plan discipline: ONE scan of each fact
table, bounded dimensions broadcast, selective filters pushed into the
parquet scan, money aggregates decimal-exact (functions/numeric.py) so
results are partitioning-independent.  Scale notes per query below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from update_database_by_wind_spark.functions.numeric import (
    PREC,
    SCALE,
    dec_avg,
    dec_sum,
    sql_dec_avg,
    sql_dec_sum,
)
from update_database_by_wind_spark.registry import query
from update_database_by_wind_spark.sources import load

_REV = "l_extendedprice * (1 - l_discount)"


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --- Q2 shape: minimum-cost supplier ---------------------------------
# Classic Q2 finds, per part of a given size/type, the region supplier
# with MIN(ps_supplycost), via a correlated scalar subquery.  Adapted:
# supply cost := MIN(l_extendedprice / l_quantity) over that
# supplier's shipments of that part (per-row IEEE division then MIN —
# exact and order-independent, no sum drift).

_Q2_ORACLE = """
WITH costs AS (
  SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal, n_name,
         MIN(l_extendedprice / l_quantity) AS supply_cost
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE' AND p_size = 15 AND p_type = 'LARGE'
  GROUP BY p_partkey, p_brand, s_suppkey, s_name, s_acctbal, n_name
),
best AS (
  SELECT *, MIN(supply_cost) OVER (PARTITION BY p_partkey) AS min_cost
  FROM costs
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, supply_cost
FROM best
WHERE supply_cost = min_cost
ORDER BY s_acctbal DESC, s_name, p_partkey
LIMIT 100
"""


@query("q2_min_cost_supplier", oracle=_Q2_ORACLE, tags=("join", "tpch"))
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per qualifying part, the EUROPE supplier(s)
    achieving the minimum supply cost.  The correlated MIN subquery is
    a window over the small post-aggregation set — never a re-scan.
    At 100 TB: the part filter (size+type) prunes to ~0.3% of parts
    and is pushed into the broadcast build; lineitem is scanned once
    and immediately narrowed by the broadcast semi-filter on partkey."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    )
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    costs = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("p_partkey", "p_brand", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "supply_cost"
            )
        )
    )
    w = Window.partitionBy("p_partkey")
    return (
        costs.withColumn("min_cost", F.min("supply_cost").over(w))
        .filter(F.col("supply_cost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "supply_cost")
        .orderBy(F.col("s_acctbal").desc(), "s_name", "p_partkey")
        .limit(100)
    )


# --- Q4 shape: order-priority checking (EXISTS) ----------------------

_Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
"""


@query("q4_order_priority_check", oracle=_Q4_ORACLE, tags=("join", "tpch"))
def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per-priority count of one quarter's orders with
    at least one late line (ship-lag > 90 days standing in for
    commit<receipt).  The EXISTS is a LEFT SEMI hash join on the order
    key with the lag predicate as a residual — one shuffle, no
    row-at-a-time subquery, duplicate-safe by construction."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("interval 90 days")
    )
    return (
        orders.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# --- Q6 shape: forecasting revenue change ----------------------------

_Q6_ORACLE = f"""
SELECT {sql_dec_sum('l_extendedprice * l_discount', 'revenue')}
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@query("q6_forecast_revenue", oracle=_Q6_ORACLE, tags=("agg", "tpch"))
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate, the canonical pushdown
    benchmark.  All three predicates reach the parquet reader
    (min/max row-group pruning on shipdate); the plan is a single
    WholeStageCodegen over a 4-column read — no shuffle at any scale
    beyond the final 1-row partial-sum combine."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(dec_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


# --- Q7 shape: volume shipping between two nations -------------------

_Q7_ORACLE = f"""
SELECT supp_nation, cust_nation, l_year,
       {sql_dec_sum('volume', 'revenue')}
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         {_REV} AS volume
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@query("q7_volume_shipping", oracle=_Q7_ORACLE, tags=("join", "tpch"))
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year.  Both nation legs broadcast; the disjunctive nation-pair
    predicate runs as a residual after the broadcasts, so the only
    shuffle is lineitem⋈orders.  At 100 TB the two-year shipdate
    filter prunes row groups before the join."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders")
    supplier = load(spark, sf_dir, "supplier")
    customer = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), supplier.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), customer.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dec_sum(_rev(), "revenue"))
    )


# --- Q8 shape: national market share ---------------------------------

_Q8_ORACLE = f"""
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_5'
                THEN CAST(volume AS DECIMAL({PREC},{SCALE})) END) AS DOUBLE)
     / NULLIF(CAST(SUM(CAST(volume AS DECIMAL({PREC},{SCALE}))) AS DOUBLE), 0)
       AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         {_REV} AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
) all_nations
GROUP BY o_year
"""


@query("q8_market_share", oracle=_Q8_ORACLE, tags=("join", "tpch"))
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_5's share of ECONOMY-part revenue sold
    into ASIA customers, by order year.  Numerator and denominator are
    both decimal-exact sums; the single double division is bit-
    identical across engines.  Six dimension joins, all broadcast —
    one fact shuffle (lineitem⋈orders)."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_rkey")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dec = f"decimal({PREC},{SCALE})"
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_5", _rev().cast(dec))
    ).cast("double")
    den = F.nullif(F.sum(_rev().cast(dec)).cast("double"), F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), customer.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_rkey") == region.r_regionkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n2), supplier.s_nationkey == F.col("n2_key"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg((num / den).alias("mkt_share"))
    )


# --- Q9 shape: product-type profit measure ---------------------------
# ps_supplycost does not exist; unit cost := 0.5 * p_retailprice (a
# fixed margin model).  Profit arithmetic is per-row IEEE double then
# decimal-summed — engine-identical.

_Q9_ORACLE = f"""
SELECT nation, o_year, {sql_dec_sum('amount', 'sum_profit')}
FROM (
  SELECT n_name AS nation,
         CAST(year(l_shipdate) AS INTEGER) AS o_year,
         {_REV} - 0.5 * p_retailprice * l_quantity AS amount
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%widget%'
) profit
GROUP BY nation, o_year
"""


@query("q9_product_type_profit", oracle=_Q9_ORACLE, tags=("join", "tpch"))
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on 'widget' parts by supplier nation and
    ship year.  The LIKE filter lives in the broadcast part build, so
    the fact scan is narrowed by the broadcast hash semi-filter before
    any arithmetic.  No fact⋈fact shuffle at all (orders leg not
    needed — year comes from l_shipdate)."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    amount = _rev() - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dec_sum("amount", "sum_profit"))
    )


# --- Q11 shape: important stock identification -----------------------
# partsupp value := revenue shipped per part by one nation's
# suppliers; HAVING value > fraction-of-total via a 1-row broadcast
# scalar (same pattern as Q22's average-balance threshold).

_Q11_ORACLE = f"""
WITH nat_lines AS (
  SELECT l_partkey, {_REV} AS val
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
),
per_part AS (
  SELECT l_partkey AS p_key, {sql_dec_sum('val', 'part_value')}
  FROM nat_lines GROUP BY l_partkey
),
total AS (
  SELECT {sql_dec_sum('val', 'total_value')} FROM nat_lines
)
SELECT p_key, part_value
FROM per_part CROSS JOIN total
WHERE part_value > total_value * 0.005
"""


@query("q11_important_stock", oracle=_Q11_ORACLE, tags=("join", "tpch"))
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose shipped value from NATION_3
    suppliers exceeds 0.5% of that nation's total.  The nation-
    filtered line set is computed once and reused for both the
    per-part aggregate and the grand total (same single shuffle);
    the total is a 1-row broadcast, so the HAVING threshold costs
    nothing.  Both sums decimal-exact → the 0.005 threshold compare
    is engine-identical."""
    li = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    nat_lines = (
        li.join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select(F.col("l_partkey"), _rev().alias("val"))
    )
    per_part = nat_lines.groupBy(F.col("l_partkey").alias("p_key")).agg(
        dec_sum("val", "part_value")
    )
    total = nat_lines.agg(dec_sum("val", "total_value"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("total_value") * 0.005)
        .select("p_key", "part_value")
    )


# --- Q13 shape: customer order-count distribution --------------------

_Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                  AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


@query("q13_customer_distribution", oracle=_Q13_ORACLE, tags=("join", "tpch"))
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: histogram of per-customer order counts, with
    the special-category exclusion in the JOIN condition (not WHERE —
    customers with only urgent orders must still count as zero).
    Two shuffles: customer⋈orders on custkey, then the tiny
    count-of-counts regroup."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    cond = (customer.c_custkey == orders.o_custkey) & (
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        customer.join(orders, cond, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


# --- Q15 shape: top supplier (view + scalar-max subquery) ------------

_Q15_ORACLE = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {sql_dec_sum(_REV, 'total_revenue')}
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@query("q15_top_supplier", oracle=_Q15_ORACLE, tags=("join", "tpch"))
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum quarterly
    revenue.  The revenue view aggregates once; the scalar MAX rides
    an unpartitioned window over the ~|suppliers| aggregate (tiny),
    avoiding a second scan.  Decimal-exact revenue makes the equality
    against MAX safe across engines — the classic Q15 float-equality
    trap is why dec_sum exists."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    supplier = load(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dec_sum(_rev(), "total_revenue")
    )
    w = Window.partitionBy()
    best = revenue.withColumn("max_rev", F.max("total_revenue").over(w)).filter(
        F.col("total_revenue") == F.col("max_rev")
    )
    return (
        F.broadcast(supplier)
        .join(best, supplier.s_suppkey == best.supplier_no)
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --- Q16 shape: part/supplier relationship count ---------------------
# partsupp := DISTINCT (l_partkey, l_suppkey) from lineitem; the
# "complaints" supplier exclusion is adapted to negative account
# balance (no s_comment column).

_Q16_ORACLE = """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_type, p_size
"""


@query("q16_parts_supplier_relation", oracle=_Q16_ORACLE, tags=("join", "tpch"))
def q16_parts_supplier_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers can provide each
    qualifying (brand, type, size) bucket, excluding flagged
    suppliers.  The NOT IN is a broadcast LEFT ANTI join (NULL-safe
    here: s_suppkey is a key, never NULL); the distinct
    (part, supplier) projection happens before the part join so the
    dedup shuffle carries two ints per row, not part attributes."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    flagged = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    ps = li.select("l_partkey", "l_suppkey").distinct()
    return (
        ps.join(
            F.broadcast(flagged),
            ps.l_suppkey == flagged.s_suppkey,
            "left_anti",
        )
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


# --- Q17 shape: small-quantity-order revenue (correlated avg) --------

_Q17_ORACLE = f"""
WITH part_avg AS (
  SELECT l_partkey AS pa_key,
         {sql_dec_avg('l_quantity', 'avg_qty')}
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL({PREC},{SCALE}))) AS DOUBLE)
       / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN part_avg ON l_partkey = pa_key
WHERE p_brand = 'Brand#3'
  AND l_quantity < 0.2 * avg_qty
"""


@query("q17_small_quantity_revenue", oracle=_Q17_ORACLE, tags=("join", "tpch"))
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: average yearly revenue lost if small-quantity
    orders (below 20% of the part's mean quantity) were not filled.
    The correlated per-part average is de-correlated into one
    aggregate + an equi-join — the same rewrite Catalyst performs for
    scalar subqueries, written explicitly so the per-part aggregate is
    decimal-exact (the 0.2× threshold must be bit-identical)."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    part_avg = li.groupBy(F.col("l_partkey").alias("pa_key")).agg(
        dec_avg("l_quantity", "avg_qty")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(part_avg, li.l_partkey == F.col("pa_key"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast(f"decimal({PREC},{SCALE})"))
                .cast("double")
                / 7.0
            ).alias("avg_yearly")
        )
    )


# --- Q19 shape: discounted revenue under disjunctive predicates ------

_Q19_ORACLE = f"""
SELECT {sql_dec_sum(_REV, 'revenue')}
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


@query("q19_disjunctive_revenue", oracle=_Q19_ORACLE, tags=("join", "tpch"))
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under three OR'd brand/size/quantity
    branches.  The disjunction spans both tables so it cannot be
    pushed below the join — but Catalyst derives the common implied
    predicates (brand ∈ {…}, size ≤ 15) into the broadcast part build,
    which is exactly the Q19 optimizer test.  One broadcast, zero
    shuffles."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    q = F.col("l_quantity")

    def branch(brand: str, max_size: int, qlo: int, qhi: int) -> F.Column:
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, max_size)
            & q.between(qlo, qhi)
        )

    cond = (
        branch("Brand#1", 5, 1, 11)
        | branch("Brand#2", 10, 10, 20)
        | branch("Brand#3", 15, 20, 30)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(dec_sum(_rev(), "revenue"))
    )


# --- Q20 shape: potential part promotion (nested semi-joins) ---------
# ps_availqty > ½·shipped := a supplier ships > 50 units of a 'small'
# part in 1997; suppliers in one nation holding such excess qualify.

_Q20_ORACLE = """
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_0'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE 'small%'
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_suppkey, l_partkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 50
  )
"""


@query("q20_part_promotion", oracle=_Q20_ORACLE, tags=("join", "tpch"))
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: NATION_0 suppliers who moved >50 units of any
    'small…' part in 1997 (the excess-stock promotion list).  The
    nested IN collapses to: filtered-fact aggregate → distinct
    suppkeys → LEFT SEMI into the (tiny, broadcast-built) supplier
    side.  The expensive side aggregates BEFORE the semi-join, so the
    join input is |suppliers×parts|, not |lineitem|."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_0")
    movers = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(dec_sum("l_quantity", "qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    return (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(movers, supplier.s_suppkey == movers.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
    )


# --- Q21 shape: suppliers who kept orders waiting --------------------
# The hardest subquery shape in TPC-H: correlated EXISTS + NOT EXISTS.
# "late" uses the 60-day ship-lag convention from Q12.

_Q21_ORACLE = """
WITH late AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate > o_orderdate + INTERVAL 60 DAY
)
SELECT s_name, COUNT(*) AS numwait
FROM late l1
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_2'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM late l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


@query("q21_suppliers_kept_waiting", oracle=_Q21_ORACLE, tags=("join", "tpch"))
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: NATION_2 suppliers who were the SOLE late
    supplier on finished multi-supplier orders.  EXISTS → LEFT SEMI,
    NOT EXISTS → LEFT ANTI, both hash joins on l_orderkey with the
    supplier-inequality as a residual — never a per-row subquery.
    The late set is computed once and reused for both the driving
    side and the anti side (one lineitem⋈orders shuffle; Spark reuses
    the exchange).  At 100 TB the F-status + 60-day filters cut the
    late set to a few percent of lineitem before any self-join."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("interval 60 days")
        )
        .select("l_orderkey", "l_suppkey")
    )
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    l1 = late.alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = late.alias("l3")
    has_other = (F.col("l2.l_orderkey") == F.col("l1.l_orderkey")) & (
        F.col("l2.l_suppkey") != F.col("l1.l_suppkey")
    )
    other_late = (F.col("l3.l_orderkey") == F.col("l1.l_orderkey")) & (
        F.col("l3.l_suppkey") != F.col("l1.l_suppkey")
    )
    return (
        l1.join(l2, has_other, "left_semi")
        .join(l3, other_late, "left_anti")
        .join(F.broadcast(supplier), F.col("l1.l_suppkey") == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
