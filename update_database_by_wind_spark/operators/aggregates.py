"""Aggregation operators (SURVEY.md §2.4 A1–A10).

All hash aggregates: Spark plans partial (map-side) + final aggregation
automatically, so a groupBy on (l_returnflag, l_linestatus) over 100 TB
shuffles only 6 partially-aggregated rows per map task — the shuffle is
O(groups × tasks), not O(rows).  Money sums use the decimal-exact
helpers in functions/numeric.py so results are order-independent
(identical under any partitioning — see that module's docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from update_database_by_wind_spark.functions.numeric import (
    dec_avg,
    dec_corr,
    dec_stddev_samp,
    dec_sum,
    dec_var_samp,
    sql_dec_avg,
    sql_dec_corr,
    sql_dec_stddev_samp,
    sql_dec_sum,
    sql_dec_var_samp,
)
from update_database_by_wind_spark.functions.ranks import with_global_ranks
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
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity", "sum_qty"),
            dec_sum("l_extendedprice", "sum_base_price"),
            dec_sum("l_extendedprice * (1 - l_discount)", "sum_disc_price"),
            dec_sum(
                "l_extendedprice * (1 - l_discount) * (1 + l_tax)",
                "sum_charge",
            ),
            dec_avg("l_quantity", "avg_qty"),
            dec_avg("l_extendedprice", "avg_price"),
            dec_avg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- A2: exact distinct counts ----------------------------------------

_A2_ORACLE = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(DISTINCT CAST(date_trunc('day', ts) AS DATE)) AS n_days,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
"""


@query("a2_distinct_counts", oracle=_A2_ORACLE, tags=("agg",))
def a2_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: exact COUNT DISTINCT (expands to two-phase agg in Spark)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(
            F.date_trunc("day", F.col("ts")).cast("date")
        ).alias("n_days"),
        F.count("*").alias("n_events"),
    )


# --- A3: approximate distinct (HLL) — bracket-checked against exact ------

_A3_ORACLE = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS within_bounds
FROM events
GROUP BY event_type
"""


@query("a3_approx_distinct", oracle=_A3_ORACLE, tags=("agg", "approx"))
def a3_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: approx_count_distinct (HyperLogLog++) — the 100 TB path for
    cardinality; constant memory per group vs exact distinct's shuffle
    of every distinct value.  The sketch value is engine-specific, but
    its ERROR BOUND is not: with rsd=0.01 the estimate must land within
    a generous 10·rsd of the exact count, so the query emits that
    bracket check as a boolean and the oracle asserts TRUE per group —
    the same rows-only→guarantee upgrade a9b uses for percentiles."""
    ev = load(spark, sf_dir, "events")
    rsd = 0.01
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_users"),
        (
            (
                F.abs(
                    F.approx_count_distinct("user_id", rsd)
                    - F.countDistinct("user_id")
                )
                / F.countDistinct("user_id")
            )
            <= 10 * rsd
        ).alias("within_bounds"),
    )


# --- A4: rollup with grouping flags -------------------------------------

_A4_ORACLE = f"""
SELECT COALESCE(r_name, 'ALL') AS region_name,
       COALESCE(n_name, 'ALL') AS nation_name,
       CAST(GROUPING(r_name) AS INTEGER) AS g_region,
       CAST(GROUPING(n_name) AS INTEGER) AS g_nation,
       {sql_dec_sum('c_acctbal', 'total_balance')},
       COUNT(*) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
"""


@query("a4_rollup_balances", oracle=_A4_ORACLE, tags=("agg",))
def a4_rollup_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: ROLLUP subtotals + GROUPING flags (Expand operator — each
    input row fans out once per grouping set, still one shuffle)."""
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    joined = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.grouping("r_name").cast("int").alias("g_region"),
            F.grouping("n_name").cast("int").alias("g_nation"),
            dec_sum("c_acctbal", "total_balance"),
            F.count("*").alias("n_customers"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "g_region",
            "g_nation",
            "total_balance",
            "n_customers",
        )
    )


# --- A5: conditional aggregation (FILTER / CASE) -------------------------

_A5_ORACLE = f"""
SELECT l_returnflag,
       {sql_dec_sum("CASE WHEN l_quantity > 30 THEN l_extendedprice ELSE 0 END",
                    'bulk_revenue')},
       CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_discounted,
       CAST(COUNT(CASE WHEN l_tax = 0 THEN 1 END) AS BIGINT) AS n_taxfree
FROM lineitem
GROUP BY l_returnflag
"""


@query("a5_conditional_agg", oracle=_A5_ORACLE, tags=("agg",))
def a5_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: aggregate over CASE-filtered inputs (one pass, no self-joins)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        dec_sum(
            F.when(F.col("l_quantity") > 30, F.col("l_extendedprice")).otherwise(
                0.0
            ),
            "bulk_revenue",
        ),
        F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0))
        .cast("long")
        .alias("n_discounted"),
        F.count(F.when(F.col("l_tax") == 0, 1)).alias("n_taxfree"),
    )


# --- A6: collect_list / collect_set (sorted for determinism) -------------

_A6_ORACLE = """
SELECT r_name,
       array_to_string(list_sort(list(n_name)), ',') AS nations,
       CAST(LEN(list(n_name)) AS INTEGER) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


@query("a6_collect_sorted_lists", oracle=_A6_ORACLE, tags=("agg", "array"))
def a6_collect_sorted_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: array-building aggregate; sort_array makes the value
    deterministic under any partitioning."""
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations"),
            F.size(F.collect_list("n_name")).alias("n_nations"),
        )
    )


# --- A7: pivot (long → wide, the reference's date × code layout) ---------

_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]

_A7_ORACLE = f"""
SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
       {', '.join(sql_dec_sum(f"CASE WHEN c_mktsegment = '{s}' THEN o_totalprice END", f"rev_{s}") for s in _SEGMENTS)}
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY year(o_orderdate)
"""


@query("a7_pivot_segment_revenue", oracle=_A7_ORACLE, tags=("agg", "pivot"))
def a7_pivot_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: pivot long→wide (year × segment) — the reference category's
    wide (date × code) Wind layout (SURVEY.md §1.1).  Pivot values are
    declared explicitly so the plan needs no discovery pass."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    out = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .pivot("c_mktsegment", _SEGMENTS)
        .agg(dec_sum("o_totalprice", "rev"))
    )
    renames = {s: f"rev_{s}" for s in _SEGMENTS}
    return out.select(
        "order_year", *[F.col(s).alias(a) for s, a in renames.items()]
    )


# --- A8: unpivot (wide → long) --------------------------------------------

_A8_ORACLE = f"""
WITH wide AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
         {sql_dec_sum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END", 'rev_F')},
         {sql_dec_sum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END", 'rev_O')},
         {sql_dec_sum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END", 'rev_P')}
  FROM orders GROUP BY year(o_orderdate)
)
SELECT order_year, status, revenue
FROM wide UNPIVOT INCLUDE NULLS (revenue FOR status IN (rev_F AS 'F', rev_O AS 'O', rev_P AS 'P'))
"""


@query("a8_unpivot_status_revenue", oracle=_A8_ORACLE, tags=("agg", "pivot"))
def a8_unpivot_status_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: unpivot wide→long (inverse of A7; the reference's melt)."""
    orders = load(spark, sf_dir, "orders")
    wide = orders.groupBy(
        F.year("o_orderdate").cast("int").alias("order_year")
    ).agg(
        dec_sum(
            F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")), "rev_F"
        ),
        dec_sum(
            F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice")), "rev_O"
        ),
        dec_sum(
            F.when(F.col("o_orderstatus") == "P", F.col("o_totalprice")), "rev_P"
        ),
    )
    return wide.unpivot(
        ids=["order_year"],
        values=["rev_F", "rev_O", "rev_P"],
        variableColumnName="status",
        valueColumnName="revenue",
    ).withColumn("status", F.substring("status", 5, 1))


# --- A9: exact percentiles / median ----------------------------------------

_A9_ORACLE = """
SELECT o_orderpriority,
       median(o_totalprice) AS med_price,
       quantile_cont(o_totalprice, 0.25) AS p25,
       quantile_cont(o_totalprice, 0.75) AS p75,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price
FROM orders
GROUP BY o_orderpriority
"""


@query("a9_percentiles", oracle=_A9_ORACLE, tags=("agg",))
def a9_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: exact median / interpolated percentiles per group."""
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.median("o_totalprice").alias("med_price"),
        F.percentile("o_totalprice", F.lit(0.25)).alias("p25"),
        F.percentile("o_totalprice", F.lit(0.75)).alias("p75"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


# --- A10: second-moment statistics ------------------------------------------

_A10_ORACLE = f"""
SELECT l_returnflag,
       {sql_dec_stddev_samp('l_extendedprice', 'sd_price')},
       {sql_dec_var_samp('l_quantity', 'var_qty')},
       {sql_dec_corr('l_quantity', 'l_extendedprice', 'corr_qty_price')}
FROM lineitem
GROUP BY l_returnflag
"""


@query("a10_moment_statistics", oracle=_A10_ORACLE, tags=("agg",))
def a10_moment_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: stddev/variance/correlation via exact decimal power sums —
    order-independent, unlike the built-in streaming moment aggregates
    (see functions/numeric.py docstring)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        dec_stddev_samp("l_extendedprice", "sd_price"),
        dec_var_samp("l_quantity", "var_qty"),
        dec_corr("l_quantity", "l_extendedprice", "corr_qty_price"),
    )


# --- A4c: explicit GROUPING SETS through the SQL surface ----------------------

_A4C_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price,
       CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                        (o_orderstatus), (o_orderpriority))
"""


@query("a4c_grouping_sets", oracle=_A4C_ORACLE, tags=("agg", "sql"))
def a4c_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4c: explicit GROUPING SETS — three hand-picked sets including
    a non-hierarchical one ((priority) alone), which neither rollup
    (a4) nor cube (a4b) expresses without waste.  Issued through
    ``spark.sql`` over a temp view to exercise the SQL entry surface;
    Catalyst plans the same single Expand + one-shuffle aggregate as
    the DataFrame variants.  GROUPING() flags disambiguate real NULLs
    from subtotal rows."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
                 AS total_price,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_priority
        FROM gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), (o_orderpriority))
        """
    )


# --- A11: geometric mean via rounded-ln decimal sums ---------------------------

_A11_ORACLE = """
SELECT c_mktsegment,
       ROUND(EXP(CAST(SUM(CAST(LN(o_totalprice) AS DECIMAL(38,6))) AS DOUBLE)
                 / COUNT(*)), 4) AS geo_mean_price,
       COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_totalprice > 0
GROUP BY c_mktsegment
"""


@query("a11_geometric_mean", oracle=_A11_ORACLE, tags=("agg", "math"))
def a11_geometric_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: geometric mean = exp(mean(ln x)) — the multiplicative
    average for skewed money amounts.  Per-row ln values are rounded
    into DECIMAL(38,6) before summation (same ln-then-round discipline
    as the TF-IDF operator) so the sum is order-independent and
    engine-identical; the final exp is rounded to 4 decimals to absorb
    last-ulp libm differences."""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    customer = load(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.round(
                F.exp(
                    F.sum(
                        F.log("o_totalprice").cast("decimal(38,6)")
                    ).cast("double")
                    / F.count("*")
                ),
                4,
            ).alias("geo_mean_price"),
            F.count("*").alias("n_orders"),
        )
    )


# --- A12: mode (most frequent value) with deterministic tie-break ---------------

_A12_ORACLE = """
WITH counts AS (
  SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT c_mktsegment, o_orderpriority, n,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY n DESC, o_orderpriority) AS rn
  FROM counts
)
SELECT c_mktsegment, o_orderpriority AS mode_priority, n AS mode_count
FROM ranked WHERE rn = 1
"""


@query("a12_mode_per_group", oracle=_A12_ORACLE, tags=("agg",))
def a12_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: per-group mode — spelled out as count + row_number rather
    than a mode() builtin because builtins break ties arbitrarily;
    the explicit lexicographic tie-break makes the answer identical on
    every engine and every partitioning."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    counts = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("n").desc(), F.col("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_mktsegment",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").alias("mode_count"),
        )
    )


# --- A13: equi-width histogram ---------------------------------------------------

_A13_ORACLE = """
WITH bounds AS (
  SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders
),
bucketed AS (
  SELECT CAST(LEAST(COALESCE(FLOOR((o_totalprice - lo)
                             / NULLIF((hi - lo) / 20.0, 0)), 0), 19)
              AS BIGINT) AS bucket,
         lo, hi
  FROM orders CROSS JOIN bounds
)
SELECT bucket,
       COUNT(*) AS n_orders,
       lo + bucket * ((hi - lo) / 20.0) AS bucket_lo,
       lo + (bucket + 1) * ((hi - lo) / 20.0) AS bucket_hi
FROM bucketed
GROUP BY bucket, lo, hi
"""


@query("a13_histogram_equiwidth", oracle=_A13_ORACLE, tags=("agg", "histogram"))
def a13_histogram_equiwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13: 20-bucket equi-width histogram of order value — the data-
    profiling pass before choosing partition bounds or salting
    thresholds.  Bounds come from one scalar aggregate broadcast to
    the scan (crossJoin of a 1-row frame, the scalar-subquery plan);
    bucket edges are pure double arithmetic on identical inputs, so
    both engines bin identically.  The max value clamps into the last
    bucket (LEAST) instead of opening a 21st."""
    orders = load(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    # NULLIF+COALESCE: a single-distinct-value table has width 0 — all
    # rows land in bucket 0 instead of an ANSI divide-by-zero
    width = (F.col("hi") - F.col("lo")) / 20.0
    bucket = F.least(
        F.coalesce(
            F.floor(
                (F.col("o_totalprice") - F.col("lo"))
                / F.nullif(width, F.lit(0.0))
            ),
            F.lit(0).cast("bigint"),
        ),
        F.lit(19).cast("bigint"),
    ).cast("long")
    return (
        orders.crossJoin(F.broadcast(bounds))
        .select(bucket.alias("bucket"), "lo", "hi")
        .groupBy("bucket", "lo", "hi")
        .agg(F.count("*").alias("n_orders"))
        .select(
            "bucket",
            "n_orders",
            (F.col("lo") + F.col("bucket") * width).alias("bucket_lo"),
            (F.col("lo") + (F.col("bucket") + 1) * width).alias("bucket_hi"),
        )
    )


# --- A14: KMV bottom-k distinct sketch (mergeable, exactly replayable) ----------

# Portable uniformizing hash over the key domain: reduce mod the prime
# FIRST (int64-safe product), multiply, reduce mod the prime.  The
# final modulus IS the prime here, so no second reduction is needed —
# the low-bits degeneracy (operators/training.py) only bites when the
# last modulus is a small divisor-sharing number like 8 or 100.
_KMV_P = 1_000_003
_KMV_A = 2246822519
_KMV_K = 64
# (k-1) * P as one exact double constant, so both engines evaluate the
# estimator as a single division with no association ambiguity
_KMV_NUM = float((_KMV_K - 1) * _KMV_P)

_A14_ORACLE = f"""
WITH keyed AS (
  SELECT o_orderkey,
         ((o_custkey % {_KMV_P}) * {_KMV_A}) % {_KMV_P} AS h
  FROM orders
),
full_sk AS (SELECT DISTINCT h FROM keyed ORDER BY h LIMIT {_KMV_K}),
h0 AS (SELECT DISTINCT h FROM keyed WHERE o_orderkey % 2 = 0
       ORDER BY h LIMIT {_KMV_K}),
h1 AS (SELECT DISTINCT h FROM keyed WHERE o_orderkey % 2 = 1
       ORDER BY h LIMIT {_KMV_K}),
merged AS (
  SELECT DISTINCT h
  FROM (SELECT h FROM h0 UNION ALL SELECT h FROM h1)
  ORDER BY h LIMIT {_KMV_K}
),
f AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sk,
             CAST(MAX(h) AS BIGINT) AS kth,
             CAST(SUM(h) AS BIGINT) AS s FROM full_sk),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sk,
             CAST(MAX(h) AS BIGINT) AS kth,
             CAST(SUM(h) AS BIGINT) AS s FROM merged),
t AS (SELECT CAST(COUNT(DISTINCT h) AS BIGINT) AS true_distinct FROM keyed),
e AS (
  SELECT n_sk, kth, s,
         CASE WHEN n_sk < {_KMV_K} THEN CAST(n_sk AS DOUBLE)
              ELSE ROUND({_KMV_NUM!r} / kth, 6) END AS est
  FROM f
)
SELECT e.n_sk AS sketch_size,
       e.kth AS kth_hash,
       e.est AS est_distinct,
       t.true_distinct,
       ROUND(ABS(e.est - t.true_distinct)
             / NULLIF(CAST(t.true_distinct AS DOUBLE), 0), 6) AS rel_err,
       (e.n_sk = m.n_sk
        AND COALESCE(e.kth, -1) = COALESCE(m.kth, -1)
        AND COALESCE(e.s, -1) = COALESCE(m.s, -1)) AS merge_ok
FROM e, m, t
"""


@query("a14_kmv_sketch", oracle=_A14_ORACLE, tags=("agg", "sketch", "approx"))
def a14_kmv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14: KMV (k-minimum-values / bottom-k) distinct sketch over the
    order customer keys — a MERGEABLE cardinality sketch whose every
    number is exactly replayable, unlike HLL (a3's bracket check).
    The sketch is the k=64 smallest distinct values of a portable
    uniformizing hash; the estimator is the classic KMV
    (k-1)·P / h_(k); and the row carries the receipt that makes it
    trustworthy at 100 TB:

    * ``merge_ok`` — the corpus is split into two shards (odd/even
      order keys, so the same customer appears in both), each shard
      sketched independently, the two sketches merged (union →
      bottom-k), and the merged sketch proven IDENTICAL to the
      from-scratch sketch (size + k-th value + exact sum).  This is
      U9's merge ≡ recompute contract applied to a sketch — the
      property that lets 1000 executors sketch locally and combine,
      and lets yesterday's sketch absorb today's delta without a
      rescan.  (Mathematically exact for KMV: every member of the
      whole's bottom-k is in its shard's bottom-k.)
    * ``est_distinct`` / ``true_distinct`` / ``rel_err`` — the
      estimator against the exact answer, computable at fixture scale
      (the exact leg is the receipt, not the production path).

    Scale shape: the sketch is distinct(hash) + TakeOrdered(k) — one
    map-side-combined dedup shuffle of 8-byte hashes and a k-row heap
    per partition; nothing key-sized ever concentrates.  When the
    sketch has fewer than k values the exact count IS the sketch size
    (the standard KMV small-set convention), which the generated-
    corpus fuzz exercises."""
    orders = load(spark, sf_dir, "orders")
    h = ((F.col("o_custkey") % _KMV_P) * F.lit(_KMV_A)) % _KMV_P
    keyed = orders.select("o_orderkey", h.alias("h"))

    def sk(df: DataFrame) -> DataFrame:
        return df.select("h").distinct().orderBy("h").limit(_KMV_K)

    def stats(s: DataFrame, pfx: str) -> DataFrame:
        return s.agg(
            F.count("*").cast("long").alias(f"{pfx}_n"),
            F.max("h").cast("long").alias(f"{pfx}_kth"),
            F.sum("h").cast("long").alias(f"{pfx}_s"),
        )

    full_stats = stats(sk(keyed), "f")
    merged = sk(
        sk(keyed.filter(F.col("o_orderkey") % 2 == 0)).unionAll(
            sk(keyed.filter(F.col("o_orderkey") % 2 == 1))
        )
    )
    merged_stats = stats(merged, "m")
    true_d = keyed.agg(
        F.countDistinct("h").cast("long").alias("true_distinct")
    )
    est = F.when(
        F.col("f_n") < _KMV_K, F.col("f_n").cast("double")
    ).otherwise(F.round(F.lit(_KMV_NUM) / F.col("f_kth"), 6))
    merge_ok = (
        (F.col("f_n") == F.col("m_n"))
        & (F.coalesce("f_kth", F.lit(-1)) == F.coalesce("m_kth", F.lit(-1)))
        & (F.coalesce("f_s", F.lit(-1)) == F.coalesce("m_s", F.lit(-1)))
    )
    return (
        full_stats.crossJoin(F.broadcast(merged_stats))
        .crossJoin(F.broadcast(true_d))
        .select(
            F.col("f_n").alias("sketch_size"),
            F.col("f_kth").alias("kth_hash"),
            est.alias("est_distinct"),
            "true_distinct",
            F.round(
                F.abs(est - F.col("true_distinct"))
                / F.nullif(F.col("true_distinct").cast("double"), F.lit(0.0)),
                6,
            ).alias("rel_err"),
            merge_ok.alias("merge_ok"),
        )
    )


# --- A15: distributed heavy hitters (Misra-Gries candidates + exact pass) ------

# An item qualifies as a heavy hitter when it holds MORE than 1/_HH_K of
# all rows.  The candidate pass keeps _HH_C counters per partition;
# Misra-Gries guarantees every item with local frequency > n_p/(C+1)
# survives, and by pigeonhole a global heavy hitter (> n/K) exceeds
# n_p/K in at least one partition, so C + 1 > K ⇒ the candidate union
# is a superset of the true heavy hitters.  C is deliberately > K.
# K = 140 sits just above the fixture's mean user frequency (events
# spread over ~n/67 users, measured counts 49-86 at sf0.01), so the
# cut actually SPLITS the population (41 of 150 qualify) instead of
# passing everyone or no one — the machinery is identical for the
# classic skewed case.
_HH_K = 140
_HH_C = 191


def _mg_update(mg, counts, c: int):
    """Merge one batch's ``value_counts`` into a bounded Misra-Gries
    summary of at most ``c`` counters (the batched MG decrement: when
    the merge exceeds c counters, subtract the (c+1)-th largest count
    from every counter and drop the non-positive ones — at least c+1
    counters lose the full cut each round, so total decrements are
    ≤ n/(c+1) and any item with frequency > n/(c+1) survives).
    Property-tested against the exact superset guarantee in
    tests/test_properties.py."""
    mg = counts if mg is None else mg.add(counts, fill_value=0)
    if len(mg) > c:
        cut = mg.nlargest(c + 1).iloc[-1]
        mg = mg[mg > cut] - cut
    return mg

_A15_ORACLE = f"""
SELECT user_id, COUNT(*) AS n_events
FROM events
GROUP BY user_id
HAVING COUNT(*) * {_HH_K} > (SELECT COUNT(*) FROM events)
"""


@query("a15_heavy_hitters", oracle=_A15_ORACLE, tags=("agg", "sketch"))
def a15_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15: frequent-item detection at shuffle-free candidate cost —
    every user holding > 1/140 of all events, with EXACT counts.

    Two passes, the standard scale shape for heavy hitters over data
    too large to group-by exactly when the key space is huge:

    1. **Candidate pass** (no shuffle): a bounded Misra-Gries summary
       per partition via ``mapInPandas`` — per Arrow batch,
       ``value_counts`` merges into the running summary, and whenever
       it exceeds ``_HH_C`` counters the (C+1)-th largest count is
       subtracted from every counter and non-positive ones dropped
       (the batched MG decrement: each subtraction round removes at
       least (C+1)·t of total mass, so any item's undercount is at
       most n_p/(C+1)).  Memory is O(C) per partition regardless of
       key cardinality; only candidate KEYS leave the executor.
    2. **Exact pass**: the candidate union (≤ C × partitions rows) is
       broadcast into a semi-join, and only candidates are counted
       exactly — the groupBy shuffles a few hundred partially-
       aggregated rows, not the key universe.

    The threshold compare is exact integer (``n·140 > total``), and
    the final crossJoin is the 1-row broadcast scalar plan.  MG alone
    gives count estimates with additive error; the exact second pass
    is what makes the output hash-checkable against the plain GROUP
    BY/HAVING oracle."""
    import pandas as pd

    events = load(spark, sf_dir, "events")

    def mg_candidates(batches):
        mg = None
        for pdf in batches:
            mg = _mg_update(mg, pdf["user_id"].value_counts(), _HH_C)
        if mg is not None and len(mg):
            yield pd.DataFrame({"user_id": mg.index.to_numpy()})

    cand = (
        events.select("user_id")
        .mapInPandas(mg_candidates, "user_id long")
        .distinct()
    )
    total = events.agg(F.count("*").alias("_total"))
    return (
        events.join(F.broadcast(cand), "user_id", "left_semi")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n_events") * _HH_K > F.col("_total"))
        .select("user_id", "n_events")
    )


# --- A16: mergeable fixed-boundary quantile sketch ------------------------------

# Histogram-CDF sketch over integer cents.  The bin boundaries are
# FIXED by construction (bin = cents DIV 2^14), independent of the
# data, which is what makes the sketch mergeable by plain counter
# addition: 1000 executors histogram locally, shards combine by
# summing bins, yesterday's sketch absorbs today's delta without a
# rescan — the same contract as a14's KMV but for quantiles.  The
# power-of-two width keeps the bin id one exact integer division in
# both engines (no float, no midpoint traps), and bounds the absolute
# quantile error at one bin width ($163.84) by construction.
_QSK_W = 16384  # 2^14 cents per bin
_QSK_PCTS = (25, 50, 75, 90, 99)

_A16_ORACLE = f"""
WITH c AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         o_orderkey
  FROM orders
),
hist AS (
  SELECT cents // {_QSK_W} AS bin, COUNT(*) AS cnt FROM c GROUP BY 1
),
h0 AS (
  SELECT cents // {_QSK_W} AS bin, COUNT(*) AS cnt FROM c
  WHERE o_orderkey % 2 = 0 GROUP BY 1
),
h1 AS (
  SELECT cents // {_QSK_W} AS bin, COUNT(*) AS cnt FROM c
  WHERE o_orderkey % 2 = 1 GROUP BY 1
),
merged AS (
  SELECT bin, SUM(cnt) AS cnt
  FROM (SELECT * FROM h0 UNION ALL SELECT * FROM h1) GROUP BY bin
),
fs AS (SELECT CAST(COUNT(*) AS BIGINT) AS nb, CAST(SUM(cnt) AS BIGINT) AS n,
              CAST(SUM(bin * cnt) AS BIGINT) AS chk FROM hist),
ms AS (SELECT CAST(COUNT(*) AS BIGINT) AS nb, CAST(SUM(cnt) AS BIGINT) AS n,
              CAST(SUM(bin * cnt) AS BIGINT) AS chk FROM merged),
ranks AS (
  SELECT pct, (pct * fs.n + 99) // 100 AS r
  FROM (VALUES {", ".join(f"({p})" for p in _QSK_PCTS)}) t(pct), fs
),
cum AS (SELECT bin, SUM(cnt) OVER (ORDER BY bin) AS cum FROM hist),
sel AS (
  SELECT ranks.pct, ranks.r, MIN(cum.bin) AS bin
  FROM ranks JOIN cum ON cum.cum >= ranks.r
  GROUP BY ranks.pct, ranks.r
),
ordered AS (
  SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rn FROM c
),
ex AS (SELECT sel.pct, MIN(ordered.cents) AS exact_cents
       FROM sel JOIN ordered ON ordered.rn = sel.r GROUP BY sel.pct)
SELECT CAST(sel.pct AS INTEGER) AS pct,
       CAST(sel.r AS BIGINT) AS rank_r,
       CAST(sel.bin AS BIGINT) AS bin,
       CAST(sel.bin * {_QSK_W} AS BIGINT) AS lo_cents,
       CAST((sel.bin + 1) * {_QSK_W} - 1 AS BIGINT) AS hi_cents,
       CAST(ex.exact_cents AS BIGINT) AS exact_cents,
       ex.exact_cents BETWEEN sel.bin * {_QSK_W}
           AND (sel.bin + 1) * {_QSK_W} - 1 AS within_bound,
       (fs.nb = ms.nb AND fs.n = ms.n AND fs.chk = ms.chk) AS merge_ok
FROM sel JOIN ex ON ex.pct = sel.pct, fs, ms
"""


@query(
    "a16_quantile_sketch",
    oracle=_A16_ORACLE,
    tags=("agg", "sketch", "approx"),
)
def a16_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16: mergeable quantile sketch — a fixed-boundary histogram CDF
    over order totals in integer cents, the percentile companion to
    a14's mergeable cardinality sketch.  Per requested percentile the
    row carries the full receipt:

    * ``bin`` / ``lo_cents`` / ``hi_cents`` — the sketch's answer: the
      first bin whose cumulative count reaches the target rank, and
      the value bracket it implies (error ≤ one bin width by
      construction, no data-dependent tuning);
    * ``exact_cents`` + ``within_bound`` — the true order statistic at
      the SAME integer rank, proven to land inside the bracket (the
      a9b/l3b recall-guarantee pattern: the oracle asserts the bound,
      not just the estimate).  The exact leg is the fixture-scale
      receipt, not the production path;
    * ``merge_ok`` — the corpus split odd/even by order key, each
      shard histogrammed independently, merged by bin-wise counter
      addition, and the merged sketch proven IDENTICAL to the
      from-scratch one (bin count + total + Σ bin·cnt checksum) —
      U9's merge ≡ recompute contract, which is what makes the
      sketch shard-parallel and delta-absorbing at 100 TB.

    Every number is integer-exact: cents via the decimal cast, bin ids
    by ``DIV 2^14``, and ranks by ``(pct·n + 99) DIV 100`` — the
    integer form of ceil(q·n).  The float form is a measured parity
    trap: 0.9 × 15000 evaluates to 13500.000000000002 in IEEE double
    (ceil → 13501) while a decimal engine gets exactly 13500, so no
    float q ever appears on either side.

    Scale shape: ONE map-side-combined groupBy on ~3.7k bin ids per
    shard; the CDF walk and rank selection run on sketch-sized data
    (single-partition window over the histogram — thousands of rows
    by construction, never data-sized)."""
    orders = load(spark, sf_dir, "orders")
    c = orders.select(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
        "o_orderkey",
    )
    binned = c.withColumn("bin", F.expr(f"cents DIV {_QSK_W}"))

    def hist(df: DataFrame) -> DataFrame:
        return df.groupBy("bin").agg(F.count("*").alias("cnt"))

    def stats(h: DataFrame, pfx: str) -> DataFrame:
        return h.agg(
            F.count("*").cast("long").alias(f"{pfx}_nb"),
            F.sum("cnt").cast("long").alias(f"{pfx}_n"),
            F.sum(F.col("bin") * F.col("cnt"))
            .cast("long")
            .alias(f"{pfx}_chk"),
        )

    full_h = hist(binned)
    merged_h = (
        hist(binned.filter(F.col("o_orderkey") % 2 == 0))
        .unionByName(hist(binned.filter(F.col("o_orderkey") % 2 == 1)))
        .groupBy("bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    fs = stats(full_h, "f")
    ms = stats(merged_h, "m")

    pcts = spark.createDataFrame([(p,) for p in _QSK_PCTS], "pct int")
    ranks = pcts.crossJoin(F.broadcast(fs.select("f_n"))).select(
        "pct", F.expr("(pct * f_n + 99) DIV 100").alias("r")
    )
    cum = full_h.withColumn(
        "cum",
        F.sum("cnt").over(
            Window.orderBy("bin").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    sel = (
        ranks.join(cum, cum["cum"] >= ranks["r"])
        .groupBy("pct", "r")
        .agg(F.min("bin").alias("bin"))
    )
    # exact order statistics via the DISTRIBUTED rank (round-12: the
    # old row_number here was the repo's last data-sized unpartitioned
    # window — rank+filter<=k sites compile to TakeOrderedAndProject,
    # but this joins on data-dependent ranks, so no limit pushdown
    # could save it).  Ties order by the unique orderkey; the value at
    # a given rank is tie-insensitive either way.
    ordered, _n_rows = with_global_ranks(
        c, [{"value": "cents", "key": "o_orderkey", "rank": "rn"}]
    )
    # broadcast the 5-row rank selection into the ordered scan — the
    # default plan sort-merge-joined the DATA-sized side on rn
    ex = (
        ordered.join(F.broadcast(sel), ordered["rn"] == sel["r"])
        .groupBy("pct")
        .agg(F.min("cents").alias("exact_cents"))
    )
    merge_ok = (
        (F.col("f_nb") == F.col("m_nb"))
        & (F.col("f_n") == F.col("m_n"))
        & (F.col("f_chk") == F.col("m_chk"))
    )
    return (
        sel.join(F.broadcast(ex), "pct")
        .crossJoin(F.broadcast(fs))
        .crossJoin(F.broadcast(ms))
        .select(
            "pct",
            F.col("r").alias("rank_r"),
            "bin",
            (F.col("bin") * _QSK_W).alias("lo_cents"),
            ((F.col("bin") + 1) * _QSK_W - 1).alias("hi_cents"),
            "exact_cents",
            F.col("exact_cents").between(
                F.col("bin") * _QSK_W, (F.col("bin") + 1) * _QSK_W - 1
            ).alias("within_bound"),
            merge_ok.alias("merge_ok"),
        )
    )


_A16B_ORACLE = f"""
WITH c AS (
  SELECT o_orderstatus AS grp,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         o_orderkey
  FROM orders
),
hist AS (
  SELECT grp, cents // {_QSK_W} AS bin, COUNT(*) AS cnt
  FROM c GROUP BY 1, 2
),
h0 AS (
  SELECT grp, cents // {_QSK_W} AS bin, COUNT(*) AS cnt FROM c
  WHERE o_orderkey % 2 = 0 GROUP BY 1, 2
),
h1 AS (
  SELECT grp, cents // {_QSK_W} AS bin, COUNT(*) AS cnt FROM c
  WHERE o_orderkey % 2 = 1 GROUP BY 1, 2
),
merged AS (
  SELECT grp, bin, SUM(cnt) AS cnt
  FROM (SELECT * FROM h0 UNION ALL SELECT * FROM h1) GROUP BY grp, bin
),
cmp AS (
  SELECT COALESCE(f.grp, m.grp) AS grp,
         BOOL_AND(f.cnt IS NOT NULL AND m.cnt IS NOT NULL
                  AND f.cnt = m.cnt) AS merge_ok
  FROM hist f FULL OUTER JOIN merged m
    ON f.grp = m.grp AND f.bin = m.bin
  GROUP BY 1
),
totals AS (SELECT grp, SUM(cnt) AS n FROM hist GROUP BY 1),
ranks AS (
  SELECT totals.grp, pct, (pct * totals.n + 99) // 100 AS r
  FROM (VALUES {", ".join(f"({p})" for p in _QSK_PCTS)}) t(pct), totals
),
cum AS (
  SELECT grp, bin,
         SUM(cnt) OVER (PARTITION BY grp ORDER BY bin) AS cum
  FROM hist
),
sel AS (
  SELECT ranks.grp, ranks.pct, ranks.r, MIN(cum.bin) AS bin
  FROM ranks JOIN cum ON cum.grp = ranks.grp AND cum.cum >= ranks.r
  GROUP BY 1, 2, 3
),
ordered AS (
  SELECT grp, cents,
         ROW_NUMBER() OVER (PARTITION BY grp ORDER BY cents) AS rn
  FROM c
),
ex AS (
  SELECT sel.grp, sel.pct, MIN(ordered.cents) AS exact_cents
  FROM sel JOIN ordered ON ordered.grp = sel.grp AND ordered.rn = sel.r
  GROUP BY 1, 2
)
SELECT sel.grp AS o_orderstatus,
       CAST(sel.pct AS INTEGER) AS pct,
       CAST(sel.r AS BIGINT) AS rank_r,
       CAST(sel.bin AS BIGINT) AS bin,
       CAST(sel.bin * {_QSK_W} AS BIGINT) AS lo_cents,
       CAST((sel.bin + 1) * {_QSK_W} - 1 AS BIGINT) AS hi_cents,
       CAST(ex.exact_cents AS BIGINT) AS exact_cents,
       ex.exact_cents BETWEEN sel.bin * {_QSK_W}
           AND (sel.bin + 1) * {_QSK_W} - 1 AS within_bound,
       cmp.merge_ok
FROM sel
JOIN ex ON ex.grp = sel.grp AND ex.pct = sel.pct
JOIN cmp ON cmp.grp = sel.grp
"""


@query(
    "a16b_grouped_quantile_sketch",
    oracle=_A16B_ORACLE,
    tags=("agg", "sketch", "approx"),
)
def a16b_grouped_quantile_sketch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """A16b: the mergeable quantile sketch PER GROUP — percentiles of
    order value by order status, the shape production sketching jobs
    actually run (p99 latency per service, spend percentiles per
    segment).  Same fixed power-of-two bin boundaries as a16, so each
    group's histogram merges by counter addition independently;
    ``merge_ok`` here is proven per group and STRICTER than a16's
    (the odd/even shard merge must equal the from-scratch histogram
    bin-for-bin through a full-outer compare, not just in summary
    stats).  Ranks are the same integer form (pct·n_g + 99) DIV 100
    over each group's own count, the bracket law is per group, and
    the exact order statistic comes from a row_number window
    partitioned by group — which at scale is ONE hash shuffle on the
    group key, strictly cheaper than a16's global-sort receipt leg.

    Scale shape: the histogram aggregation is map-side combined on
    (group, bin) — cardinality |groups| × ~3.7k bins — and every
    downstream step (CDF window, rank join, bracket) runs on
    sketch-sized data partitioned by group.  1000 executors sketch
    locally, shards combine per group, and adding a group never
    re-shuffles another group's data."""
    orders = load(spark, sf_dir, "orders")
    c = orders.select(
        F.col("o_orderstatus").alias("grp"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
        "o_orderkey",
    )
    binned = c.withColumn("bin", F.expr(f"cents DIV {_QSK_W}"))

    def hist(df: DataFrame) -> DataFrame:
        return df.groupBy("grp", "bin").agg(F.count("*").alias("cnt"))

    full_h = hist(binned)
    merged_h = (
        hist(binned.filter(F.col("o_orderkey") % 2 == 0))
        .unionByName(hist(binned.filter(F.col("o_orderkey") % 2 == 1)))
        .groupBy("grp", "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    # bin-for-bin merge ≡ recompute per group via full-outer compare
    mh = merged_h.select(
        F.col("grp").alias("m_grp"),
        F.col("bin").alias("m_bin"),
        F.col("cnt").alias("m_cnt"),
    )
    cmp = (
        full_h.join(
            mh,
            (F.col("grp") == F.col("m_grp"))
            & (F.col("bin") == F.col("m_bin")),
            "full_outer",
        )
        .groupBy(F.coalesce("grp", "m_grp").alias("grp"))
        .agg(
            F.min(
                F.col("cnt").isNotNull()
                & F.col("m_cnt").isNotNull()
                & (F.col("cnt") == F.col("m_cnt"))
            ).alias("merge_ok")
        )
    )
    totals = full_h.groupBy("grp").agg(F.sum("cnt").alias("n"))
    pcts = spark.createDataFrame([(p,) for p in _QSK_PCTS], "pct int")
    ranks = totals.crossJoin(F.broadcast(pcts)).select(
        "grp", "pct", F.expr("(pct * n + 99) DIV 100").alias("r")
    )
    cum = full_h.withColumn(
        "cum",
        F.sum("cnt").over(
            Window.partitionBy("grp")
            .orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).select(F.col("grp").alias("c_grp"), "bin", "cum")
    sel = (
        ranks.join(
            F.broadcast(cum),
            (F.col("c_grp") == F.col("grp")) & (F.col("cum") >= F.col("r")),
        )
        .groupBy("grp", "pct", "r")
        .agg(F.min("bin").alias("bin"))
    )
    ordered = c.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("grp").orderBy("cents")),
    ).select(F.col("grp").alias("o_grp"), "cents", "rn")
    ex = (
        ordered.join(
            F.broadcast(sel),
            (F.col("o_grp") == F.col("grp")) & (F.col("rn") == F.col("r")),
        )
        .groupBy("grp", "pct")
        .agg(F.min("cents").alias("exact_cents"))
    )
    return (
        sel.join(F.broadcast(ex), ["grp", "pct"])
        .join(F.broadcast(cmp), "grp")
        .select(
            F.col("grp").alias("o_orderstatus"),
            "pct",
            F.col("r").alias("rank_r"),
            "bin",
            (F.col("bin") * _QSK_W).alias("lo_cents"),
            ((F.col("bin") + 1) * _QSK_W - 1).alias("hi_cents"),
            "exact_cents",
            F.col("exact_cents").between(
                F.col("bin") * _QSK_W, (F.col("bin") + 1) * _QSK_W - 1
            ).alias("within_bound"),
            "merge_ok",
        )
    )


# --- A17: count-min sketch (mergeable frequency estimates, portable hashes) ----

# d=3 hash rows of width 64.  Each row's hash is the KMV-style portable
# uniformizer ((k % P) * A_j) % P, reduced mod P BETWEEN the multiply
# and the small width modulus (the round-6 lesson: without the middle
# reduction, (k * A) % W is a bijection of k's low bits and the three
# "independent" rows collapse into one).  The max intermediate,
# (P-1)·max(A) ≈ 3.27e15 < 2^52, stays under both the int64 range and
# the 2^53 double mantissa, so the arithmetic replays exactly in any
# engine with 64-bit (or exact-double) integers.
_CMS_P = 1_000_003
_CMS_W = 64
_CMS_A = (2654435761, 2246822519, 3266489917)


def _cms_bucket_sql(j: int, key: str) -> str:
    return f"((({key} % {_CMS_P}) * {_CMS_A[j]}) % {_CMS_P}) % {_CMS_W}"


_A17_ORACLE = f"""
WITH ev AS (SELECT event_id, user_id AS k FROM events),
b AS (
  SELECT 0 AS j, {_cms_bucket_sql(0, 'k')} AS b, event_id FROM ev
  UNION ALL
  SELECT 1 AS j, {_cms_bucket_sql(1, 'k')} AS b, event_id FROM ev
  UNION ALL
  SELECT 2 AS j, {_cms_bucket_sql(2, 'k')} AS b, event_id FROM ev
),
counters AS (SELECT j, b, COUNT(*) AS c FROM b GROUP BY j, b),
sharded AS (
  SELECT j, b, event_id % 2 AS sh, COUNT(*) AS c FROM b GROUP BY j, b, sh
),
resum AS (SELECT j, b, SUM(c) AS c FROM sharded GROUP BY j, b),
mrg AS (
  SELECT (COUNT(*) = SUM(CASE WHEN counters.c = resum.c THEN 1 ELSE 0 END))
           AS merge_ok
  FROM counters JOIN resum USING (j, b)
),
exact AS (SELECT k, COUNT(*) AS exact_cnt FROM ev GROUP BY k),
probes AS (
  SELECT * FROM (
    SELECT k, exact_cnt,
           CAST(ROW_NUMBER() OVER (ORDER BY exact_cnt DESC, k) AS BIGINT)
             AS rn
    FROM exact
  ) WHERE rn <= 12
),
pb AS (
  SELECT k, exact_cnt, rn, 0 AS j, {_cms_bucket_sql(0, 'k')} AS b FROM probes
  UNION ALL
  SELECT k, exact_cnt, rn, 1 AS j, {_cms_bucket_sql(1, 'k')} AS b FROM probes
  UNION ALL
  SELECT k, exact_cnt, rn, 2 AS j, {_cms_bucket_sql(2, 'k')} AS b FROM probes
),
est AS (
  SELECT k, exact_cnt, rn, MIN(c) AS cms_est
  FROM pb JOIN counters USING (j, b)
  GROUP BY k, exact_cnt, rn
)
SELECT est.k AS user_id,
       est.exact_cnt,
       est.cms_est,
       est.cms_est - est.exact_cnt AS overcount,
       est.rn,
       mrg.merge_ok
FROM est, mrg
ORDER BY est.rn
"""


@query("a17_countmin_sketch", oracle=_A17_ORACLE, tags=("agg", "sketch", "approx"))
def a17_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A17: count-min sketch over event user frequencies — the
    MERGEABLE point-frequency estimator that completes the sketch
    family (a3/a14 cardinality, a15 heavy hitters, a16 quantiles):
    d=3 counter rows of width 64, estimate = min over rows of the
    hashed bucket's counter.  Every number is exact integer
    arithmetic, so unlike library CMS implementations the whole
    sketch replays cell-exactly in the oracle.

    In-row receipts:

    * ``merge_ok`` — the corpus is split into two shards (odd/even
      event ids), each shard's counter table built independently, the
      shards summed counter-by-counter, and the merged table proven
      identical to the from-scratch counters.  CMS merge IS counter
      addition, the property that lets every executor sketch its
      partition and combine — and lets yesterday's sketch absorb
      today's delta without a rescan.
    * ``overcount = cms_est - exact_cnt`` per probed key — CMS never
      undercounts (every occurrence of k lands in k's buckets), and
      the deliberately narrow width (150 users into 64 buckets)
      makes collisions real so the receipt shows genuine positive
      overcounts being cut by the min over rows, not a trivial
      zero column.

    Scale shape: the counter build is one explode to (row, bucket)
    pairs — 3 narrow rows per event — feeding a groupBy that
    map-side-combines into at most d*W = 192 groups; the probe-side
    estimate joins those 192 rows broadcast.  Nothing key-cardinality-
    sized ever shuffles, which is the entire point of a sketch at
    100 TB."""
    ev = load(spark, sf_dir, "events").select("event_id", "user_id")

    def bucket_arr(key: str):
        """ONE statement of the d-row hash on the DataFrame side (its
        SQL twin is _cms_bucket_sql) — the probe leg reuses it so the
        estimate can never probe a different hash than the counters
        were built with."""
        return F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"),
                    (
                        ((F.col(key) % _CMS_P) * _CMS_A[j])
                        % _CMS_P
                        % _CMS_W
                    ).alias("b"),
                )
                for j in range(3)
            ]
        )

    bk = ev.select("event_id", F.explode(bucket_arr("user_id")).alias("jb")).select(
        "event_id", F.col("jb.j").alias("j"), F.col("jb.b").alias("b")
    )
    counters = bk.groupBy("j", "b").agg(F.count("*").alias("c"))
    resum = (
        bk.withColumn("sh", F.col("event_id") % 2)
        .groupBy("j", "b", "sh")
        .agg(F.count("*").alias("c"))
        .groupBy("j", "b")
        .agg(F.sum("c").alias("c2"))
    )
    mrg = (
        counters.join(resum, ["j", "b"])
        .agg(
            (
                F.count("*")
                == F.sum(
                    F.when(F.col("c") == F.col("c2"), 1).otherwise(0)
                )
            ).alias("merge_ok")
        )
    )
    exact = ev.groupBy(F.col("user_id").alias("k")).agg(
        F.count("*").cast("long").alias("exact_cnt")
    )
    w = Window.orderBy(F.col("exact_cnt").desc(), F.col("k"))
    probes = (
        exact.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 12)
    )
    pb = probes.select(
        "k",
        "exact_cnt",
        "rn",
        F.explode(bucket_arr("k")).alias("jb"),
    ).select("k", "exact_cnt", "rn", F.col("jb.j").alias("j"), F.col("jb.b").alias("b"))
    est = (
        pb.join(F.broadcast(counters), ["j", "b"])
        .groupBy("k", "exact_cnt", "rn")
        .agg(F.min("c").cast("long").alias("cms_est"))
    )
    return (
        est.crossJoin(F.broadcast(mrg))
        .select(
            F.col("k").alias("user_id"),
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).alias("overcount"),
            "rn",
            "merge_ok",
        )
        .orderBy("rn")
    )


# --- A18: HyperLogLog sketch (portable integer registers) ----------------------

# A single multiplicative hash mod P maps consecutive keys to an
# arithmetic progression mod P — equidistributed (fine for BUCKETING,
# which the CMS/KMV family uses) but far too regular for a
# max-leading-zeros statistic: measured on consecutive custkeys it
# biased the estimate +93%.  Composing two multiplies is still one
# multiply (A1*A2 mod P), so the nonlinearity comes from XOR-mixing
# two independent multiplicative hashes, then one xorshift fold —
# both exactly expressible in Spark (bitwiseXOR/DIV) and DuckDB
# (xor()/'//').  The big prime sits BETWEEN the multiply and every
# small modulus (low-bits degeneracy pitfall), and the field split is
# low 6 bits -> register index, remaining 25-bit word -> rank.
# Measured bias on consecutive keys at n = 150..1.5M: within ±21%
# (sigma for m=64 registers is 1.04/8 ~ 13%).
_HLL_P = 2147483647
_HLL_A1 = 2654435761
_HLL_A2 = 2246822519
_HLL_M = 64
_HLL_B = 25


def _hll_mix_sql(key: str) -> str:
    h1 = f"((({key} % {_HLL_P}) * {_HLL_A1}) % {_HLL_P})"
    h2 = f"((({key} % {_HLL_P}) * {_HLL_A2}) % {_HLL_P})"
    return f"xor({h1}, {h2})"


_A18_ORACLE = f"""
WITH k AS (SELECT o_orderkey, o_custkey AS k FROM orders),
hx AS (SELECT o_orderkey, {_hll_mix_sql('k')} AS hx FROM k),
h AS (SELECT o_orderkey, xor(hx, hx // 8192) AS h FROM hx),
rb AS (SELECT o_orderkey, h % {_HLL_M} AS b, h // {_HLL_M} AS w FROM h),
rr AS (
  SELECT o_orderkey, b,
         CASE WHEN w = 0 THEN {_HLL_B + 1}
              ELSE {_HLL_B} + 1 - LENGTH(BIN(w)) END AS rho
  FROM rb
),
regs AS (SELECT b, MAX(rho) AS register FROM rr GROUP BY b),
spine AS (SELECT CAST(range AS BIGINT) AS b FROM range({_HLL_M})),
full_regs AS (
  SELECT s.b, COALESCE(r.register, 0) AS register
  FROM spine s LEFT JOIN regs r ON s.b = r.b
),
sharded AS (
  SELECT o_orderkey % 2 AS sh, b, MAX(rho) AS register
  FROM rr GROUP BY sh, b
),
merged AS (SELECT b, MAX(register) AS register FROM sharded GROUP BY b),
mrg AS (
  SELECT (COUNT(*) = SUM(CASE WHEN m.register = r.register
                              THEN 1 ELSE 0 END)) AS merge_ok
  FROM regs r JOIN merged m USING (b)
),
s AS (
  SELECT CAST(SUM(1 << ({_HLL_B + 1} - register)) AS BIGINT) AS s_scaled
  FROM full_regs
),
ex AS (SELECT COUNT(DISTINCT k) AS exact_distinct FROM k),
est AS (
  -- DECIMAL-literal trap: DuckDB types 0.709 / 134217728.0 as DECIMAL,
  -- so every float operand is CAST AS DOUBLE to replay Spark's two
  -- IEEE ops (int-exact division, then one multiply) bit-for-bit
  SELECT s_scaled,
         CAST(0.709 AS DOUBLE)
           * (CAST({_HLL_M * _HLL_M * 2 ** (_HLL_B + 1)} AS DOUBLE)
                / s_scaled) AS hll_est
  FROM s
)
SELECT f.b, CAST(f.register AS BIGINT) AS register,
       ex.exact_distinct, est.s_scaled, est.hll_est,
       (ABS(est.hll_est - ex.exact_distinct) * CAST(100 AS DOUBLE)
          <= CAST(30 AS DOUBLE) * ex.exact_distinct) AS within_30pct,
       mrg.merge_ok
FROM full_regs f, ex, est, mrg
ORDER BY f.b
"""


@query("a18_hll_sketch", oracle=_A18_ORACLE, tags=("agg", "sketch", "approx"))
def a18_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A18: HyperLogLog — the canonical distributed-cardinality sketch,
    completing the mergeable-sketch family (a14 KMV cardinality, a15
    Misra-Gries heavy hitters, a16 quantiles, a17 count-min
    frequencies).  a3 already exposes Spark's built-in
    approx_count_distinct (itself HLL++); this is the PORTABLE
    re-derivation whose 64 registers replay cell-exactly in the
    oracle, so the driver hash-checks the sketch state itself, not
    just a tolerance band.

    Portability (every known parity trap dodged by construction):

    * the rank input is the XOR-mix of two independent multiplicative
      hashes plus one xorshift fold (a single multiplicative hash maps
      consecutive keys to an arithmetic progression — measured +93%
      bias on the max-leading-zeros statistic; see the constants'
      comment), each reduced mod the big prime BETWEEN the multiply
      and the small modulus (low-bits pitfall), then split — low
      6 bits select the register, the remaining 25-bit word feeds the
      rank;
    * rank rho = leading zeros + 1, computed as
      ``B + 1 - LENGTH(BIN(w))`` — ``bin()`` is the shortest binary
      string in BOTH engines, so no log2/libm call anywhere;
    * the harmonic denominator is the EXACT integer
      ``S = SUM(2^(26 - register))`` (max 64 * 2^26, no rounding, no
      float-sum order dependence across partitions);
    * the estimate alpha_64 * m^2 * 2^26 / S is two IEEE ops on
      identical operands (one division of exact integers, one multiply
      by the same 0.709 literal) — correctly rounded in both engines.

    In-row receipts: ``merge_ok`` rebuilds the registers from two
    row-level shards and proves bucketwise-MAX merge equals the
    from-scratch sketch (HLL merge IS register max — every executor
    sketches its partition, the driver folds 64 longs); and
    ``within_30pct`` records whether the estimate landed inside 2.3
    standard errors (1.04/sqrt(64) ≈ 13%) of the exact count.  The
    ``exact_distinct`` column is the fixture-scale audit leg — at
    100 TB only the 64-long register state and the estimate survive;
    duplicates never shuffle at all (the register build map-side
    combines into at most 64 groups per row of the d=1 sketch).
    """
    k = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("k")
    )
    h = k.withColumn(
        "hx",
        (((F.col("k") % _HLL_P) * _HLL_A1) % _HLL_P).bitwiseXOR(
            ((F.col("k") % _HLL_P) * _HLL_A2) % _HLL_P
        ),
    ).withColumn(
        "h", F.col("hx").bitwiseXOR(F.expr("hx DIV 8192"))
    )
    rr = h.select(
        "o_orderkey",
        (F.col("h") % _HLL_M).alias("b"),
        F.expr(f"h DIV {_HLL_M}").alias("w"),
    ).withColumn(
        "rho",
        F.when(F.col("w") == 0, F.lit(_HLL_B + 1)).otherwise(
            F.lit(_HLL_B + 1) - F.length(F.bin("w"))
        ),
    )
    regs = rr.groupBy("b").agg(F.max("rho").alias("register"))
    spine = spark.range(_HLL_M).select(F.col("id").alias("b"))
    full_regs = spine.join(regs, "b", "left").select(
        "b", F.coalesce("register", F.lit(0)).alias("register")
    )
    merged = (
        rr.withColumn("sh", F.col("o_orderkey") % 2)
        .groupBy("sh", "b")
        .agg(F.max("rho").alias("register"))
        .groupBy("b")
        .agg(F.max("register").alias("register2"))
    )
    mrg = regs.join(merged, "b").agg(
        (
            F.count("*")
            == F.sum(
                F.when(F.col("register") == F.col("register2"), 1).otherwise(0)
            )
        ).alias("merge_ok")
    )
    s = full_regs.agg(
        F.sum(F.expr(f"shiftleft(1L, {_HLL_B + 1} - register)"))
        .cast("long")
        .alias("s_scaled")
    )
    ex = k.agg(F.countDistinct("k").alias("exact_distinct"))
    est = s.select(
        "s_scaled",
        (
            F.lit(0.709)
            * (
                F.lit(float(_HLL_M * _HLL_M * 2 ** (_HLL_B + 1)))
                / F.col("s_scaled")
            )
        ).alias("hll_est"),
    )
    return (
        full_regs.crossJoin(F.broadcast(ex))
        .crossJoin(F.broadcast(est))
        .crossJoin(F.broadcast(mrg))
        .select(
            "b",
            F.col("register").cast("long").alias("register"),
            "exact_distinct",
            "s_scaled",
            "hll_est",
            (
                F.abs(F.col("hll_est") - F.col("exact_distinct")) * 100.0
                <= 30.0 * F.col("exact_distinct")
            ).alias("within_30pct"),
            "merge_ok",
        )
        .orderBy("b")
    )


# --- A19: grouped HyperLogLog (the partial-aggregate form) ---------------------

_A19_ORACLE = f"""
WITH k AS (
  SELECT o_orderkey, o_orderpriority AS grp, o_custkey AS k FROM orders
),
hx AS (SELECT o_orderkey, grp, {_hll_mix_sql('k')} AS hx, k FROM k),
h AS (SELECT o_orderkey, grp, xor(hx, hx // 8192) AS h, k FROM hx),
rr AS (
  SELECT o_orderkey, grp, k, h % {_HLL_M} AS b,
         CASE WHEN h // {_HLL_M} = 0 THEN {_HLL_B + 1}
              ELSE {_HLL_B} + 1 - LENGTH(BIN(h // {_HLL_M})) END AS rho
  FROM h
),
regs AS (SELECT grp, b, MAX(rho) AS register FROM rr GROUP BY grp, b),
spine AS (
  SELECT g.grp, CAST(r.range AS BIGINT) AS b
  FROM (SELECT DISTINCT grp FROM k) g, range({_HLL_M}) r
),
full_regs AS (
  SELECT s.grp, s.b, COALESCE(r.register, 0) AS register
  FROM spine s LEFT JOIN regs r ON s.grp = r.grp AND s.b = r.b
),
sharded AS (
  SELECT o_orderkey % 2 AS sh, grp, b, MAX(rho) AS register
  FROM rr GROUP BY sh, grp, b
),
merged AS (
  SELECT grp, b, MAX(register) AS register FROM sharded GROUP BY grp, b
),
mrg AS (
  SELECT (COUNT(*) = SUM(CASE WHEN m.register = r.register
                              THEN 1 ELSE 0 END)) AS merge_ok
  FROM regs r JOIN merged m ON r.grp = m.grp AND r.b = m.b
),
s AS (
  SELECT grp,
         CAST(SUM(1 << ({_HLL_B + 1} - register)) AS BIGINT) AS s_scaled
  FROM full_regs GROUP BY grp
),
ex AS (SELECT grp, COUNT(DISTINCT k) AS exact_distinct FROM k GROUP BY grp),
est AS (
  SELECT grp, s_scaled,
         CAST(0.709 AS DOUBLE)
           * (CAST({_HLL_M * _HLL_M * 2 ** (_HLL_B + 1)} AS DOUBLE)
                / s_scaled) AS hll_est
  FROM s
)
SELECT f.grp, f.b, CAST(f.register AS BIGINT) AS register,
       ex.exact_distinct, est.s_scaled, est.hll_est,
       (ABS(est.hll_est - ex.exact_distinct) * CAST(100 AS DOUBLE)
          <= CAST(30 AS DOUBLE) * ex.exact_distinct) AS within_30pct,
       mrg.merge_ok
FROM full_regs f
JOIN ex ON f.grp = ex.grp
JOIN est ON f.grp = est.grp
CROSS JOIN mrg
ORDER BY f.grp, f.b
"""


@query("a19_grouped_hll", oracle=_A19_ORACLE, tags=("agg", "sketch", "approx"))
def a19_grouped_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A19: per-group HyperLogLog — distinct customers per order
    priority, the grouped twin of a18 exactly as a16b is to a16.  This
    is the form that matters operationally: ``COUNT(DISTINCT key)
    GROUP BY dim`` is the single most shuffle-hostile everyday query
    at 100 TB (every (dim, key) pair must co-locate), while the sketch
    form reduces each group to 64 longs.

    Scale shape — the partial-aggregate contract: the register build
    is ``groupBy(grp, bucket).agg(MAX(rho))``, which map-side combines
    to at most |groups| * 64 rows per task BEFORE the exchange; the
    shuffle moves sketch state, never keys.  That is the shape an
    ``approx_count_distinct`` partial aggregate has inside Spark —
    re-derived here portably so the oracle hash-checks all
    |groups| * 64 register cells, the per-group estimates, and the
    shard-merge receipt (bucketwise MAX within each group).  Hash,
    rank, scaled harmonic sum, and the two-IEEE-op estimate are
    exactly a18's (see its docstring for the parity ledger); the
    ``exact_distinct`` comparison column is the fixture-scale audit
    leg."""
    k = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("grp"),
        F.col("o_custkey").alias("k"),
    )
    rr = (
        k.withColumn(
            "hx",
            (((F.col("k") % _HLL_P) * _HLL_A1) % _HLL_P).bitwiseXOR(
                ((F.col("k") % _HLL_P) * _HLL_A2) % _HLL_P
            ),
        )
        .withColumn("h", F.col("hx").bitwiseXOR(F.expr("hx DIV 8192")))
        .select(
            "o_orderkey",
            "grp",
            "k",
            (F.col("h") % _HLL_M).alias("b"),
            F.expr(f"h DIV {_HLL_M}").alias("w"),
        )
        .withColumn(
            "rho",
            F.when(F.col("w") == 0, F.lit(_HLL_B + 1)).otherwise(
                F.lit(_HLL_B + 1) - F.length(F.bin("w"))
            ),
        )
    )
    regs = rr.groupBy("grp", "b").agg(F.max("rho").alias("register"))
    spine = (
        k.select("grp")
        .distinct()
        .crossJoin(spark.range(_HLL_M).select(F.col("id").alias("b")))
    )
    full_regs = spine.join(regs, ["grp", "b"], "left").select(
        "grp", "b", F.coalesce("register", F.lit(0)).alias("register")
    )
    merged = (
        rr.withColumn("sh", F.col("o_orderkey") % 2)
        .groupBy("sh", "grp", "b")
        .agg(F.max("rho").alias("register"))
        .groupBy("grp", "b")
        .agg(F.max("register").alias("register2"))
    )
    mrg = regs.join(merged, ["grp", "b"]).agg(
        (
            F.count("*")
            == F.sum(
                F.when(
                    F.col("register") == F.col("register2"), 1
                ).otherwise(0)
            )
        ).alias("merge_ok")
    )
    s = full_regs.groupBy("grp").agg(
        F.sum(F.expr(f"shiftleft(1L, {_HLL_B + 1} - register)"))
        .cast("long")
        .alias("s_scaled")
    )
    ex = k.groupBy("grp").agg(F.countDistinct("k").alias("exact_distinct"))
    est = s.select(
        "grp",
        "s_scaled",
        (
            F.lit(0.709)
            * (
                F.lit(float(_HLL_M * _HLL_M * 2 ** (_HLL_B + 1)))
                / F.col("s_scaled")
            )
        ).alias("hll_est"),
    )
    return (
        full_regs.join(F.broadcast(ex), "grp")
        .join(F.broadcast(est), "grp")
        .crossJoin(F.broadcast(mrg))
        .select(
            "grp",
            "b",
            F.col("register").cast("long").alias("register"),
            "exact_distinct",
            "s_scaled",
            "hll_est",
            (
                F.abs(F.col("hll_est") - F.col("exact_distinct")) * 100.0
                <= 30.0 * F.col("exact_distinct")
            ).alias("within_30pct"),
            "merge_ok",
        )
        .orderBy("grp", "b")
    )


# --- A20: theta-sketch set algebra over KMV state ------------------------------

_A20_ORACLE = f"""
WITH keyed AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
         ((o_custkey % {_KMV_P}) * {_KMV_A}) % {_KMV_P} AS h,
         o_custkey
  FROM orders WHERE year(o_orderdate) IN (1996, 1997)
),
skx AS (SELECT DISTINCT h FROM keyed WHERE yr = 1996
        ORDER BY h LIMIT {_KMV_K}),
sky AS (SELECT DISTINCT h FROM keyed WHERE yr = 1997
        ORDER BY h LIMIT {_KMV_K}),
thx AS (SELECT CASE WHEN COUNT(*) < {_KMV_K} THEN {_KMV_P}
                    ELSE MAX(h) END AS th FROM skx),
thy AS (SELECT CASE WHEN COUNT(*) < {_KMV_K} THEN {_KMV_P}
                    ELSE MAX(h) END AS th FROM sky),
theta AS (
  SELECT CAST(CASE WHEN thx.th < thy.th THEN thx.th ELSE thy.th END
              AS BIGINT) AS th
  FROM thx, thy
),
ic AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS inter_cnt
  FROM skx JOIN sky USING (h), theta WHERE h < th
),
uc AS (
  SELECT CAST(COUNT(DISTINCT h) AS BIGINT) AS union_cnt
  FROM (SELECT h FROM skx UNION ALL SELECT h FROM sky), theta
  WHERE h < th
),
xc AS (SELECT CAST(COUNT(*) AS BIGINT) AS x_cnt FROM skx, theta
       WHERE h < th),
yc AS (SELECT CAST(COUNT(*) AS BIGINT) AS y_cnt FROM sky, theta
       WHERE h < th),
exact AS (
  SELECT
    CAST(COUNT(DISTINCT CASE WHEN in_x AND in_y THEN o_custkey END)
         AS BIGINT) AS exact_inter,
    CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_union
  FROM (
    SELECT o_custkey,
           BOOL_OR(yr = 1996) AS in_x, BOOL_OR(yr = 1997) AS in_y
    FROM keyed GROUP BY o_custkey
  )
)
SELECT theta.th AS theta,
       xc.x_cnt, yc.y_cnt, ic.inter_cnt, uc.union_cnt,
       (uc.union_cnt = xc.x_cnt + yc.y_cnt - ic.inter_cnt) AS ie_ok,
       ROUND(CAST(ic.inter_cnt * {_KMV_P} AS DOUBLE) / theta.th, 6)
         AS est_inter,
       ROUND(CAST(uc.union_cnt * {_KMV_P} AS DOUBLE) / theta.th, 6)
         AS est_union,
       exact.exact_inter, exact.exact_union
FROM theta, ic, uc, xc, yc, exact
"""


@query("a20_kmv_set_algebra", oracle=_A20_ORACLE, tags=("agg", "sketch", "approx"))
def a20_kmv_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A20: set-operation cardinalities from SKETCH STATE — the theta
    algebra over a14's KMV sketches: customers active in 1996 (X) vs
    1997 (Y), with |X ∩ Y| and |X ∪ Y| estimated purely from the two
    64-value bottom-k sketches.  a14 proves one sketch merges; this is
    the reason sketch FAMILIES matter operationally: retention /
    overlap / churn questions between any pair of cohorts become
    arithmetic over per-cohort sketch state — no revisit of the data,
    no co-location of the key sets.

    The theta trick (the Datasketches theta-sketch contract): clamp
    both sketches to theta = min(theta_X, theta_Y) (a sketch smaller
    than k is exact, its theta is the full hash range P); below theta
    each sketch IS a uniform P/theta-rate sample of its distinct set,
    so ``count * P / theta`` estimates any set expression evaluated on
    the clamped sketches.  In-row receipts:

    * ``ie_ok`` — inclusion-exclusion holds EXACTLY on the clamped
      integer counts (union_cnt = x_cnt + y_cnt − inter_cnt): the
      estimates are consistent by construction, not just
      approximately, because all four share one theta;
    * ``exact_inter`` / ``exact_union`` — the fixture-scale audit legs
      (distinct custkeys per cohort membership), against which the
      estimates land within the KMV error envelope.

    Every number before the two final ROUND(x/theta, 6) estimates is
    exact integer arithmetic; the division mirrors a14's estimator
    form.  Scale shape: each sketch is distinct(hash) + TakeOrdered(k)
    (8-byte shuffle, k-row heaps); the set algebra itself touches
    2k = 128 rows."""
    keyed = (
        load(spark, sf_dir, "orders")
        .withColumn("yr", F.year("o_orderdate"))
        .filter(F.col("yr").isin(1996, 1997))
        .select(
            "yr",
            "o_custkey",
            (((F.col("o_custkey") % _KMV_P) * _KMV_A) % _KMV_P).alias("h"),
        )
    )

    def sk(yr: int) -> DataFrame:
        return (
            keyed.filter(F.col("yr") == yr)
            .select("h")
            .distinct()
            .orderBy("h")
            .limit(_KMV_K)
        )

    skx, sky = sk(1996), sk(1997)

    def th(s: DataFrame, name: str) -> DataFrame:
        return s.agg(
            F.when(F.count("*") < _KMV_K, F.lit(_KMV_P))
            .otherwise(F.max("h"))
            .cast("long")
            .alias(name)
        )

    theta = (
        th(skx, "thx")
        .crossJoin(th(sky, "thy"))
        .select(F.least("thx", "thy").alias("th"))
    )
    ic = (
        skx.join(sky, "h")
        .crossJoin(F.broadcast(theta))
        .filter(F.col("h") < F.col("th"))
        .agg(F.count("*").cast("long").alias("inter_cnt"))
    )
    uc = (
        skx.unionAll(sky)
        .distinct()
        .crossJoin(F.broadcast(theta))
        .filter(F.col("h") < F.col("th"))
        .agg(F.count("*").cast("long").alias("union_cnt"))
    )

    def clamped(s: DataFrame, name: str) -> DataFrame:
        return (
            s.crossJoin(F.broadcast(theta))
            .filter(F.col("h") < F.col("th"))
            .agg(F.count("*").cast("long").alias(name))
        )

    exact = (
        keyed.groupBy("o_custkey")
        .agg(
            F.max((F.col("yr") == 1996).cast("int")).alias("in_x"),
            F.max((F.col("yr") == 1997).cast("int")).alias("in_y"),
        )
        .agg(
            F.sum(
                ((F.col("in_x") == 1) & (F.col("in_y") == 1)).cast("long")
            ).alias("exact_inter"),
            F.count("*").cast("long").alias("exact_union"),
        )
    )
    return (
        theta.crossJoin(F.broadcast(clamped(skx, "x_cnt")))
        .crossJoin(F.broadcast(clamped(sky, "y_cnt")))
        .crossJoin(F.broadcast(ic))
        .crossJoin(F.broadcast(uc))
        .crossJoin(F.broadcast(exact))
        .select(
            F.col("th").alias("theta"),
            "x_cnt",
            "y_cnt",
            "inter_cnt",
            "union_cnt",
            (
                F.col("union_cnt")
                == F.col("x_cnt") + F.col("y_cnt") - F.col("inter_cnt")
            ).alias("ie_ok"),
            F.round(
                (F.col("inter_cnt") * _KMV_P).cast("double") / F.col("th"), 6
            ).alias("est_inter"),
            F.round(
                (F.col("union_cnt") * _KMV_P).cast("double") / F.col("th"), 6
            ).alias("est_union"),
            "exact_inter",
            "exact_union",
        )
    )
