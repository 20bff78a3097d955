"""Sorts, limits, set operations (SURVEY.md §2.6 O1–O6).

Scale notes: global top-k uses orderBy+limit, which Spark plans as
TakeOrderedAndProject — each task keeps a k-row heap and only k rows
per task reach the driver, no global sort materialization.  Unions are
by-name (positional unions silently mis-bind when schemas drift).
Distinct/intersect/except are hash-based shuffles on the full row —
at 100 TB prefer dropDuplicates on an explicit key subset (see
dedup operators) so only the key columns shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from update_database_by_wind_spark.functions.ranks import with_global_ranks
from update_database_by_wind_spark.registry import query
from update_database_by_wind_spark.sources import load

# --- O1/O2: global sort + top-k -----------------------------------------

_O2_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice,
       CAST(o_orderdate AS TIMESTAMP_NS) AS o_orderdate
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


@query("o2_global_topk_orders", oracle=_O2_ORACLE, tags=("sort",))
def o2_global_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1+O2: global ordered top-k (TakeOrderedAndProject — no full
    sort materializes).  Unique tiebreak keeps the cut deterministic."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# --- O4: union (by name) ---------------------------------------------------

_O4_ORACLE = """
SELECT kind, COUNT(*) AS n, CAST(COUNT(DISTINCT key) AS BIGINT) AS n_distinct
FROM (
  SELECT 'customer' AS kind, c_custkey AS key FROM customer WHERE c_acctbal > 5000
  UNION ALL
  SELECT 'supplier' AS kind, s_suppkey AS key FROM supplier WHERE s_acctbal > 5000
)
GROUP BY kind
"""


@query("o4_union_high_balance", oracle=_O4_ORACLE, tags=("setop",))
def o4_union_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: unionByName of two per-batch extracts — the reference's
    "stitch per-batch fetches" step (SURVEY.md §0.1 step 2)."""
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    c = customer.filter(F.col("c_acctbal") > 5000).select(
        F.lit("customer").alias("kind"), F.col("c_custkey").alias("key")
    )
    s = supplier.filter(F.col("s_acctbal") > 5000).select(
        F.lit("supplier").alias("kind"), F.col("s_suppkey").alias("key")
    )
    return (
        c.unionByName(s)
        .groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("key").alias("n_distinct"),
        )
    )


# --- O5: intersect / except -------------------------------------------------

_O5_ORACLE = """
SELECT n_nationkey, 'both' AS membership FROM (
  SELECT c_nationkey AS n_nationkey FROM customer
  INTERSECT
  SELECT s_nationkey FROM supplier
)
UNION ALL
SELECT n_nationkey, 'customer_only' AS membership FROM (
  SELECT c_nationkey AS n_nationkey FROM customer
  EXCEPT
  SELECT s_nationkey FROM supplier
)
"""


@query("o5_intersect_except_nations", oracle=_O5_ORACLE, tags=("setop",))
def o5_intersect_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5: INTERSECT / EXCEPT (distinct semantics) — membership diffs,
    the reference's index-constituent comparison (SURVEY.md §2.6)."""
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    c = customer.select(F.col("c_nationkey").alias("n_nationkey"))
    s = supplier.select(F.col("s_nationkey").alias("n_nationkey"))
    both = c.intersect(s).withColumn("membership", F.lit("both"))
    conly = c.subtract(s).withColumn("membership", F.lit("customer_only"))
    return both.unionByName(conly)


# --- O6: distinct / dropDuplicates ------------------------------------------

_O6_ORACLE = """
SELECT DISTINCT l_returnflag, l_linestatus, o_orderstatus
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
"""


@query("o6_distinct_flag_combos", oracle=_O6_ORACLE, tags=("setop",))
def o6_distinct_flag_combos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6: DISTINCT over a projected key set (shuffles only 3 cols)."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select("l_returnflag", "l_linestatus", "o_orderstatus")
        .distinct()
    )


# --- O5b: multiset set ops (INTERSECT ALL / EXCEPT ALL) ---------------------

_O5B_ORACLE = """
WITH b1 AS (
  SELECT l_suppkey, l_returnflag FROM lineitem WHERE l_orderkey % 2 = 0
),
b2 AS (
  SELECT l_suppkey, l_returnflag FROM lineitem WHERE l_orderkey % 3 = 0
)
SELECT 'intersect_all' AS kind, l_returnflag, COUNT(*) AS n_rows
FROM (SELECT * FROM b1 INTERSECT ALL SELECT * FROM b2)
GROUP BY l_returnflag
UNION ALL
SELECT 'except_all' AS kind, l_returnflag, COUNT(*) AS n_rows
FROM (SELECT * FROM b1 EXCEPT ALL SELECT * FROM b2)
GROUP BY l_returnflag
"""


@query("o5b_intersect_except_all", oracle=_O5B_ORACLE, tags=("setop",))
def o5b_intersect_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5b: *multiset* set operations — intersectAll keeps the minimum
    multiplicity per duplicate row, exceptAll subtracts multiplicities
    (the distinct variants in o5 lose duplicate structure, which
    matters when rows legitimately repeat, e.g. repeated (supplier,
    flag) line items).  Both are single hash shuffles on the row."""
    li = load(spark, sf_dir, "lineitem")
    b1 = li.filter(F.col("l_orderkey") % 2 == 0).select("l_suppkey", "l_returnflag")
    b2 = li.filter(F.col("l_orderkey") % 3 == 0).select("l_suppkey", "l_returnflag")
    inter = (
        b1.intersectAll(b2)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_rows"))
        .select(F.lit("intersect_all").alias("kind"), "l_returnflag", "n_rows")
    )
    exc = (
        b1.exceptAll(b2)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_rows"))
        .select(F.lit("except_all").alias("kind"), "l_returnflag", "n_rows")
    )
    return inter.unionByName(exc)


# --- O7: incremental top-k maintenance (top-k is a mergeable monoid) -----------

_O7_K = 15
_O7_CUT = "1997-01-01 00:00:00"

_O7_ORACLE = f"""
SELECT o_orderkey, o_custkey, o_totalprice,
       CAST(ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey)
            AS BIGINT) AS rn
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT {_O7_K}
"""


@query("o7_incremental_topk", oracle=_O7_ORACLE, tags=("sort", "update"))
def o7_incremental_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O7: leaderboard maintenance under appends — the top-k summary
    is a MERGEABLE monoid: topk(A ∪ B) = topk(topk(A) ∪ B), so an
    append batch folds into yesterday's k-row summary without ever
    rescanning history.  The query exercises exactly that path: the
    pre-1997 history is collapsed to its k-row summary FIRST, the
    later orders play the append batch, and the output is
    topk(summary ∪ batch) — while the oracle recomputes top-k from
    the full table, so the hash match IS the monoid proof (a wrong
    summary cut, an off-by-one at the boundary, or a dropped tie
    would mismatch).

    Unique tie-break (price desc, orderkey asc) keeps the cut
    deterministic — without it, equal prices at rank k make the
    result partitioning-dependent and the proof meaningless.

    Scale shape: both topk legs are TakeOrderedAndProject (per-
    partition k-row heaps, merged on one task — no global sort ever
    materializes; the plan assertion lives with o2's in
    tests/test_plans.py), and the maintained leg reads k + |batch|
    rows, independent of history size — the entire point for a
    100 TB fact table absorbing daily appends."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    cut = F.lit(_O7_CUT).cast("timestamp")

    def topk(df: DataFrame) -> DataFrame:
        return df.orderBy(
            F.col("o_totalprice").desc(), F.col("o_orderkey")
        ).limit(_O7_K)

    summary = topk(orders.filter(F.col("o_orderdate") < cut))
    batch = orders.filter(F.col("o_orderdate") >= cut)
    maintained = topk(summary.unionByName(batch))
    from pyspark.sql import Window

    w = Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return maintained.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.row_number().over(w).cast("long").alias("rn"),
    )


# --- O8: revenue-concentration (Pareto) analysis ---------------------------------

_O8_ORACLE = """
WITH pc AS (
  SELECT o_custkey,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
),
tot AS (
  SELECT CAST(SUM(cents) AS BIGINT) AS t,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM pc
),
ranked AS (
  SELECT cents,
         ROW_NUMBER() OVER (ORDER BY cents DESC, o_custkey) AS rn,
         CAST(SUM(cents) OVER (ORDER BY cents DESC, o_custkey
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM pc
),
th AS (SELECT * FROM (VALUES (50), (80), (90)) t(pct))
SELECT CAST(th.pct AS BIGINT) AS pct,
       CAST(MIN(ranked.rn) AS BIGINT) AS k_customers,
       tot.n AS n_customers,
       CAST(MIN(ranked.rn) * 1000000 // tot.n AS BIGINT)
         AS cust_share_ppm,
       tot.t AS total_cents
FROM th, tot, ranked
WHERE ranked.cum * 100 >= th.pct * tot.t
GROUP BY th.pct, tot.n, tot.t
"""


@query("o8_pareto_concentration", oracle=_O8_ORACLE, tags=("analytics",))
def o8_pareto_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O8: revenue concentration — the Pareto question every revenue
    review opens with: how FEW customers cover 50 / 80 / 90% of total
    revenue?  (The "is it an 80/20 business" diagnostic, and the
    whale-risk metric: a tiny ``cust_share_ppm`` at pct=50 means half
    the revenue walks out the door with a handful of accounts.)

    Mechanics: per-customer lifetime cents (decimal-exact), one
    descending running sum with the unique-custkey tiebreak, and for
    each threshold the MINIMUM rank whose cumulative share crosses it
    — the crossing test is the cross-multiplied integer
    ``cum · 100 ≥ pct · total`` (no percentage division anywhere), and
    the reported share is an integer ppm floor division.

    Scale (the round-11 fix): the descending running sum used to be
    ONE unpartitioned window — a single-partition sort at per-customer
    cardinality, the verdict's `weak` plan.  It is now the exact
    distributed rank/running-sum of functions/ranks.py: approx-split
    boundary pass, one per-bucket count+sum pass (whose collected
    offsets also yield the exact totals ``n`` and ``t`` as driver
    literals — the old global-agg leg disappears), then a
    BUCKET-partitioned window plus broadcast prefix offsets.  No
    Exchange SinglePartition in the plan (pinned in
    tests/test_plans.py); the 3-row threshold side stays the declared
    bounded broadcast inequality join.  Oracle unchanged — same
    answers, scalable plan."""
    orders = load(spark, sf_dir, "orders")
    pc = orders.groupBy("o_custkey").agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
        ).alias("cents")
    )
    spec = {
        "value": "cents",
        "key": "o_custkey",
        "rank": "rn",
        "descending": True,
        "cum": ("cents", "cum"),
    }
    # persist the per-customer aggregate: the rank machinery evaluates
    # its input once per pass, and pc's upstream is the full orders
    # scan + shuffle (same rationale and bound as e5's persist; the
    # ownership rule lives in with_global_ranks's docstring)
    pc = pc.persist()
    ranked, n = with_global_ranks(pc, [spec])
    t = spec["total"]
    th = spark.createDataFrame([(50,), (80,), (90,)], "pct long")
    return (
        F.broadcast(th)
        .join(ranked, F.col("cum") * 100 >= F.col("pct") * F.lit(t).cast("long"))
        .groupBy("pct")
        .agg(F.min("rn").alias("k_customers"))
        .select(
            "pct",
            "k_customers",
            F.lit(n).cast("long").alias("n_customers"),
            F.expr(f"k_customers * 1000000 DIV {n}").alias("cust_share_ppm"),
            F.lit(t).cast("long").alias("total_cents"),
        )
    )
