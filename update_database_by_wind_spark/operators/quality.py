"""Data-quality audit operators — the checks an update pipeline runs
before publishing a sync (SURVEY.md §2.9 adjacency: governance over
the same star schema the namesake pipeline maintains).

Scale notes: every audit is anti-join- or aggregate-shaped — one
column-pruned scan per table, shuffles carry keys or tiny profiles,
no driver-side iteration — so the audits run unchanged over a 100 TB
estate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from update_database_by_wind_spark.registry import query
from update_database_by_wind_spark.sources import load

# --- referential-integrity audit -----------------------------------------------

_DQ_RI_ORACLE = """
SELECT 'lineitem->orders' AS fk, COUNT(*) AS n_orphans
FROM lineitem l WHERE NOT EXISTS
  (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'lineitem->part' AS fk, COUNT(*) AS n_orphans
FROM lineitem l WHERE NOT EXISTS
  (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
UNION ALL
SELECT 'lineitem->supplier' AS fk, COUNT(*) AS n_orphans
FROM lineitem l WHERE NOT EXISTS
  (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
UNION ALL
SELECT 'orders->customer' AS fk, COUNT(*) AS n_orphans
FROM orders o WHERE NOT EXISTS
  (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'customer->nation' AS fk, COUNT(*) AS n_orphans
FROM customer c WHERE NOT EXISTS
  (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
"""


@query("dq_referential_integrity", oracle=_DQ_RI_ORACLE, tags=("quality", "audit"))
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts for every FK edge of
    the star schema, each a left-anti join (FIXTURES.md measured 0
    orphans — the audit proves it instead of assuming it).  Dimension
    key sides broadcast; the two fact-side checks share one scan
    each."""

    def orphans(child: DataFrame, ckey: str, parent: DataFrame, pkey: str,
                name: str) -> DataFrame:
        return (
            child.select(F.col(ckey).alias("k"))
            .join(
                F.broadcast(parent.select(F.col(pkey).alias("k"))),
                "k",
                "left_anti",
            )
            .agg(F.count("*").alias("n_orphans"))
            .select(F.lit(name).alias("fk"), "n_orphans")
        )

    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    part = load(spark, sf_dir, "part")
    supplier = load(spark, sf_dir, "supplier")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    checks = [
        orphans(li, "l_orderkey", orders, "o_orderkey", "lineitem->orders"),
        orphans(li, "l_partkey", part, "p_partkey", "lineitem->part"),
        orphans(li, "l_suppkey", supplier, "s_suppkey", "lineitem->supplier"),
        orphans(orders, "o_custkey", customer, "c_custkey", "orders->customer"),
        orphans(customer, "c_nationkey", nation, "n_nationkey", "customer->nation"),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


# --- null / distinct profile ------------------------------------------------------

_DQ_PROFILE_ORACLE = """
SELECT 'o_orderkey' AS col, COUNT(*) AS n_rows,
       CAST(COUNT(o_orderkey) AS BIGINT) AS n_non_null,
       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct
FROM orders
UNION ALL
SELECT 'o_orderstatus', COUNT(*),
       CAST(COUNT(o_orderstatus) AS BIGINT),
       CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT)
FROM orders
UNION ALL
SELECT 'o_orderpriority', COUNT(*),
       CAST(COUNT(o_orderpriority) AS BIGINT),
       CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT)
FROM orders
UNION ALL
SELECT 'o_custkey', COUNT(*),
       CAST(COUNT(o_custkey) AS BIGINT),
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
FROM orders
"""


@query("dq_null_profile", oracle=_DQ_PROFILE_ORACLE, tags=("quality", "profile"))
def dq_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile (rows / non-null / distinct) for the key columns
    of orders — the pre-publish sanity report (a PK whose n_distinct ≠
    n_rows means the sync duplicated keys).  All four profiles come
    from ONE scan: a single multi-aggregate pass, unpivoted to the
    per-column report shape, instead of one pass per column."""
    orders = load(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_orderstatus", "o_orderpriority", "o_custkey"]
    agg = orders.agg(
        F.count("*").alias("n_rows"),
        *[F.count(c).alias(f"nn_{c}") for c in cols],
        *[F.countDistinct(c).alias(f"nd_{c}") for c in cols],
    )
    profiles = [
        agg.select(
            F.lit(c).alias("col"),
            F.col("n_rows"),
            F.col(f"nn_{c}").alias("n_non_null"),
            F.col(f"nd_{c}").alias("n_distinct"),
        )
        for c in cols
    ]
    out = profiles[0]
    for p in profiles[1:]:
        out = out.unionByName(p)
    return out
