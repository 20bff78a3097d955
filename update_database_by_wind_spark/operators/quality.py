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


# --- DQ3: robust outlier profile (median / MAD, exact integer arithmetic) ------

_DQ3_MULT = 5

_DQ3_ORACLE = f"""
WITH c AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events
),
ranked AS (
  SELECT event_type, cents,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM c
),
med AS (
  SELECT event_type, cents AS median_cents, n
  FROM ranked WHERE rn = (n + 1) // 2
),
dev AS (
  SELECT c.event_type, ABS(c.cents - m.median_cents) AS d
  FROM c JOIN med m ON m.event_type = c.event_type
),
dranked AS (
  SELECT event_type, d,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM dev
),
mad AS (
  SELECT event_type, d AS mad_cents
  FROM dranked WHERE rn = (n + 1) // 2
),
flagged AS (
  SELECT c.event_type,
         CASE WHEN ABS(c.cents - m.median_cents)
                   > {_DQ3_MULT} * x.mad_cents
              THEN 1 ELSE 0 END AS is_outlier
  FROM c
  JOIN med m ON m.event_type = c.event_type
  JOIN mad x ON x.event_type = c.event_type
)
SELECT f.event_type,
       CAST(m.n AS BIGINT) AS n,
       m.median_cents,
       x.mad_cents,
       CAST(SUM(f.is_outlier) AS BIGINT) AS n_outliers,
       CAST(SUM(f.is_outlier) * 1000000 // m.n AS BIGINT) AS outlier_ppm
FROM flagged f
JOIN med m ON m.event_type = f.event_type
JOIN mad x ON x.event_type = f.event_type
GROUP BY f.event_type, m.n, m.median_cents, x.mad_cents
"""


@query("dq3_mad_outliers", oracle=_DQ3_ORACLE, tags=("quality", "audit"))
def dq3_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ3: robust outlier profile per event type — median and MAD
    (median absolute deviation) computed as EXPLICIT order statistics
    in integer cents, then every value beyond 5×MAD flagged.  Mean/
    stddev outlier rules break down exactly when outliers are present
    (the outliers inflate the very scale they are judged against);
    median/MAD has a 50% breakdown point and is the standard audit
    gate for ingest pipelines.

    Exactness discipline: the lower median at integer rank
    ``(n+1) DIV 2`` — never an interpolating MEDIAN()/percentile
    builtin, whose float midpoints diverge across engines (the a16
    lesson); deviations, the 5×MAD threshold and the ppm rate are all
    integer arithmetic, so every cell hash-matches.

    Scale shape: two rank selections per group (each one windowed
    pass partitioned by event_type — the group count is small and
    bounded; a high-cardinality grouping would swap in a16's
    histogram-CDF rank selection instead, same receipts), one
    broadcast join of the 4-row profile back onto the scan for
    flagging, one final map-side-combined aggregation."""
    from pyspark.sql import Window

    c = load(spark, sf_dir, "events").select(
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    wrank = Window.partitionBy("event_type").orderBy("cents")
    wcnt = Window.partitionBy("event_type")
    ranked = c.select(
        "event_type",
        "cents",
        F.row_number().over(wrank).alias("rn"),
        F.count("*").over(wcnt).alias("n"),
    )
    med = ranked.filter(
        F.col("rn") == F.expr("(n + 1) DIV 2")
    ).select(
        "event_type", F.col("cents").alias("median_cents"), "n"
    )
    dev = c.join(F.broadcast(med), "event_type").select(
        "event_type",
        F.abs(F.col("cents") - F.col("median_cents")).alias("d"),
    )
    wdrank = Window.partitionBy("event_type").orderBy("d")
    dranked = dev.select(
        "event_type",
        "d",
        F.row_number().over(wdrank).alias("rn"),
        F.count("*").over(wcnt).alias("dn"),
    )
    mad = dranked.filter(
        F.col("rn") == F.expr("(dn + 1) DIV 2")
    ).select("event_type", F.col("d").alias("mad_cents"))
    return (
        c.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .withColumn(
            "is_outlier",
            (
                F.abs(F.col("cents") - F.col("median_cents"))
                > _DQ3_MULT * F.col("mad_cents")
            ).cast("long"),
        )
        .groupBy("event_type", "n", "median_cents", "mad_cents")
        .agg(F.sum("is_outlier").cast("long").alias("n_outliers"))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            "median_cents",
            "mad_cents",
            "n_outliers",
            F.expr("n_outliers * 1000000 DIV n")
            .cast("long")
            .alias("outlier_ppm"),
        )
    )


# --- DQ4: freshness / completeness audit -----------------------------------------

_DQ4_STALE_US = 6 * 3600 * 1_000_000  # staleness alarm threshold: 6 h

_DQ4_ORACLE = f"""
WITH ev AS (
  SELECT event_type, CAST(epoch_us(ts) AS BIGINT) AS t_us,
         CAST(date_trunc('day', ts) AS DATE) AS d
  FROM events
),
g AS (
  SELECT CAST(MAX(t_us) AS BIGINT) AS g_max,
         CAST(COUNT(DISTINCT d) AS BIGINT) AS g_days
  FROM ev
),
per AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(MAX(t_us) AS BIGINT) AS last_us,
         CAST(COUNT(DISTINCT d) AS BIGINT) AS n_days
  FROM ev GROUP BY event_type
)
SELECT per.event_type, per.n_rows, per.last_us,
       g.g_max - per.last_us AS lag_us,
       g.g_max - per.last_us > {_DQ4_STALE_US} AS stale,
       per.n_days,
       g.g_days - per.n_days AS missing_days,
       per.n_days * 1000000 // g.g_days AS coverage_ppm
FROM per, g
"""


@query("dq4_freshness_audit", oracle=_DQ4_ORACLE, tags=("quality", "audit"))
def dq4_freshness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ4: per-stream freshness + completeness audit — the
    operational monitor an update pipeline runs BETWEEN syncs, next to
    the correctness audits (DQ1 integrity, DQ2 profile, DQ3 outliers):
    for every event type, how far its newest record trails the
    table's global high-water mark (``lag_us``, alarmed at 6 h —
    a silently-stalled upstream feed is the classic late-data
    incident), and what fraction of the table's active days the
    stream covers at all (``coverage_ppm`` / ``missing_days`` — the
    completeness axis: a feed can be fresh yet have holes).

    All integer microseconds and counts — one column-pruned scan,
    one map-side-combinable aggregate per grouping plus a broadcast
    1-row global — nothing here changes shape at 100 TB.  The
    distinct-day counts shuffle (type, day) pairs, bounded by
    types × calendar."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros("ts").alias("t_us"),
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"),
    )
    g = ev.agg(
        F.max("t_us").alias("g_max"),
        F.countDistinct("d").alias("g_days"),
    )
    per = ev.groupBy("event_type").agg(
        F.count("*").alias("n_rows"),
        F.max("t_us").alias("last_us"),
        F.countDistinct("d").alias("n_days"),
    )
    return per.crossJoin(F.broadcast(g)).select(
        "event_type",
        "n_rows",
        "last_us",
        (F.col("g_max") - F.col("last_us")).alias("lag_us"),
        (F.col("g_max") - F.col("last_us") > _DQ4_STALE_US).alias("stale"),
        "n_days",
        (F.col("g_days") - F.col("n_days")).alias("missing_days"),
        F.expr("n_days * 1000000 DIV g_days").alias("coverage_ppm"),
    )


# --- DQ5: cross-table reconciliation audit ---------------------------------------

_DQ5_ORACLE = """
WITH li AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS BIGINT) AS li_cents
  FROM lineitem GROUP BY l_orderkey
),
o AS (
  SELECT o_orderkey, strftime(o_orderdate, '%Y-%m') AS o_month,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS o_cents
  FROM orders
),
j AS (
  SELECT o.o_month, o.o_cents, li.li_cents
  FROM o LEFT JOIN li ON li.l_orderkey = o.o_orderkey
)
SELECT o_month,
       COUNT(*) AS n_orders,
       CAST(COUNT(*) FILTER (li_cents IS NULL) AS BIGINT) AS n_childless,
       CAST(COUNT(*) FILTER (li_cents IS NOT NULL
              AND abs(li_cents - o_cents) <= o_cents // 100) AS BIGINT)
         AS n_within_1pct,
       CAST(COUNT(*) FILTER (li_cents IS NOT NULL
              AND abs(li_cents - o_cents) > o_cents // 100) AS BIGINT)
         AS n_drifted,
       CAST(COALESCE(SUM(abs(li_cents - o_cents))
              FILTER (li_cents IS NOT NULL), 0) AS BIGINT)
         AS abs_drift_cents
FROM j GROUP BY o_month
"""


@query("dq5_reconciliation", oracle=_DQ5_ORACLE, tags=("quality", "audit"))
def dq5_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ5: cross-table reconciliation — does the header total equal
    the sum of its line items?  The financial-close audit every
    order/invoice warehouse runs, and the governance axis DQ1–DQ4
    don't cover: DQ1 checks the KEYS agree (no orphans), this checks
    the MONEY agrees (no drift).  Per month: childless headers (no
    lines at all — a different defect than drift), headers within a
    1% tolerance, drifted headers, and the total absolute drift in
    cents.

    On this synthetic corpus the invariant genuinely fails (zero
    exact matches, 257 childless orders at sf0.01) — which is the
    point: the audit REPORTS the books, it does not assume them.
    All arithmetic is decimal-exact cents with an integer cross-
    multiplied tolerance (``|Δ| ≤ total DIV 100`` — no float
    percentage anywhere).  Shape: one map-side-combined per-order
    line sum, one shuffled equi-join on orderkey, one month rollup —
    the same plan at any scale."""
    li = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
                .cast("long")
            ).alias("li_cents")
        )
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM").alias("o_month"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("o_cents"),
    )
    j = o.join(li, o["o_orderkey"] == li["l_orderkey"], "left")
    has = F.col("li_cents").isNotNull()
    drift = F.abs(F.col("li_cents") - F.col("o_cents"))
    tol = F.expr("o_cents DIV 100")
    return j.groupBy("o_month").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.when(~has, 1).otherwise(0)).cast("long").alias("n_childless"),
        F.sum(F.when(has & (drift <= tol), 1).otherwise(0))
        .cast("long")
        .alias("n_within_1pct"),
        F.sum(F.when(has & (drift > tol), 1).otherwise(0))
        .cast("long")
        .alias("n_drifted"),
        F.coalesce(F.sum(F.when(has, drift)), F.lit(0))
        .cast("long")
        .alias("abs_drift_cents"),
    )
