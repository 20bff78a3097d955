"""Extended operator coverage — the remaining SURVEY.md §2 inventory:
full outer join (J2), cube (A4), map/array scalar families (§2.7),
Wind-style monthly resampling and sessionization (§0.1 step 4 —
weekly/monthly bars over (code, date) series), correlated subqueries
through the spark.sql entry point (§3.2), and TPC-H Q3's shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from update_database_by_wind_spark.functions.numeric import dec_sum, sql_dec_sum
from update_database_by_wind_spark.registry import query
from update_database_by_wind_spark.sources import load, register_views

# --- J2b: full outer join ---------------------------------------------------

_J2B_ORACLE = """
WITH cn AS (
  SELECT c_nationkey AS nk, COUNT(*) AS n_customers FROM customer GROUP BY 1
),
sn AS (
  SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1
)
SELECT COALESCE(cn.nk, sn.nk) AS nationkey,
       COALESCE(n_customers, 0) AS n_customers,
       COALESCE(n_suppliers, 0) AS n_suppliers,
       CASE WHEN cn.nk IS NULL THEN 'supplier_only'
            WHEN sn.nk IS NULL THEN 'customer_only'
            ELSE 'both' END AS presence
FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
"""


@query("j2b_full_outer_join", oracle=_J2B_ORACLE, tags=("join",))
def j2b_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: full outer join — union of key spaces with per-side nulls."""
    cn = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_customers"))
    )
    sn = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    joined = cn.join(sn, cn.nk == sn.nk, "full_outer")
    return joined.select(
        F.coalesce(cn.nk, sn.nk).alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        F.when(cn.nk.isNull(), "supplier_only")
        .when(sn.nk.isNull(), "customer_only")
        .otherwise("both")
        .alias("presence"),
    )


# --- A4b: cube --------------------------------------------------------------

_A4B_ORACLE = f"""
SELECT COALESCE(l_returnflag, 'ALL') AS flag,
       COALESCE(l_linestatus, 'ALL') AS status,
       CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
       COUNT(*) AS n,
       {sql_dec_sum('l_quantity', 'total_qty')}
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
"""


@query("a4b_cube_quantities", oracle=_A4B_ORACLE, tags=("agg",))
def a4b_cube_quantities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: CUBE — all 2ⁿ grouping sets in one Expand pass."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count("*").alias("n"),
            dec_sum("l_quantity", "total_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("flag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("status"),
            "g_flag",
            "g_status",
            "n",
            "total_qty",
        )
    )


# --- map functions (§2.7) ------------------------------------------------------

_FMAP_ORACLE = """
WITH m AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
  FROM events WHERE event_id % 3 = 0
)
SELECT event_type,
       COUNT(*) AS n,
       CAST(MIN(k_val) AS INTEGER) AS min_k,
       CAST(MAX(k_val) AS INTEGER) AS max_k
FROM m
GROUP BY event_type
"""


@query("f_map_functions", oracle=_FMAP_ORACLE, tags=("scalar", "map"))
def f_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 map family: build a MapType column (create_map), read it
    back with element_at / map_keys — the JSON props as a typed map.
    The map is constructed and consumed in-plan; the oracle checks the
    values that flowed through it."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") % 3 == 0)
    k = F.from_json(F.col("props"), "k INT").getField("k")
    with_map = ev.select(
        "event_type",
        F.create_map(
            F.lit("k"), k.cast("double"), F.lit("v"), F.col("value")
        ).alias("props_map"),
    )
    extracted = with_map.select(
        "event_type",
        F.element_at("props_map", "k").cast("int").alias("k_val"),
        F.size(F.map_keys("props_map")).alias("n_keys"),
    ).filter(F.col("n_keys") == 2)
    return extracted.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.min("k_val").cast("int").alias("min_k"),
        F.max("k_val").cast("int").alias("max_k"),
    )


# --- array functions (§2.7) -----------------------------------------------------

_FARR_ORACLE = """
SELECT vec_id,
       CAST(len(embedding) AS INTEGER) AS dim,
       ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
       ROUND(CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE), 6)
         AS max_abs,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_positive,
       ROUND(list_sum(list_transform(embedding[1:8],
                                     x -> CAST(x AS DOUBLE))), 6) AS head_sum
FROM embeddings
WHERE vec_id % 9 = 0
"""


@query("f_array_functions", oracle=_FARR_ORACLE, tags=("scalar", "array"))
def f_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 array family: size/element_at/slice + higher-order
    transform/filter/aggregate — all JVM-side, no UDF."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 9 == 0)
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias(
            "first_elem"
        ),
        F.round(
            F.array_max(F.transform("embedding", lambda x: F.abs(x))).cast(
                "double"
            ),
            6,
        ).alias("max_abs"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
        F.round(
            F.aggregate(
                F.slice(dbl, 1, 8), F.lit(0.0), lambda acc, x: acc + x
            ),
            6,
        ).alias("head_sum"),
    )


# --- Wind-style monthly resample (OHLC bars) --------------------------------------

_TSM_ORACLE = f"""
SELECT user_id,
       CAST(date_trunc('month', ts) AS TIMESTAMP_NS) AS month,
       arg_min(value, event_id) AS open_value,
       arg_max(value, event_id) AS close_value,
       MIN(value) AS low_value,
       MAX(value) AS high_value,
       {sql_dec_sum('value', 'volume')},
       COUNT(*) AS n_events
FROM events
WHERE event_type = 'purchase'
GROUP BY user_id, date_trunc('month', ts)
"""


@query("ts_resample_monthly_ohlc", oracle=_TSM_ORACLE, tags=("timeseries",))
def ts_resample_monthly_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly OHLC resampling — the reference category's
    daily→weekly/monthly bar aggregation (SURVEY.md §0.1 step 4):
    open/close via min_by/max_by on the unique sequence key (no sort,
    one aggregation pass), low/high/volume alongside."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return ev.groupBy(
        "user_id", F.date_trunc("month", "ts").alias("month")
    ).agg(
        F.min_by("value", "event_id").alias("open_value"),
        F.max_by("value", "event_id").alias("close_value"),
        F.min("value").alias("low_value"),
        F.max("value").alias("high_value"),
        dec_sum("value", "volume"),
        F.count("*").alias("n_events"),
    )


# --- sessionization in batch (lag + cumsum) ----------------------------------------

_SESS_ORACLE = """
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
               OR LAG(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts, event_id,
         CAST(SUM(new_session) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM gaps
)
SELECT user_id, session_id,
       COUNT(*) AS n_events,
       CAST(date_trunc('second', MIN(ts)) AS TIMESTAMP_NS) AS session_start
FROM sessions
GROUP BY user_id, session_id
"""


@query("ts_sessionize_batch", oracle=_SESS_ORACLE, tags=("timeseries", "window"))
def ts_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: lag-gap flag + running sum = session id —
    the window twin of streaming session_window (equivalence with ST4
    is implied by both matching the same per-user event partitions)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_id", F.sum("new_session").over(wrun).cast("long")
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.date_trunc("second", F.min("ts")).alias("session_start"),
    )


# --- correlated subquery through the SQL entry point ----------------------------------

_CORR_SQL = """
SELECT n_name,
       COUNT(*) AS n_rich_customers
FROM customer c
JOIN nation ON c.c_nationkey = n_nationkey
WHERE c.c_acctbal > (
  SELECT AVG(c2.c_acctbal) FROM customer c2
  WHERE c2.c_nationkey = c.c_nationkey
)
GROUP BY n_name
"""


@query("sql_correlated_subquery", oracle=_CORR_SQL, tags=("sql", "subquery"))
def sql_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.2/§4.1: the spark.sql entry point with a correlated scalar
    subquery — Catalyst decorrelates it into an aggregate + join (no
    per-row re-execution; asserted in tests/test_plans.py).  The same
    ANSI text runs verbatim as its own DuckDB oracle."""
    register_views(spark, sf_dir)
    return spark.sql(_CORR_SQL)


# --- TPC-H Q3 shape: top unshipped orders ------------------------------------------------

_Q3_ORACLE = f"""
SELECT l_orderkey,
       {sql_dec_sum('l_extendedprice * (1 - l_discount)', 'revenue')},
       CAST(o_orderdate AS TIMESTAMP_NS) AS o_orderdate,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@query("q3_shipping_priority", oracle=_Q3_ORACLE, tags=("join", "tpch"))
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: revenue of ordered-but-unshipped lineitems for
    one segment, top-10 — selective dim filter broadcast against two
    fact tables, ranked on an exact decimal revenue (deterministic
    ordering across engines)."""
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# --- ts: cross-sectional z-score + winsorization (factor preprocessing) -------

_ZS_ORACLE = """
WITH stats AS (
  SELECT c_custkey, c_nationkey, c_acctbal,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) OVER p AS DOUBLE) AS s1,
         CAST(SUM(CAST(c_acctbal * c_acctbal AS DECIMAL(38,6))) OVER p
              AS DOUBLE) AS s2,
         CAST(COUNT(*) OVER p AS DOUBLE) AS n
  FROM customer
  WINDOW p AS (PARTITION BY c_nationkey)
),
z AS (
  SELECT c_custkey, c_nationkey, c_acctbal,
         (c_acctbal - s1 / n)
           / NULLIF(SQRT((s2 - s1 * s1 / n) / NULLIF(n - 1.0, 0)), 0) AS zraw
  FROM stats
)
SELECT c_custkey, c_nationkey, c_acctbal,
       ROUND(zraw, 6) AS zscore,
       ROUND(GREATEST(-2.0, LEAST(2.0, zraw)), 6) AS zscore_winsorized
FROM z
WHERE c_custkey % 13 = 0
"""


@query(
    "ts_cross_sectional_zscore", oracle=_ZS_ORACLE, tags=("timeseries", "window")
)
def ts_cross_sectional_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-sectional standardization — each customer's balance
    z-scored against its nation's cross-section, then winsorized to
    ±2σ: the de-meaning/outlier-clamping step every factor pipeline
    runs per trade date before ranking (here nation plays the date's
    role as the cross-section key).  Whole-partition window over
    decimal-exact power sums: one shuffle, no self-join, stats
    identical at any partitioning; per-row arithmetic stays IEEE
    double.  Output sliced mod-13; the window still sees the full
    cross-section."""
    from pyspark.sql import Window

    c = load(spark, sf_dir, "customer")
    p = Window.partitionBy("c_nationkey")
    bal = F.col("c_acctbal")
    s1 = F.sum(bal.cast("decimal(38,6)")).over(p).cast("double")
    s2 = F.sum((bal * bal).cast("decimal(38,6)")).over(p).cast("double")
    n = F.count("*").over(p).cast("double")
    # NULLIF guards: single-member or constant cross-sections yield a
    # NULL z-score, not an ANSI divide-by-zero
    zraw = (bal - s1 / n) / F.nullif(
        F.sqrt((s2 - s1 * s1 / n) / F.nullif(n - F.lit(1.0), F.lit(0.0))),
        F.lit(0.0),
    )
    return (
        c.select(
            "c_custkey",
            "c_nationkey",
            "c_acctbal",
            F.round(zraw, 6).alias("zscore"),
            F.round(
                F.greatest(F.lit(-2.0), F.least(F.lit(2.0), zraw)), 6
            ).alias("zscore_winsorized"),
        )
        .filter(F.col("c_custkey") % 13 == 0)
    )


# --- ts: Bollinger bands (rolling mean ± 2σ) ----------------------------------

_BB_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, o_orderpriority,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS rev
  FROM orders GROUP BY 1, 2
),
rolled AS (
  SELECT strftime(d, '%Y-%m-%d') AS day, o_orderpriority, rev,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY d) AS rn,
         CAST(SUM(CAST(rev AS DECIMAL(38,6))) OVER w AS DOUBLE) AS s1,
         CAST(SUM(CAST(rev * rev AS DECIMAL(38,6))) OVER w AS DOUBLE) AS s2,
         CAST(COUNT(*) OVER w AS DOUBLE) AS n
  FROM daily
  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY d
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
)
SELECT day, o_orderpriority, rev,
       ROUND(s1 / n, 6) AS ma20,
       ROUND(s1 / n + 2 * SQRT((s2 - s1 * s1 / n) / (n - 1.0)), 6)
         AS upper_band,
       ROUND(s1 / n - 2 * SQRT((s2 - s1 * s1 / n) / (n - 1.0)), 6)
         AS lower_band
FROM rolled
WHERE rn >= 20
"""


@query("ts_bollinger_bands", oracle=_BB_ORACLE, tags=("timeseries", "window"))
def ts_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands over the daily revenue series per priority tier
    — 20-day rolling mean ± 2 rolling standard deviations, the
    volatility-envelope indicator from the reference's market-data
    category.  Same windowed decimal-power-sum machinery as
    ts_rolling_corr: order-independent, one shuffle, warm-up frames
    (< 20 days) dropped."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.to_date("o_orderdate").alias("d"), "o_orderpriority"
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
        .cast("double")
        .alias("rev")
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("d")
        .rowsBetween(-19, Window.currentRow)
    )
    rev = F.col("rev")
    s1 = F.sum(rev.cast("decimal(38,6)")).over(w).cast("double")
    s2 = F.sum((rev * rev).cast("decimal(38,6)")).over(w).cast("double")
    n = F.count("*").over(w).cast("double")
    rn = F.row_number().over(
        Window.partitionBy("o_orderpriority").orderBy("d")
    )
    sd = F.sqrt((s2 - s1 * s1 / n) / (n - F.lit(1.0)))
    return (
        daily.select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "o_orderpriority",
            "rev",
            F.round(s1 / n, 6).alias("ma20"),
            F.round(s1 / n + 2 * sd, 6).alias("upper_band"),
            F.round(s1 / n - 2 * sd, 6).alias("lower_band"),
            rn.alias("rn"),
        )
        .filter(F.col("rn") >= 20)
        .drop("rn")
    )


# --- E1: ordered-event funnel (MATCH_RECOGNIZE-lite) ---------------------------

_FUNNEL_ORACLE = """
WITH t1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
t2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'click' AND e.ts >= t1.t1
  GROUP BY e.user_id
),
t3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= t2.t2
  GROUP BY e.user_id
),
counts AS (
  SELECT (SELECT COUNT(*) FROM t1) AS n1,
         (SELECT COUNT(*) FROM t2) AS n2,
         (SELECT COUNT(*) FROM t3) AS n3
)
SELECT '1_signup' AS step, CAST(n1 AS BIGINT) AS n_users,
       ROUND(CAST(n1 AS DOUBLE) / NULLIF(n1, 0), 6) AS conversion
FROM counts
UNION ALL
SELECT '2_click', CAST(n2 AS BIGINT),
       ROUND(CAST(n2 AS DOUBLE) / NULLIF(n1, 0), 6)
FROM counts
UNION ALL
SELECT '3_purchase', CAST(n3 AS BIGINT),
       ROUND(CAST(n3 AS DOUBLE) / NULLIF(n1, 0), 6)
FROM counts
"""


@query("e1_event_funnel", oracle=_FUNNEL_ORACLE, tags=("timeseries", "funnel"))
def e1_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1: ordered-event conversion funnel — how many users sign up,
    then click at-or-after their signup, then purchase at-or-after
    that click (timestamp-resolution ordering: same-instant
    progression counts, identically in both engines).  The
    MATCH_RECOGNIZE/funnel family of event analytics, expressed with
    chained per-user window minimums.

    Scale shape — the reason for the window formulation: the naive
    plan is a chain of three user-level aggregate+join rounds (the
    oracle's CTE shape), i.e. three shuffles and three join builds.
    Here the events shuffle ONCE on user_id; `t1` is a window MIN of
    signup times, `t2` a window MIN of clicks gated on the t1 COLUMN
    (windows chain through ordinary column references — each step
    reuses the same hash partitioning, so Catalyst plans one
    Exchange), `t3` likewise; the per-user frame then collapses into
    three global conditional counts.  One data-sized shuffle total,
    any number of funnel steps."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    wu = Window.partitionBy("user_id")
    t1 = F.min(
        F.when(F.col("event_type") == "signup", F.col("ts"))
    ).over(wu)
    staged = ev.withColumn("t1", t1)
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") >= F.col("t1")),
            F.col("ts"),
        )
    ).over(wu)
    staged = staged.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts") >= F.col("t2")),
            F.col("ts"),
        )
    ).over(wu)
    staged = staged.withColumn("t3", t3)
    # collapse to one row per user — the groupBy's required
    # partitioning (user_id) is exactly what the window exchange
    # already established, so Catalyst adds NO second data-sized
    # shuffle (ENSURE_REQUIREMENTS reuse; pinned by the plan test)
    per_user = staged.groupBy("user_id").agg(
        F.max("t1").alias("t1"),
        F.max("t2").alias("t2"),
        F.max("t3").alias("t3"),
    )
    counts = per_user.agg(
        F.count("t1").alias("n1"),  # COUNT skips nulls: users past step
        F.count("t2").alias("n2"),
        F.count("t3").alias("n3"),
    )

    def conv(n: str):
        return F.round(
            F.col(n).cast("double") / F.nullif(F.col("n1"), F.lit(0)), 6
        )

    def step(label: str, n: str):
        return F.struct(
            F.lit(label).alias("step"),
            F.col(n).alias("n_users"),
            conv(n).alias("conversion"),
        )

    # explode ONE 1-row frame into the 3 step rows — referencing
    # `counts` three times via union would replan (and rescan) the
    # whole funnel once per branch
    return counts.select(
        F.explode(
            F.array(
                step("1_signup", "n1"),
                step("2_click", "n2"),
                step("3_purchase", "n3"),
            )
        ).alias("s")
    ).select("s.step", "s.n_users", "s.conversion")
