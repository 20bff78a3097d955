"""Window-function operators (SURVEY.md §2.5 W1–W6).

Scale notes: every window here partitions by a high-cardinality key
(user_id, c_custkey, segment) so state per partition stays small; none
uses a global (unpartitioned) ORDER BY, which would serialize on one
task at 100 TB.  Windowed SUMs over doubles go through a decimal cast
(see functions/numeric.py) because DuckDB evaluates sliding frames
with a segment tree — a different association order than Spark's
running accumulator; decimal addition is exact so both engines agree
bit-for-bit.  Every ORDER BY inside a window carries a unique
tiebreaker column so ranking/ntile/frames are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from update_database_by_wind_spark.functions.numeric import (
    PREC,
    SCALE,
    dec_sum,
    sql_dec_sum,
)
from update_database_by_wind_spark.registry import query
from update_database_by_wind_spark.sources import load

_DEC = f"decimal({PREC},{SCALE})"


# --- W1: ranking family ------------------------------------------------

_W1_ORACLE = """
SELECT c_mktsegment, o_orderkey, o_totalprice, rn, rnk, drnk
FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         ROW_NUMBER()  OVER w AS rn,
         RANK()        OVER w AS rnk,
         DENSE_RANK()  OVER w AS drnk
  FROM orders JOIN customer ON o_custkey = c_custkey
  WINDOW w AS (PARTITION BY c_mktsegment
               ORDER BY o_totalprice DESC, o_orderkey)
)
WHERE rn <= 3
"""


@query("w1_rank_top_orders_per_segment", oracle=_W1_ORACLE, tags=("window",))
def w1_rank_top_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: row_number/rank/dense_rank; top-3 orders per market segment."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select(
            "c_mktsegment",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


# --- W2: lag/lead — daily returns (the reference's pct_change) ---------

_W2_ORACLE = f"""
WITH daily AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         {sql_dec_sum('value', 'day_value')}
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, CAST(date_trunc('day', ts) AS TIMESTAMP)
)
SELECT user_id, CAST(day AS TIMESTAMP_NS) AS day, day_value,
       LAG(day_value)  OVER w AS prev_value,
       LEAD(day_value) OVER w AS next_value,
       day_value / NULLIF(LAG(day_value) OVER w, 0) - 1.0 AS ret
FROM daily
WINDOW w AS (PARTITION BY user_id ORDER BY day)
"""


@query("w2_lag_daily_returns", oracle=_W2_ORACLE, tags=("window", "timeseries"))
def w2_lag_daily_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: lag/lead — per-user daily value and pct-change-style return,
    the reference category's `pct_change` (SURVEY.md §0.1 step 4)."""
    events = load(spark, sf_dir, "events")
    daily = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(
            "user_id", F.date_trunc("day", F.col("ts")).alias("day")
        )
        .agg(dec_sum("value", "day_value"))
    )
    w = Window.partitionBy("user_id").orderBy("day")
    return daily.select(
        "user_id",
        "day",
        "day_value",
        F.lag("day_value").over(w).alias("prev_value"),
        F.lead("day_value").over(w).alias("next_value"),
        # NULLIF: a zero prior-day value must yield a NULL return, not
        # an ANSI divide-by-zero (Spark 4 errors even on doubles)
        (
            F.col("day_value")
            / F.nullif(F.lag("day_value").over(w), F.lit(0.0))
            - 1.0
        ).alias("ret"),
    )


# --- W3: rolling frame (moving average) --------------------------------

_W3_ORACLE = f"""
SELECT event_id, user_id, value,
       CAST(SUM(CAST(value AS {_DEC})) OVER w AS DOUBLE)
         / COUNT(value) OVER w AS ma5
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
"""


@query("w3_moving_average", oracle=_W3_ORACLE, tags=("window", "timeseries"))
def w3_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: 5-row moving average per user (the reference's MA5 rolling
    bar).  Decimal-cast inside the frame sum for engine parity."""
    events = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        "value",
        (
            F.sum(F.col("value").cast(_DEC)).over(w).cast("double")
            / F.count("value").over(w)
        ).alias("ma5"),
    )


# --- W4: cumulative aggregate ------------------------------------------

_W4_ORACLE = f"""
SELECT o_custkey, o_orderkey, CAST(o_orderdate AS TIMESTAMP_NS) AS o_orderdate,
       CAST(SUM(CAST(o_totalprice AS {_DEC})) OVER w AS DOUBLE) AS cum_spent,
       COUNT(*) OVER w AS cum_orders
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@query("w4_cumulative_spend", oracle=_W4_ORACLE, tags=("window",))
def w4_cumulative_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: running total per customer over order history."""
    orders = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast(_DEC)).over(w).cast("double").alias(
            "cum_spent"
        ),
        F.count("*").over(w).alias("cum_orders"),
    )


# --- W5: forward fill (last ignore-nulls over a date spine) -------------

_W5_ORACLE = f"""
WITH bounds AS (
  SELECT CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP) AS mn,
         CAST(date_trunc('day', MAX(ts)) AS TIMESTAMP) AS mx
  FROM events
),
spine AS (
  SELECT u.user_id, unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day
  FROM bounds, (SELECT DISTINCT user_id FROM events WHERE user_id < 50) u
),
daily AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         {sql_dec_sum('value', 'day_value')}
  FROM events WHERE event_type = 'purchase' AND user_id < 50
  GROUP BY 1, 2
)
SELECT s.user_id, CAST(s.day AS TIMESTAMP_NS) AS day, d.day_value,
       LAST_VALUE(d.day_value IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS filled_value
FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
"""


@query("w5_forward_fill", oracle=_W5_ORACLE, tags=("window", "timeseries"))
def w5_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5: forward-fill of missing daily values over a per-key date
    spine — the reference category's ffill of missing quotes
    (SURVEY.md §0.1 step 4).  last(ignorenulls) over a running frame;
    the spine is sequence()+explode so no driver-side loop."""
    events = load(spark, sf_dir, "events")
    users = events.filter(F.col("user_id") < 50).select("user_id").distinct()
    bounds = events.agg(
        F.min(F.date_trunc("day", F.col("ts"))).alias("mn"),
        F.max(F.date_trunc("day", F.col("ts"))).alias("mx"),
    )
    spine = bounds.crossJoin(users).select(
        "user_id",
        F.explode(F.sequence("mn", "mx", F.expr("interval 1 day"))).alias("day"),
    )
    daily = (
        events.filter(
            (F.col("event_type") == "purchase") & (F.col("user_id") < 50)
        )
        .groupBy(
            "user_id", F.date_trunc("day", F.col("ts")).alias("day")
        )
        .agg(dec_sum("value", "day_value"))
    )
    w = (
        Window.partitionBy(spine.user_id)
        .orderBy(spine.day)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(
            daily,
            (spine.user_id == daily.user_id) & (spine.day == daily.day),
            "left",
        )
        .select(
            spine.user_id,
            spine.day,
            daily.day_value,
            F.last(daily.day_value, ignorenulls=True).over(w).alias(
                "filled_value"
            ),
        )
    )


# --- W6: ntile quartiles -------------------------------------------------

_W6_ORACLE = """
SELECT n_nationkey, quartile,
       COUNT(*) AS n_customers,
       MIN(c_acctbal) AS min_bal,
       MAX(c_acctbal) AS max_bal
FROM (
  SELECT n_nationkey, c_acctbal,
         CAST(NTILE(4) OVER (PARTITION BY n_nationkey
                        ORDER BY c_acctbal, c_custkey) AS BIGINT) AS quartile
  FROM customer JOIN nation ON c_nationkey = n_nationkey
)
GROUP BY n_nationkey, quartile
"""


@query("w6_ntile_acctbal_quartiles", oracle=_W6_ORACLE, tags=("window",))
def w6_ntile_acctbal_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6: ntile bucketing (cross-sectional factor quartiles in the
    reference category).  Unique tiebreak (c_custkey) makes bucket
    assignment deterministic."""
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    w = Window.partitionBy("n_nationkey").orderBy("c_acctbal", "c_custkey")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select("n_nationkey", "c_acctbal", F.ntile(4).over(w).cast("long").alias("quartile"))
        .groupBy("n_nationkey", "quartile")
        .agg(
            F.count("*").alias("n_customers"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
    )


# --- W3b: time-based RANGE frame (rolling 1-hour window per user) -------------

_W3B_ORACLE = """
SELECT event_id, user_id,
       COUNT(*) OVER w AS n_1h,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS sum_1h
FROM events
WHERE user_id % 29 = 0
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
             RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
"""


@query("w3b_time_range_rolling", oracle=_W3B_ORACLE, tags=("window", "range"))
def w3b_time_range_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3b: rolling *time-based* window — rangeBetween over epoch
    seconds gives each event its trailing-1-hour count/sum, the
    value-based frame that rowsBetween (W3) can't express when event
    spacing is irregular.  RANGE frames are tie-safe (all peers at the
    same ts share one frame), so the result is deterministic under any
    partitioning; the sum goes through the decimal detour for exact
    engine parity.  Both engines floor timestamps to whole seconds
    (cast-to-long / epoch_us // 1e6) so frame membership is identical."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") % 29 == 0)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-3599, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_1h"),
        F.sum(F.col("value").cast("decimal(38,6)"))
        .over(w)
        .cast("double")
        .alias("sum_1h"),
    )


# --- W11: cumulative DISTINCT count (running set cardinality) -------------------

_W11_ORACLE = """
WITH ev AS (
  SELECT user_id, event_type, event_id,
         CAST(epoch_us(ts) AS BIGINT) AS t_us
  FROM events WHERE user_id % 97 = 0
),
flagged AS (
  SELECT user_id, event_type, event_id, t_us,
         CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                      ORDER BY t_us, event_id) = 1
              THEN 1 ELSE 0 END AS first_seen
  FROM ev
)
SELECT user_id, t_us, event_type,
       CAST(SUM(first_seen) OVER (PARTITION BY user_id
                                  ORDER BY t_us, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS n_distinct_so_far
FROM flagged
"""


@query("w11_cumulative_distinct", oracle=_W11_ORACLE, tags=("window",))
def w11_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W11: running COUNT(DISTINCT) — per user, how many distinct
    event types have been seen up to and including each event.  SQL
    forbids ``COUNT(DISTINCT x) OVER (ORDER BY ...)`` outright (no
    engine implements it — running-distinct state is a set, not a
    scalar), so the production rewrite is the FIRST-OCCURRENCE FLAG:
    a row_number over (user, type) marks each type's first arrival,
    and a plain running SUM of the flag over the user's timeline is
    exactly the growing set's cardinality.  The onboarding/breadth
    metric ("how quickly does a user's behavioral repertoire grow")
    and the standard interview-question window trick, as a
    driver-checked operator.

    Shuffle shape: both windows hash-partition on user_id (the
    (user, type) partition is a subpartition, so Catalyst plans ONE
    exchange and sorts twice within it); ties break on the unique
    event_id; timestamps travel as integer microseconds.  The %97
    user sample bounds the output, not the computation."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("user_id") % 97 == 0
    ).select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("t_us"),
    )
    w_first = Window.partitionBy("user_id", "event_type").orderBy(
        "t_us", "event_id"
    )
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.withColumn(
            "first_seen",
            F.when(F.row_number().over(w_first) == 1, 1).otherwise(0),
        )
        .select(
            "user_id",
            "t_us",
            "event_type",
            F.sum("first_seen").over(w_cum).cast("long").alias(
                "n_distinct_so_far"
            ),
        )
    )
