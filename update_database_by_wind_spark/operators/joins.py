"""Join operators (SURVEY.md §2.3 J1–J9).

Scale notes (100 TB): the star joins rely on Catalyst's broadcast
selection — every dimension here is far under
``autoBroadcastJoinThreshold``, so fact-table scans never shuffle for
dimension enrichment (asserted in tests/test_plans.py).  The big
fact⋈fact join (lineitem⋈orders) is a shuffle join on the join key;
AQE handles skew.  The as-of join (J8) is the union+window rewrite —
a *single* shuffle on (key, ts) rather than a per-key BNLJ, which is
the strategy that survives 1000 executors (pd.merge_asof-per-key via
applyInPandas is provided as an alternative in
operators/timeseries.py for comparison, but the window rewrite is
the default because it stays JVM-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from update_database_by_wind_spark.functions.numeric import dec_sum, sql_dec_sum
from update_database_by_wind_spark.registry import query
from update_database_by_wind_spark.sources import load

# --- J1: multi-way star join (TPC-H Q5 shape) ------------------------

_J1_ORACLE = f"""
SELECT r_name, n_name,
       {sql_dec_sum('l_extendedprice * (1 - l_discount)', 'revenue')},
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


@query("j1_star_join_revenue", oracle=_J1_ORACLE, tags=("join", "star"))
def j1_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: 5-way inner equi-join; dims broadcast, facts shuffle once."""
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
            dec_sum("l_extendedprice * (1 - l_discount)", "revenue"),
            F.count("*").alias("n_items"),
        )
    )


# --- J2: left outer join (preserve customers with no orders) ---------

_J2_ORACLE = f"""
SELECT c_custkey,
       COUNT(o_orderkey) AS n_orders,
       {sql_dec_sum('o_totalprice', 'total_spent')}
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
"""


@query("j2_left_join_order_counts", oracle=_J2_ORACLE, tags=("join",))
def j2_left_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: left outer join; zero-order customers kept with NULL total."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dec_sum("o_totalprice", "total_spent"),
        )
    )


# --- J3: left semi (EXISTS) ------------------------------------------

_J3_ORACLE = """
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
GROUP BY c_mktsegment
"""


@query("j3_semi_join_active_customers", oracle=_J3_ORACLE, tags=("join",))
def j3_semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: left-semi join — customers with ≥1 finished order."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


# --- J4: left anti (NOT EXISTS) — the incremental-update core --------

_J4_ORACLE = """
SELECT n_name, COUNT(*) AS n_customers_without_orders
FROM customer c JOIN nation ON c_nationkey = n_nationkey
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY n_name
"""


@query("j4_anti_join_inactive_customers", oracle=_J4_ORACLE, tags=("join",))
def j4_anti_join_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: left-anti join — the diff step of the reference's
    incremental "fetch only missing keys" update loop (SURVEY.md §0.1
    step 3), expressed as a shuffle-once anti join."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_customers_without_orders"))
    )


# --- J5: cross join ---------------------------------------------------

_J5_ORACLE = """
SELECT r_name, o_orderstatus, COUNT(*) AS n_pairs
FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
GROUP BY r_name, o_orderstatus
"""


@query("j5_cross_join_region_status", oracle=_J5_ORACLE, tags=("join",))
def j5_cross_join_region_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: explicit cross join (bounded inputs only — 5 × 3 rows)."""
    region = load(spark, sf_dir, "region")
    status = load(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return (
        region.crossJoin(status)
        .groupBy("r_name", "o_orderstatus")
        .agg(F.count("*").alias("n_pairs"))
    )


# --- J6: theta join (equi prefix + band residual) ---------------------

_J6_ORACLE = """
SELECT s_suppkey, COUNT(*) AS n_close_customers
FROM supplier s JOIN customer c
  ON s.s_nationkey = c.c_nationkey
 AND ABS(s.s_acctbal - c.c_acctbal) < 100.0
GROUP BY s_suppkey
"""


@query("j6_theta_band_join", oracle=_J6_ORACLE, tags=("join",))
def j6_theta_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: non-equi band join. The equi prefix (nationkey) keeps it a
    hash join with a residual predicate instead of a BNLJ — the only
    formulation that survives large inputs."""
    supplier = load(spark, sf_dir, "supplier")
    customer = load(spark, sf_dir, "customer")
    cond = (supplier.s_nationkey == customer.c_nationkey) & (
        F.abs(supplier.s_acctbal - customer.c_acctbal) < 100.0
    )
    return (
        supplier.join(customer, cond)
        .groupBy("s_suppkey")
        .agg(F.count("*").alias("n_close_customers"))
    )


# --- J7: range/interval join via day-bucket equi join ------------------

_J7_ORACLE = f"""
WITH bounds AS (
  SELECT CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP) AS mn,
         CAST(date_trunc('day', MAX(ts)) AS TIMESTAMP) AS mx
  FROM events
),
spine AS (
  SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day
  FROM bounds
)
SELECT CAST(s.day AS TIMESTAMP_NS) AS day, COUNT(*) AS n_events, {sql_dec_sum('e.value', 'day_value')}
FROM spine s
JOIN events e
  ON CAST(date_trunc('day', e.ts) AS TIMESTAMP) = s.day
 AND hour(e.ts) BETWEEN 6 AND 17
GROUP BY s.day
"""


@query("j7_range_join_daily_windows", oracle=_J7_ORACLE, tags=("join", "range"))
def j7_range_join_daily_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: interval join (event ts ∈ [day 06:00, day 18:00)) rewritten
    as an equi join on the day bucket + residual hour predicate — the
    bucketing strategy that avoids a pure BNLJ at scale."""
    events = load(spark, sf_dir, "events")
    spine = (
        events.agg(
            F.min(F.date_trunc("day", F.col("ts"))).alias("mn"),
            F.max(F.date_trunc("day", F.col("ts"))).alias("mx"),
        )
        .select(
            F.explode(
                F.sequence("mn", "mx", F.expr("interval 1 day"))
            ).alias("day")
        )
    )
    ev = events.withColumn("day", F.date_trunc("day", F.col("ts")))
    return (
        spine.join(
            ev,
            (spine.day == ev.day) & F.hour(ev.ts).between(6, 17),
        )
        .groupBy(spine.day)
        .agg(F.count("*").alias("n_events"), dec_sum("value", "day_value"))
    )


# --- J8: as-of join (last click value at each purchase) ----------------

_J8_ORACLE = """
WITH clicks AS (
  SELECT user_id, ts, MAX(value) AS click_value
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
),
purchases AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP_NS) AS ts, p.value,
       c.click_value AS last_click_value
FROM purchases p
ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
"""


@query("j8_asof_join_last_click", oracle=_J8_ORACLE, tags=("join", "asof"))
def j8_asof_join_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8: as-of join — Spark has no native ASOF, so this is the
    union+window rewrite (SURVEY.md §2.3 J8 strategy (a)): union build
    and probe rows, forward-fill the build value with
    last(ignorenulls) ordered by (ts, side), keep probe rows.  One
    shuffle on the key; no per-key Python.  This is the reference
    category's "align quotes to trading calendar / last-known value"
    signature operation (SURVEY.md §0.1 step 4).

    Tie semantics: at equal ts the build row sorts first (side 0 <
    side 1), matching ASOF's `probe.ts >= build.ts`.  Build values are
    pre-aggregated to one row per (key, ts) so ties are deterministic.
    """
    # SQL expression strings (one py4j parse each) instead of the
    # ~25-call Column chain: build time measured 0.11 s per bench pass
    # (56% of j8's sf0.1 pass); parsed trees identical
    # (DataFrame.sameSemantics receipt, round-18 §9).
    events = load(spark, sf_dir, "events")
    clicks = (
        events.where("event_type = 'click'")
        .groupBy("user_id", "ts")
        .agg(F.expr("max(value) AS click_value"))
        .selectExpr(
            "user_id",
            "ts",
            "click_value",
            "0 AS side",
            "CAST(NULL AS BIGINT) AS event_id",
            "CAST(NULL AS DOUBLE) AS value",
        )
    )
    purchases = events.where("event_type = 'purchase'").selectExpr(
        "user_id",
        "ts",
        "CAST(NULL AS DOUBLE) AS click_value",
        "1 AS side",
        "event_id",
        "value",
    )
    return (
        clicks.unionByName(purchases)
        .withColumn(
            "last_click_value",
            F.expr(
                "last(click_value, true) OVER (PARTITION BY user_id"
                " ORDER BY ts, side"
                " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
            ),
        )
        .where("side = 1")
        .select("event_id", "user_id", "ts", "value", "last_click_value")
    )


# --- J10: salted join for skewed keys ---------------------------------

_J10_ORACLE = f"""
SELECT c_mktsegment, e.event_type,
       COUNT(*) AS n_events,
       {sql_dec_sum('e.value', 'total_value')}
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c_mktsegment, e.event_type
"""


@query("j10_salted_skew_join", oracle=_J10_ORACLE, tags=("join", "skew"))
def j10_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10: skew-mitigated equi-join via key salting — the manual
    counterpart to AQE's skewJoin (which only splits *shuffle* joins
    and can miss single-hot-key pathologies).  Fact side gets a
    deterministic salt = event_id % S; the dim side is replicated S
    ways (explode of a literal array, NOT a cross join), and the join
    key becomes (key, salt) — a hot user's rows now land on S
    partitions instead of one.  Salting preserves join semantics
    exactly, so the result is oracle-checked against the *unsalted*
    SQL join.  S is a constant here; at scale it comes from observed
    key histograms (only salt the hot keys, replicate dim rows only
    for those)."""
    salts = 8
    ev = load(spark, sf_dir, "events").withColumn(
        "salt", (F.col("event_id") % salts).cast("int")
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    salted_dim = cust.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    return (
        ev.join(
            salted_dim,
            (ev.user_id == salted_dim.c_custkey) & (ev.salt == salted_dim.salt),
        )
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            dec_sum("value", "total_value"),
        )
    )


def skewed_events_join(
    spark: SparkSession,
    sf_dir: str,
    salts: int = 0,
    hot_key: int = 1,
    hot_mod: int = 10,
    hot_lt: int = 9,
) -> DataFrame:
    """Bench receipt harness for J10's salting claim (not a registry
    query): remaps ``hot_lt/hot_mod`` of all event rows (default 90%)
    onto ONE hot customer key, then joins to customer — unsalted when
    ``salts=0``, else with PARTIAL salting, the production variant
    j10's docstring prescribes: only the observed-hot key gets a salt
    (everything else keeps salt 0), and the dim replicates ONLY its
    hot rows, so the fix costs S extra dim rows total instead of
    S × |dim|.  A/B against full-dim salting at 20× scale: full
    replication was net SLOWER than the skew it fixed (2.45 s vs
    1.53 s — the 16× dim blow-up swamps the win), partial salting
    beats both (1.06 s).  The dim side is hinted ``shuffle_hash`` so
    the join actually shuffles (a broadcastable fixture dim would hide
    the skew a production-sized dim forces); bench.py times unsalted
    (AQE skew-split off/on) against this plan and records the deltas
    in BASELINE.md.  Both variants return identical results by
    construction — salting preserves join semantics."""
    ev = load(spark, sf_dir, "events").withColumn(
        "user_id",
        F.when(F.col("event_id") % hot_mod < hot_lt, F.lit(hot_key)).otherwise(
            F.col("user_id")
        ),
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    if salts:
        ev = ev.withColumn(
            "salt",
            F.when(F.col("user_id") == hot_key, F.col("event_id") % salts)
            .otherwise(F.lit(0))
            .cast("int"),
        )
        dim = cust.withColumn(
            "salt",
            F.explode(
                F.when(
                    F.col("c_custkey") == hot_key,
                    F.array(*[F.lit(i) for i in range(salts)]),
                ).otherwise(F.array(F.lit(0)))
            ),
        ).hint("shuffle_hash")
        cond = (ev.user_id == dim.c_custkey) & (ev.salt == dim.salt)
    else:
        dim = cust.hint("shuffle_hash")
        cond = ev.user_id == dim.c_custkey
    return (
        ev.join(dim, cond)
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            dec_sum("value", "total_value"),
        )
    )


# --- J11: null-safe equi-join (<=>) -----------------------------------

_J11_ORACLE = """
WITH l AS (
  SELECT event_id, NULLIF(user_id % 50, 7) AS k
  FROM events WHERE user_id < 500
),
r AS (
  SELECT c_custkey, NULLIF(c_custkey % 50, 7) AS k
  FROM customer WHERE c_custkey < 300
)
SELECT COALESCE(CAST(l.k AS VARCHAR), 'NULL') AS key_class,
       COUNT(*) AS n_pairs,
       CAST(COUNT(DISTINCT l.event_id) AS BIGINT) AS n_left,
       CAST(COUNT(DISTINCT r.c_custkey) AS BIGINT) AS n_right
FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
GROUP BY 1
"""


@query("j11_null_safe_join", oracle=_J11_ORACLE, tags=("join",))
def j11_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11: null-safe equality join (``<=>`` / IS NOT DISTINCT FROM) —
    NULL keys match each other instead of vanishing, the semantics an
    upsert pipeline needs when the business key is legitimately
    nullable.  Still a hash join (null-safe equality is hashable);
    the NULL bucket is kept deliberately small because at scale it is
    a guaranteed hot key — salt it or route it separately."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 500).select(
        "event_id", F.nullif(F.col("user_id") % 50, F.lit(7)).alias("k")
    )
    cust = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 300)
        .select("c_custkey", F.nullif(F.col("c_custkey") % 50, F.lit(7)).alias("ck"))
    )
    return (
        ev.join(cust, ev.k.eqNullSafe(cust.ck))
        .groupBy(
            F.coalesce(ev.k.cast("string"), F.lit("NULL")).alias("key_class")
        )
        .agg(
            F.count("*").alias("n_pairs"),
            F.countDistinct("event_id").alias("n_left"),
            F.countDistinct("c_custkey").alias("n_right"),
        )
    )


# --- J12: Bloom-filter semi-join prefilter (runtime-filter receipt) -----------

# Portable k=3 Bloom over m=4096 positions:
#   h_i(key) = floor((((key % P) * A_i) % 2^31) / 2^19)   ∈ [0, 4096)
# — the HIGH 12 bits of a multiplicative hash, not a low-bits modulus.
# Taking ((x*A) % m) with odd A is a bijection of (x mod m): all three
# such "hashes" pass/fail together and the filter degenerates to k=1
# (round-5 advisor finding, verified numerically).  High bits depend on
# every bit of the key, so the three A_i now yield genuinely distinct
# functions (measured: among probe pairs colliding on h0, only ~0.4%
# also collide on h1, vs 100% for the low-bits form).  Arithmetic is
# exact in both engines: the product is < P*A_max ≈ 3.3e15 (int64-safe,
# P mod-first — same overflow discipline as training.py), the mod-2^31
# residue and the 2^19 divisor are both exact in double, so FLOOR
# division replays bit-identically in DuckDB (verified 50k keys).
_BLOOM_P = 1_000_003
_BLOOM_M = 4096
_BLOOM_A = (2654435761, 2246822519, 3266489917)
_BLOOM_BAL = 7000.0


def _bloom_pos_sql(key: str, a: int) -> str:
    return (
        f"CAST(FLOOR(((({key}) % {_BLOOM_P}) * {a}) % 2147483648"
        f" / 524288.0) AS BIGINT)"
    )


_J12_ORACLE = f"""
WITH build AS (
  SELECT c_custkey FROM customer WHERE c_acctbal > {_BLOOM_BAL}
),
bloom AS (
  SELECT DISTINCT pos FROM (
    SELECT {_bloom_pos_sql('c_custkey', _BLOOM_A[0])} AS pos FROM build
    UNION ALL
    SELECT {_bloom_pos_sql('c_custkey', _BLOOM_A[1])} FROM build
    UNION ALL
    SELECT {_bloom_pos_sql('c_custkey', _BLOOM_A[2])} FROM build
  )
),
probe AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         {_bloom_pos_sql('o_custkey', _BLOOM_A[0])} AS h0,
         {_bloom_pos_sql('o_custkey', _BLOOM_A[1])} AS h1,
         {_bloom_pos_sql('o_custkey', _BLOOM_A[2])} AS h2
  FROM orders
),
flagged AS (
  SELECT p.o_orderstatus,
         (b0.pos IS NOT NULL AND b1.pos IS NOT NULL AND b2.pos IS NOT NULL)
           AS bloom_pass,
         (t.c_custkey IS NOT NULL) AS true_match
  FROM probe p
  LEFT JOIN bloom b0 ON p.h0 = b0.pos
  LEFT JOIN bloom b1 ON p.h1 = b1.pos
  LEFT JOIN bloom b2 ON p.h2 = b2.pos
  LEFT JOIN (SELECT DISTINCT c_custkey FROM build) t
         ON p.o_custkey = t.c_custkey
)
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bloom_pass,
       CAST(SUM(CASE WHEN true_match THEN 1 ELSE 0 END) AS BIGINT)
         AS n_true_match,
       CAST(SUM(CASE WHEN bloom_pass AND NOT true_match THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_positive
FROM flagged
GROUP BY o_orderstatus
"""


@query("j12_bloom_prefilter", oracle=_J12_ORACLE, tags=("join", "runtime-filter"))
def j12_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J12: Bloom-filter semi-join prefilter — build a k=3 Bloom over
    the high-balance customer keys, probe every order against it with
    three broadcast position-lookups, and report per-status how many
    probe rows the filter passes vs the exact semi-join truth (the
    false positives are REAL filter behavior, deterministically
    reproduced by the oracle because the hashes are portable
    arithmetic).

    Why it matters at 100 TB: when the build side is too large to
    broadcast as a hash join but its KEY FINGERPRINT is not, shipping
    a Bloom filter to the probe scan turns a full fact shuffle into a
    shuffle of ~matching rows only — Spark's own runtime row-level
    filtering (`spark.sql.optimizer.runtime.bloomFilter.enabled`)
    automates exactly this; the explicit operator shows the mechanism
    and MEASURES its precision.  The position table here stays a
    distinct-int relation (≤ m rows, broadcast); a production filter
    packs it into m bits — same membership semantics, smaller payload.
    No correctness risk at any scale: passes ⊇ true matches by
    construction, and the exact join downstream removes the FPs."""
    cust = load(spark, sf_dir, "customer")
    build = cust.filter(F.col("c_acctbal") > _BLOOM_BAL).select("c_custkey")
    bloom = (
        build.select(
            F.explode(
                F.array(
                    *[
                        F.expr(_bloom_pos_sql("c_custkey", a))
                        for a in _BLOOM_A
                    ]
                )
            ).alias("pos")
        )
        .distinct()
    )
    probe = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        *[
            F.expr(_bloom_pos_sql("o_custkey", a)).alias(f"h{i}")
            for i, a in enumerate(_BLOOM_A)
        ],
    )
    flagged = probe
    for i in range(3):
        b = bloom.withColumnRenamed("pos", f"pos{i}")
        flagged = flagged.join(
            F.broadcast(b), F.col(f"h{i}") == F.col(f"pos{i}"), "left"
        )
    flagged = flagged.join(
        F.broadcast(build.distinct()),
        F.col("o_custkey") == F.col("c_custkey"),
        "left",
    )
    bloom_pass = (
        F.col("pos0").isNotNull()
        & F.col("pos1").isNotNull()
        & F.col("pos2").isNotNull()
    )
    true_match = F.col("c_custkey").isNotNull()
    return flagged.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.when(bloom_pass, 1).otherwise(0)).alias("n_bloom_pass"),
        F.sum(F.when(true_match, 1).otherwise(0)).alias("n_true_match"),
        F.sum(F.when(bloom_pass & ~true_match, 1).otherwise(0)).alias(
            "n_false_positive"
        ),
    )


# --- J13: variable-interval overlap join via bin exploding ---------------------

_J13_GAP_S = 600  # incident sessionization gap (seconds)
_J13_BIN_S = 3600  # equi-join bin width (seconds)
_J13_CHUNK_S = 86400  # pass-1 sessionization chunk (1 day)


def sessionize_two_pass(
    err: DataFrame,
    *,
    gap_us: int,
    chunk_us: int = _J13_CHUNK_S * 1_000_000,
) -> DataFrame:
    """Gap-sessionize an event stream ``(t_us, event_id)`` into runs
    ``(start_us, end_us, n_err)`` WITHOUT a global sort — the round-12
    two-pass rewrite of j13's incident-detection prefix.

    Pass 1 sessionizes within coarse time chunks (``t_us DIV
    chunk_us``) under a chunk-PARTITIONED window — parallel at any
    volume.  Pass 2 re-sessionizes only each chunk's first and last
    runs (``g == 1`` / ``g == max(g)``): the only runs that can
    continue across a chunk edge, ≤ 2 per non-empty chunk, so the one
    unpartitioned window runs at calendar cardinality.  Equivalence to
    the single global window: interior runs have same-chunk neighbours
    > gap away on both sides (by pass-1 construction) so they can
    never merge, and an edge-run pair from the SAME chunk is likewise
    > gap apart, so pass 2 glues exactly the true cross-chunk
    continuations — including chains across empty chunks, since the
    merge is itself a gap sessionization over the candidate runs.
    Run start times are unique (runs are disjoint with > 0 gaps), so
    pass 2's order needs no tiebreak."""
    w_c = Window.partitionBy("chunk").orderBy("t_us", "event_id")
    w_ccum = w_c.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grp = err.withColumn("chunk", F.expr(f"t_us DIV {chunk_us}")).select(
        "chunk",
        "t_us",
        F.sum(
            F.when(
                F.lag("t_us").over(w_c).isNull()
                | (F.col("t_us") - F.lag("t_us").over(w_c) > gap_us),
                1,
            ).otherwise(0)
        )
        .over(w_ccum)
        .alias("g"),
    )
    runs = grp.groupBy("chunk", "g").agg(
        F.min("t_us").alias("start_us"),
        F.max("t_us").alias("end_us"),
        F.count("*").alias("n_err"),
    )
    g_max = F.max("g").over(Window.partitionBy("chunk"))
    runs = runs.withColumn(
        "is_edge", (F.col("g") == 1) | (F.col("g") == g_max)
    )
    interior = runs.filter(~F.col("is_edge")).select(
        "start_us", "end_us", "n_err"
    )
    w_m = Window.orderBy("start_us")
    w_mcum = w_m.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged = (
        runs.filter(F.col("is_edge"))
        .select(
            "start_us",
            "end_us",
            "n_err",
            F.sum(
                F.when(
                    F.lag("end_us").over(w_m).isNull()
                    | (
                        F.col("start_us") - F.lag("end_us").over(w_m)
                        > gap_us
                    ),
                    1,
                ).otherwise(0)
            )
            .over(w_mcum)
            .alias("m"),
        )
        .groupBy("m")
        .agg(
            F.min("start_us").alias("start_us"),
            F.max("end_us").alias("end_us"),
            F.sum("n_err").cast("long").alias("n_err"),
        )
        .drop("m")
    )
    return merged.unionByName(interior)

_J13_ORACLE = f"""
WITH err AS (
  SELECT ts, event_id, LAG(ts) OVER (ORDER BY ts, event_id) AS prev
  FROM events WHERE event_type = 'error'
),
flagged AS (
  SELECT ts, event_id,
         CASE WHEN prev IS NULL OR epoch(ts) - epoch(prev) > {_J13_GAP_S}
              THEN 1 ELSE 0 END AS brk
  FROM err
),
grp AS (
  -- event_id in the cumsum order too: a ts TIE at a burst boundary
  -- must group identically to the Spark side's (t_us, event_id) order
  SELECT ts,
         SUM(brk) OVER (ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS g
  FROM flagged
),
inc AS (
  SELECT CAST(epoch_us(MIN(ts)) AS BIGINT) AS start_us,
         CAST(epoch_us(MAX(ts)) AS BIGINT) AS end_us,
         CAST(COUNT(*) AS BIGINT) AS n_err
  FROM grp GROUP BY g HAVING COUNT(*) >= 3
),
purch AS (
  SELECT CAST(epoch_us(ts) AS BIGINT) AS p_us, value
  FROM events WHERE event_type = 'purchase'
)
SELECT inc.start_us, inc.end_us, inc.n_err,
       CAST(COUNT(*) AS BIGINT) AS n_purch,
       {sql_dec_sum('purch.value', 'purch_value')}
FROM inc JOIN purch ON purch.p_us BETWEEN inc.start_us AND inc.end_us
GROUP BY inc.start_us, inc.end_us, inc.n_err
"""


@query("j13_interval_bin_join", oracle=_J13_ORACLE, tags=("join", "range"))
def j13_interval_bin_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J13: VARIABLE-length interval ⋈ point overlap join via bin
    exploding — purchases that land inside error-incident windows.
    j7's fixed daily window assigns each point to exactly one bucket;
    here the intervals are data-defined (error bursts sessionized at a
    600 s gap, kept at ≥ 3 errors) with arbitrary, varying spans, so
    the textbook formulation is an inequality join — a
    BroadcastNestedLoopJoin that dies at scale.  The bin rewrite is
    the production range-join algorithm: explode each interval to the
    3600 s bins it covers (output O(total interval length / bin)),
    key each point by its single bin, equi-join on the bin, keep the
    exact containment as a residual predicate.  Because a point has
    exactly ONE bin, every (interval, point) match surfaces exactly
    once — no post-join dedup, the property that makes the rewrite a
    drop-in.  The physical plan is asserted in-query: a
    BroadcastNestedLoopJoin or CartesianProduct anywhere is a raise,
    not a slow pass.

    The incident-detection prefix is the round-12 TWO-PASS
    sessionization (replacing a single global time-ordered window —
    a single-partition sort over the whole error stream): pass 1
    sessionizes WITHIN coarse daily chunks under a chunk-partitioned
    window (parallel, any volume); pass 2 re-sessionizes only each
    chunk's FIRST and LAST runs — the only runs that can glue across
    a chunk edge, ≤ 2 per non-empty chunk, so the one remaining
    unpartitioned window runs at calendar cardinality (days), not
    event cardinality.  Interior runs cannot merge by construction
    (same-chunk neighbours are already > gap away on both sides) and
    bypass pass 2 untouched; a candidate pair from the same chunk is
    likewise > gap apart, so the merge pass glues exactly the true
    cross-chunk continuations — identical sessions to the global
    window, with the ≥ 3-error keep applied after merging.  The plan
    shape (no unpartitioned window over the raw stream) is pinned in
    tests/test_plans.py.  The join itself — the operator's point —
    is a plain shuffled equi-join on 8-byte bins, partitionable
    without limit.

    Timestamps travel as integer microseconds end-to-end (epoch
    parity), the purchase sum takes the decimal detour, and the
    oracle replays the inequality join directly — the rewrite must
    reproduce the naive semantics exactly."""
    from update_database_by_wind_spark.plans.explain import formatted_plan

    ev = load(spark, sf_dir, "events")
    gap_us = _J13_GAP_S * 1_000_000
    err = ev.filter(F.col("event_type") == "error").select(
        F.unix_micros("ts").alias("t_us"), "event_id"
    )
    inc = sessionize_two_pass(err, gap_us=gap_us).filter(
        F.col("n_err") >= 3
    )
    bin_us = _J13_BIN_S * 1_000_000
    binned_inc = inc.select(
        "start_us",
        "end_us",
        "n_err",
        F.explode(
            F.sequence(
                F.expr(f"start_us DIV {bin_us}"),
                F.expr(f"end_us DIV {bin_us}"),
            )
        ).alias("bin"),
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.unix_micros("ts").alias("p_us"), "value"
    ).withColumn("bin", F.expr(f"p_us DIV {bin_us}"))
    joined = binned_inc.join(purch, "bin").filter(
        F.col("p_us").between(F.col("start_us"), F.col("end_us"))
    )
    out = joined.groupBy("start_us", "end_us", "n_err").agg(
        F.count("*").alias("n_purch"),
        dec_sum("value", "purch_value"),
    )
    plan = formatted_plan(out)
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        if bad in plan:
            raise ValueError(
                f"j13_interval_bin_join: {bad} in the physical plan — "
                "the bin rewrite exists precisely to avoid it"
            )
    return out


# --- J14: as-of join with a staleness tolerance ---------------------------------

_J14_TOL_US = 3600 * 1_000_000  # 1 h: older quotes are too stale to use

_J14_ORACLE = f"""
WITH clicks AS (
  SELECT user_id, ts, MAX(value) AS click_value
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
),
purchases AS (
  SELECT event_id, user_id, ts, value FROM events
  WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id,
       CAST(epoch_us(p.ts) AS BIGINT) AS p_us, p.value,
       CASE WHEN c.ts IS NOT NULL
                 AND epoch_us(p.ts) - epoch_us(c.ts) <= {_J14_TOL_US}
            THEN c.click_value END AS last_click_value,
       CASE WHEN c.ts IS NOT NULL
                 AND epoch_us(p.ts) - epoch_us(c.ts) <= {_J14_TOL_US}
            THEN CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT)
            END AS staleness_us
FROM purchases p
ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
"""


@query("j14_asof_tolerance", oracle=_J14_ORACLE, tags=("join", "asof"))
def j14_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J14: as-of join with a STALENESS TOLERANCE — j8's last-known-
    value alignment plus the bound every real quote-alignment needs
    (pandas ``merge_asof(tolerance=...)``): a click more than an hour
    old is not the "current" click, it is history, and pretending
    otherwise poisons downstream attribution.  Matches beyond the
    tolerance become NULL exactly as a missing match does, and the
    kept match's ``staleness_us`` rides along so the tolerance choice
    itself is auditable.

    Same single-shuffle union+window rewrite as j8 (no per-key
    anything, one exchange on user_id) — the tolerance adds one
    forward-filled column (the matched click's OWN timestamp) and one
    integer-microsecond comparison, which is the whole point: in the
    union+window formulation a tolerance is a post-fill filter, while
    a join-based formulation would need a second range predicate in
    the join condition.  Oracle: DuckDB's native ASOF LEFT JOIN with
    the same staleness CASE — the rewrite must reproduce engine-native
    as-of semantics including the NULL rows."""
    events = load(spark, sf_dir, "events")
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
        .select(
            "user_id",
            F.unix_micros("ts").alias("t_us"),
            "click_value",
            F.lit(0).alias("side"),
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("double").alias("value"),
        )
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.unix_micros("ts").alias("t_us"),
        F.lit(None).cast("double").alias("click_value"),
        F.lit(1).alias("side"),
        "event_id",
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        clicks.unionByName(purchases)
        .withColumn(
            "last_click_value",
            F.last(F.col("click_value"), ignorenulls=True).over(w),
        )
        .withColumn(
            "click_us",
            F.last(
                F.when(F.col("side") == 0, F.col("t_us")), ignorenulls=True
            ).over(w),
        )
        .filter(F.col("side") == 1)
    )
    fresh = F.col("click_us").isNotNull() & (
        F.col("t_us") - F.col("click_us") <= _J14_TOL_US
    )
    return filled.select(
        "event_id",
        "user_id",
        F.col("t_us").alias("p_us"),
        "value",
        F.when(fresh, F.col("last_click_value")).alias("last_click_value"),
        F.when(fresh, F.col("t_us") - F.col("click_us"))
        .cast("long")
        .alias("staleness_us"),
    )
