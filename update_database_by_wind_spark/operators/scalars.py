"""Projection, filtering, and scalar-function coverage
(SURVEY.md §2.2 P1–P5 and §2.7 string/date/math/null/json/hash).

Engine-parity rules baked into these queries (probed empirically —
see tests and the verify skill):

* never CAST double→int bare (Spark truncates, DuckDB rounds) — go
  through FLOOR/ROUND first;
* DuckDB ``dayofweek`` is 0-based Sunday, Spark 1-based Sunday —
  align with +1 on the DuckDB side;
* derived integer parts (year/month/…) are INT in Spark, BIGINT in
  DuckDB — CAST the oracle to INTEGER;
* never emit DATE-typed result columns (pandas dtype mismatch) —
  cast day grains to TIMESTAMP;
* libm transcendentals (ln/exp) can differ by 1 ULP between JVM and
  DuckDB — round them; sqrt/pow/abs are IEEE-exact and safe raw;
* ROUND(x, n) half-way behavior differs between engines — use the
  portable FLOOR(x*10^n + 0.5)/10^n when exact halves can occur.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from update_database_by_wind_spark.functions.numeric import dec_sum, sql_dec_sum
from update_database_by_wind_spark.registry import query
from update_database_by_wind_spark.sources import load

# --- P1/P2: projection + predicate kitchen sink ---------------------------

_P2_ORACLE = f"""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       {sql_dec_sum('o_totalprice', 'total_price')}
FROM orders
WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                      AND TIMESTAMP '1997-12-31 00:00:00'
  AND o_orderstatus IN ('F', 'O')
  AND o_orderpriority LIKE '%-%'
  AND o_orderpriority NOT LIKE '4%'
  AND o_totalprice IS NOT NULL
  AND (o_totalprice > 150000.0 OR o_custkey % 10 = 3)
GROUP BY o_orderpriority
"""


@query("p2_filter_kitchen_sink", oracle=_P2_ORACLE, tags=("filter",))
def p2_filter_kitchen_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P2: BETWEEN / IN / LIKE / NOT LIKE / IS NOT NULL / boolean
    combos — all pushed into the parquet scan where possible."""
    o = load(spark, sf_dir, "orders")
    return (
        o.filter(
            F.col("o_orderdate").between(
                F.lit("1996-01-01").cast("timestamp"),
                F.lit("1997-12-31").cast("timestamp"),
            )
            & F.col("o_orderstatus").isin("F", "O")
            & F.col("o_orderpriority").like("%-%")
            & ~F.col("o_orderpriority").like("4%")
            & F.col("o_totalprice").isNotNull()
            & ((F.col("o_totalprice") > 150000.0) | (F.col("o_custkey") % 10 == 3))
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            dec_sum("o_totalprice", "total_price"),
        )
    )


# --- P3/P5: CASE WHEN + explicit casts -------------------------------------

_P3_ORACLE = """
SELECT price_tier,
       CAST(FLOOR(o_totalprice / 1000.0) AS BIGINT) % 10 AS bucket_digit,
       COUNT(*) AS n
FROM (
  SELECT o_totalprice,
         CASE WHEN o_totalprice >= 300000 THEN 'high'
              WHEN o_totalprice >= 100000 THEN 'mid'
              ELSE 'low' END AS price_tier
  FROM orders
)
GROUP BY price_tier, bucket_digit
"""


@query("p3_case_when_tiers", oracle=_P3_ORACLE, tags=("filter",))
def p3_case_when_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3+P5: CASE WHEN derivation + FLOOR-then-cast (bare double→int
    casts are engine-divergent; FLOOR first is portable)."""
    o = load(spark, sf_dir, "orders")
    tier = (
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
    )
    return (
        o.select(
            tier.alias("price_tier"),
            (F.floor(F.col("o_totalprice") / 1000.0).cast("long") % 10).alias(
                "bucket_digit"
            ),
        )
        .groupBy("price_tier", "bucket_digit")
        .agg(F.count("*").alias("n"))
    )


# --- string functions --------------------------------------------------------

_FSTR_ORACLE = """
SELECT
  UPPER(SUBSTRING(p_type, 1, 5)) AS type_prefix,
  LOWER(p_brand) AS brand_lower,
  CAST(LENGTH(p_name) AS INTEGER) AS name_len,
  CAST(LENGTH(TRIM(p_name)) AS INTEGER) AS name_len_trim,
  REPLACE(p_brand, 'Brand#', 'B') AS brand_short,
  CONCAT_WS('|', p_brand, p_type) AS brand_type,
  split_part(p_type, ' ', 1) AS type_first_word,
  regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
  CASE WHEN p_name LIKE '%al%' THEN 1 ELSE 0 END AS has_al,
  COUNT(*) AS n
FROM part
GROUP BY 1,2,3,4,5,6,7,8,9
"""


@query("f_string_functions", oracle=_FSTR_ORACLE, tags=("scalar", "string"))
def f_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 string family: upper/lower/substr/length/trim/replace/
    concat_ws/split/regexp_extract/like — the reference's security-code
    normalization surface (e.g. '000001.SZ' suffix handling)."""
    p = load(spark, sf_dir, "part")
    return (
        p.select(
            F.upper(F.substring("p_type", 1, 5)).alias("type_prefix"),
            F.lower("p_brand").alias("brand_lower"),
            F.length("p_name").alias("name_len"),
            F.length(F.trim("p_name")).alias("name_len_trim"),
            F.replace(F.col("p_brand"), F.lit("Brand#"), F.lit("B")).alias(
                "brand_short"
            ),
            F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
            F.split(F.col("p_type"), " ").getItem(0).alias("type_first_word"),
            F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
            F.when(F.col("p_name").like("%al%"), 1).otherwise(0).alias("has_al"),
        )
        .groupBy(
            "type_prefix",
            "brand_lower",
            "name_len",
            "name_len_trim",
            "brand_short",
            "brand_type",
            "type_first_word",
            "brand_num",
            "has_al",
        )
        .agg(F.count("*").alias("n"))
    )


# --- date/time functions ------------------------------------------------------

_FDATE_ORACLE = """
SELECT
  CAST(year(o_orderdate) AS INTEGER) AS yr,
  CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
  CAST(month(o_orderdate) AS INTEGER) AS mo,
  CAST(day(o_orderdate) AS INTEGER) AS dom,
  CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP_NS) AS month_start,
  CAST(last_day(o_orderdate) AS TIMESTAMP_NS) AS month_end,
  CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP_NS) AS plus3m,
  CAST(datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INTEGER)
    AS days_since_epoch_start,
  COUNT(*) AS n
FROM orders
WHERE o_orderkey % 37 = 0
GROUP BY 1,2,3,4,5,6,7,8,9
"""


@query("f_datetime_functions", oracle=_FDATE_ORACLE, tags=("scalar", "datetime"))
def f_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 date/time family — trade-date arithmetic (year/quarter/
    month/day/dow, date_trunc, last_day, add_months, datediff)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 37 == 0)
    return (
        o.select(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.quarter("o_orderdate").cast("int").alias("qtr"),
            F.month("o_orderdate").cast("int").alias("mo"),
            F.dayofmonth("o_orderdate").cast("int").alias("dom"),
            F.dayofweek("o_orderdate").cast("int").alias("dow"),
            F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
            F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
            F.add_months("o_orderdate", 3).cast("timestamp").alias("plus3m"),
            F.datediff(
                F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
            )
            .cast("int")
            .alias("days_since_epoch_start"),
        )
        .groupBy(
            "yr",
            "qtr",
            "mo",
            "dom",
            "dow",
            "month_start",
            "month_end",
            "plus3m",
            "days_since_epoch_start",
        )
        .agg(F.count("*").alias("n"))
    )


# --- math + null-handling functions -------------------------------------------

_FMATH_ORACLE = """
SELECT
  l_orderkey, l_linenumber,
  FLOOR(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) / 100.0 AS net_price,
  ABS(l_extendedprice - 30000.0) AS dist_from_30k,
  SQRT(l_extendedprice) AS sqrt_price,
  ROUND(LN(l_extendedprice), 6) AS ln_price,
  ROUND(EXP(l_discount), 6) AS exp_disc,
  POW(1.0 + l_tax, 2) AS tax_sq,
  GREATEST(l_discount, l_tax) AS max_rate,
  LEAST(l_discount, l_tax) AS min_rate,
  CAST(SIGN(l_discount - l_tax) AS DOUBLE) AS rate_sign,
  COALESCE(NULLIF(l_discount, 0.0), -1.0) AS disc_or_sentinel
FROM lineitem
WHERE l_orderkey % 251 = 0
"""


@query("f_math_null_functions", oracle=_FMATH_ORACLE, tags=("scalar", "math"))
def f_math_null_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 math + null families: abs/sqrt/ln/exp/pow/greatest/least/
    sign, coalesce/nullif.  Parity notes: ln/exp differ by 1 ULP on
    some inputs → rounded to 6; ROUND(x, 2) half-way semantics differ
    between engines → portable FLOOR(x*100+0.5)/100 instead (pure IEEE
    ops, bit-identical); DuckDB SIGN is integer-typed → cast."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 251 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0
                + 0.5
            )
            / 100.0
        ).alias("net_price"),
        F.abs(F.col("l_extendedprice") - 30000.0).alias("dist_from_30k"),
        F.sqrt("l_extendedprice").alias("sqrt_price"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_price"),
        F.round(F.exp("l_discount"), 6).alias("exp_disc"),
        F.pow(F.lit(1.0) + F.col("l_tax"), 2).alias("tax_sq"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        F.signum(F.col("l_discount") - F.col("l_tax")).alias("rate_sign"),
        F.coalesce(F.nullif(F.col("l_discount"), F.lit(0.0)), F.lit(-1.0)).alias(
            "disc_or_sentinel"
        ),
    )


# --- JSON extraction (events.props) ---------------------------------------------

_FJSON_ORACLE = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT)
         AS sum_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER)
         AS max_k,
       CAST(COUNT(json_extract_string(props, '$.k')) AS BIGINT) AS n_with_k
FROM events
GROUP BY event_type
"""


@query("f_json_extraction", oracle=_FJSON_ORACLE, tags=("scalar", "json"))
def f_json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 json family: from_json typed extraction over the events
    JSON props column (FIXTURES.md shape {"k": int})."""
    ev = load(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k INT").getField("k")
    return ev.groupBy("event_type").agg(
        F.sum(k).cast("long").alias("sum_k"),
        F.max(k).cast("int").alias("max_k"),
        F.count(k).alias("n_with_k"),
    )


# --- hash functions ---------------------------------------------------------------

_FHASH_ORACLE = """
SELECT doc_id,
       md5(text) AS text_md5,
       sha256(text) AS text_sha256,
       CAST(LENGTH(md5(text)) AS INTEGER) AS md5_len
FROM documents
WHERE doc_id % 7 = 0
"""


@query("f_hash_functions", oracle=_FHASH_ORACLE, tags=("scalar", "hash"))
def f_hash_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 hash family: md5 / sha2-256 — the content-hash primitives
    the dedup operators build on (L2)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.length(F.md5("text")).alias("md5_len"),
    )


# --- try_* ANSI-safe arithmetic family -------------------------------------------

_HUGE = 9223372036854775000  # BIGINT overflow for keys > 807

_FTRY_ORACLE = f"""
SELECT l_returnflag,
       MIN((l_extendedprice * l_discount) / NULLIF(l_quantity - 25.0, 0))
         AS min_guarded_ratio,
       MAX((l_extendedprice * l_discount) / NULLIF(l_quantity - 25.0, 0))
         AS max_guarded_ratio,
       CAST(SUM(CASE WHEN l_quantity = 25.0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_zero_denominators,
       CAST(SUM(CASE WHEN l_orderkey > {9223372036854775807 - _HUGE}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_overflows
FROM lineitem
GROUP BY l_returnflag
"""


@query("f_try_functions", oracle=_FTRY_ORACLE, tags=("scalar", "ansi"))
def f_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 try_* family: Spark 4 runs ANSI mode, where x/0 and BIGINT
    overflow are runtime errors — try_divide/try_add turn them into
    NULLs, the semantics a bulk pipeline wants (quarantine bad rows,
    don't kill the job).  The oracle mirrors with NULLIF/CASE guards;
    the NULL counts prove both failure modes actually fire on this
    data rather than the happy path alone.  Ratio extremes (min/max)
    are order-independent per-row doubles — no decimal rounding, so
    no half-way-tie divergence between engines."""
    li = load(spark, sf_dir, "lineitem")
    ratio = F.try_divide(
        F.col("l_extendedprice") * F.col("l_discount"),
        F.col("l_quantity") - 25.0,
    )
    overflowed = F.try_add(F.col("l_orderkey"), F.lit(_HUGE)).isNull()
    return li.groupBy("l_returnflag").agg(
        F.min(ratio).alias("min_guarded_ratio"),
        F.max(ratio).alias("max_guarded_ratio"),
        F.sum(F.when(ratio.isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_zero_denominators"),
        F.sum(F.when(overflowed, 1).otherwise(0)).cast("long").alias(
            "n_overflows"
        ),
    )


# --- VARIANT: Spark 4 semi-structured type over the JSON props column ---------

_FVARIANT_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER))
            AS BIGINT) AS sum_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER))
            AS INTEGER) AS max_k,
       CAST(SUM(CASE WHEN json_extract_string(props, '$.missing') IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
FROM events
WHERE event_id % 6 = 2
GROUP BY event_type
"""


@query("f_variant_json", oracle=_FVARIANT_ORACLE, tags=("scalar", "variant"))
def f_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-variant: Spark 4's VARIANT type as the semi-structured path —
    ``parse_json`` once into a binary variant, then typed
    ``variant_get`` extractions (no per-access re-parse, unlike
    get_json_object; the open-format answer to shredded JSON columns).
    A missing path returns NULL rather than erroring, counted to pin
    that semantic.  At 100 TB the parse is a single codegen'd pass and
    the variant column prunes/pushes like any other binary column."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") % 6 == 2)
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    missing = F.expr("variant_get(parse_json(props), '$.missing', 'string')")
    return (
        ev.select("event_type", k.alias("k"), missing.alias("m"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("k").cast("long").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.sum(F.when(F.col("m").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_missing"),
        )
    )
