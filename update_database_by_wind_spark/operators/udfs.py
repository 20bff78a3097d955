"""Python UDF surface (SURVEY.md §2.11 UD2/UD3/UD4).

Policy (§2.11): UDFs are the slow path — every operator that CAN be a
built-in composition IS one (see joins.py J8).  These queries exist to
exercise the Arrow-vectorized escape hatches the engine offers for
semantics Spark genuinely lacks, and each is oracle-checked so the
UDF path is held to the same correctness bar as the built-ins.

Scale notes: all three shapes here are Arrow-batched (pandas_udf /
applyInPandas), never row-at-a-time Python.  applyInPandas shuffles
by the grouping key and materializes ONE GROUP per pandas frame —
safe for per-user event history (thousands of rows), fatal for a
whole-table group; the grouping key must be high-cardinality.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from update_database_by_wind_spark.operators.joins import _J8_ORACLE
from update_database_by_wind_spark.registry import query
from update_database_by_wind_spark.sources import load

# --- UD4: applyInPandas as-of join (pd.merge_asof per key) ----------------

_ASOF_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("last_click_value", DoubleType()),
    ]
)


def _asof_one_user(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-user pd.merge_asof (backward, exact matches allowed)."""
    probes = (
        pdf[pdf["side"] == 1][["event_id", "user_id", "ts", "value"]]
        .sort_values("ts", kind="mergesort")
    )
    builds = (
        pdf[pdf["side"] == 0][["ts", "click_value"]]
        .sort_values("ts", kind="mergesort")
    )
    if probes.empty:
        return pd.DataFrame(
            {f.name: pd.Series(dtype="object") for f in _ASOF_SCHEMA.fields}
        )
    if builds.empty:
        out = probes.copy()
        out["last_click_value"] = None
        return out
    out = pd.merge_asof(
        probes, builds, on="ts", direction="backward", allow_exact_matches=True
    )
    return out.rename(columns={"click_value": "last_click_value"})


@query("j8b_asof_join_pandas", oracle=_J8_ORACLE, tags=("join", "asof", "udf"))
def j8b_asof_join_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 strategy (b): the same as-of join as j8_asof_join_last_click
    but via applyInPandas + pd.merge_asof per user — the fallback for
    as-of semantics the window rewrite can't express (e.g. nearest
    within tolerance).  Checked against the identical DuckDB ASOF
    oracle, so both strategies are proven equivalent."""
    events = load(spark, sf_dir, "events")
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
        .select(
            "user_id",
            "ts",
            "click_value",
            F.lit(0).alias("side"),
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("double").alias("value"),
        )
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("double").alias("click_value"),
        F.lit(1).alias("side"),
        "event_id",
        "value",
    )
    return (
        clicks.unionByName(purchases)
        .groupBy("user_id")
        .applyInPandas(_asof_one_user, schema=_ASOF_SCHEMA)
    )


# --- UD3: grouped-aggregate pandas_udf --------------------------------------

_UD3_ORACLE = """
SELECT l_returnflag,
       MAX(l_extendedprice) - MIN(l_extendedprice) AS price_range,
       MAX(l_quantity) - MIN(l_quantity) AS qty_range
FROM lineitem
GROUP BY l_returnflag
"""


@query("ud3_pandas_grouped_agg", oracle=_UD3_ORACLE, tags=("agg", "udf"))
def ud3_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UD3: GROUPED_AGG pandas_udf (Arrow partial aggregation).  The
    statistic (max−min range) is order-independent so the Python path
    hash-matches the SQL oracle exactly."""

    @F.pandas_udf("double")
    def prange(v: pd.Series) -> float:
        return float(v.max() - v.min())

    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        prange("l_extendedprice").alias("price_range"),
        prange("l_quantity").alias("qty_range"),
    )


# --- UD2: vectorized scalar pandas_udf ---------------------------------------

_UD2_ORACLE = """
SELECT l_orderkey, l_linenumber,
       FLOOR(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) / 100.0
         AS net_price_udf
FROM lineitem
WHERE l_orderkey % 97 = 0
"""


@query("ud2_pandas_scalar_udf", oracle=_UD2_ORACLE, tags=("scalar", "udf"))
def ud2_pandas_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UD2: Arrow-vectorized scalar pandas_udf (numpy kernel).  The
    kernel mirrors the portable half-up rounding used JVM-side, so
    the Python and SQL paths agree bit-for-bit."""
    import numpy as np

    @F.pandas_udf("double")
    def net_price(price: pd.Series, disc: pd.Series) -> pd.Series:
        return pd.Series(
            np.floor(price.values * (1.0 - disc.values) * 100.0 + 0.5) / 100.0
        )

    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 97 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net_price("l_extendedprice", "l_discount").alias("net_price_udf"),
    )
