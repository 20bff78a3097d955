"""Pipeline observability via df.observe (Observation API).

A 100 TB pipeline needs in-flight metrics (rows read, revenue summed,
null counts) without a second pass over the data; ``df.observe``
attaches accumulator-backed metrics to the existing plan so they come
for free with the action.  This test proves the plumbing works on the
flagship query shape and that the observed values agree with an
explicit recount.
"""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from update_database_by_wind_spark.sources import load


def test_observe_metrics_on_pricing_pipeline(spark, sf_smoke):
    li = load(spark, sf_smoke, "lineitem")
    obs = Observation("pricing_input")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("rows_read"),
        F.sum(F.col("l_quantity").cast("decimal(38,6)"))
        .cast("double")
        .alias("qty_total"),
        F.count(F.when(F.col("l_discount").isNull(), 1)).alias("null_discounts"),
    )
    out = (
        observed.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    metrics = obs.get
    assert metrics["rows_read"] == li.count() == sum(r["n"] for r in out)
    expected_qty = (
        li.agg(
            F.sum(F.col("l_quantity").cast("decimal(38,6)"))
            .cast("double")
            .alias("s")
        ).collect()[0]["s"]
    )
    assert metrics["qty_total"] == expected_qty
    assert metrics["null_discounts"] == 0
