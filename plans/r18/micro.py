#!/usr/bin/env python
"""Round-18 micro-benchmarks: quantify the fixed per-query costs and
candidate per-task costs before touching any operator (guide §1.2).

  python plans/r18/micro.py <sf_dir>

Prints one JSON line with:
  decimal_vs_double — lineitem-wide sum timed with dec_sum vs plain
                      double sum vs long-unscaled sum (min of 3).
  rdd_probe         — cost of df.rdd.getNumPartitions() on a parquet
                      scan (what fan_out/ngram_jaccard_pairs pay per
                      DataFrame build).
  prepare_cost      — cost of session.prepare() (per-load py4j confs).
  build             — per-headline-query DataFrame build+analysis time.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from update_database_by_wind_spark.functions.numeric import dec_sum
from update_database_by_wind_spark.registry import REGISTRY
from update_database_by_wind_spark.session import get_session, prepare
from update_database_by_wind_spark.sources import load
import update_database_by_wind_spark.operators  # noqa: F401

import bench


def _min3(f) -> float:
    f()  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        f()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main() -> None:
    sf_dir = sys.argv[1]
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_session(app_name="r18-micro", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    li = load(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))

    out: dict = {"sf_dir": sf_dir}
    out["decimal_vs_double"] = {
        "dec_sum": _min3(
            lambda: li.groupBy("l_returnflag").agg(dec_sum(disc, "s")).count()
        ),
        "double_sum": _min3(
            lambda: li.groupBy("l_returnflag").agg(F.sum(disc).alias("s")).count()
        ),
        "dec18_sum": _min3(
            lambda: li.groupBy("l_returnflag")
            .agg(F.sum(disc.cast("decimal(18,6)")).alias("s"))
            .count()
        ),
        "long_unscaled_sum": _min3(
            lambda: li.groupBy("l_returnflag")
            .agg(F.sum(F.round(disc * 1e6).cast("long")).alias("s"))
            .count()
        ),
    }

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    out["rdd_probe"] = _min3(lambda: docs.rdd.getNumPartitions())
    out["prepare_cost"] = _min3(lambda: prepare(spark))
    out["load_cost"] = _min3(lambda: load(spark, sf_dir, "lineitem"))

    build: dict = {}
    for name in bench.HEADLINE:
        REGISTRY[name].fn(spark, sf_dir).count()  # warm everything

        def _b(n=name):
            df = REGISTRY[n].fn(spark, sf_dir)
            df.schema

        build[name] = _min3(_b)
    out["build"] = build

    print(json.dumps(out))


if __name__ == "__main__":
    main()
