#!/usr/bin/env python
"""Round-18 optimization measurement harness (guide §1).

Times every benched query (HEADLINE + EXTENDED) three ways on the
bench session config and captures its formatted physical plan:

  * build_s  — Python-side DataFrame construction + analysis time
               (REGISTRY[name].fn call, no action) — part of the
               bench's per-pass cost since _timed_min rebuilds the
               DataFrame each pass.
  * count_s  — min of 2 of df.count() (the bench statistic).
  * noop_s   — min of 2 of noop-sink write (guide §1.4: every column
               of every row materialized) — isolates computation from
               the count()-pruned variant.

Usage: python plans/r18/measure.py <sf_dir> <out_suffix> [names...]
Writes plans/r18/<name>_<out_suffix>.txt and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from update_database_by_wind_spark.registry import REGISTRY
from update_database_by_wind_spark.session import get_session
from update_database_by_wind_spark.sources import load
from update_database_by_wind_spark.plans.explain import formatted_plan
import update_database_by_wind_spark.operators  # noqa: F401

import bench

OUT_DIR = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    sf_dir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:] or (bench.HEADLINE + bench.EXTENDED)

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_session(app_name="r18-measure", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in names:
        REGISTRY[name].fn(spark, warm_dir).count()

    for t in bench._REF_TABLES:
        load(spark, sf_dir, t).cache().count()

    results: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"r18-measure:{name}")
        # untimed warm pass at target scale (bench convention)
        REGISTRY[name].fn(spark, sf_dir).count()

        t0 = time.perf_counter()
        df = REGISTRY[name].fn(spark, sf_dir)
        df.schema  # force analysis
        build_s = time.perf_counter() - t0

        with open(os.path.join(OUT_DIR, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(formatted_plan(df))

        count_s = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, sf_dir).count()
            count_s = min(count_s, time.perf_counter() - t0)

        noop_s = float("inf")
        # warm the noop path once (different plan tail than count)
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        for _ in range(2):
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            noop_s = min(noop_s, time.perf_counter() - t0)

        results[name] = {
            "build_s": round(build_s, 3),
            "count_s": round(count_s, 3),
            "noop_s": round(noop_s, 3),
        }
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({"sf_dir": sf_dir, "suffix": suffix, "results": results}))


if __name__ == "__main__":
    main()
