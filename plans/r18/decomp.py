#!/usr/bin/env python
"""Decompose each benched query's per-pass cost into:
  build_s — fn() + analysis (fresh DataFrame each time, as bench does)
  exec_s  — re-count() on the SAME DataFrame object (plan + codegen
            cached by Spark's QueryExecution) — pure job execution
  pass_s  — fn().count() fresh (what bench._timed_min actually times)

Usage: python plans/r18/decomp.py <sf_dir> [names...]
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
import update_database_by_wind_spark.operators  # noqa: F401

import bench


def _minN(f, n=3):
    f()
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:] or bench.HEADLINE
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_session(app_name="r18-decomp", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(warm_dir):
        for name in names:
            REGISTRY[name].fn(spark, warm_dir).count()
    for t in bench._REF_TABLES:
        load(spark, sf_dir, t).cache().count()
    for name in names:
        REGISTRY[name].fn(spark, sf_dir).count()

    out = {}
    for name in names:
        def _build(n=name):
            df = REGISTRY[n].fn(spark, sf_dir)
            df.schema

        build_s = _minN(_build)
        df = REGISTRY[name].fn(spark, sf_dir)
        df.count()
        exec_s = _minN(df.count)
        pass_s = _minN(lambda n=name: REGISTRY[n].fn(spark, sf_dir).count())
        out[name] = {
            "build_s": build_s,
            "exec_s": exec_s,
            "pass_s": pass_s,
        }
        print(name, out[name], flush=True)
    print(json.dumps({"sf_dir": sf_dir, "decomp": out}))


if __name__ == "__main__":
    main()
