#!/usr/bin/env python
"""Capture explain('formatted') for a list of registry queries (no
execution beyond analysis). Usage:
  python plans/r18/capture_plans.py <sf_dir> <suffix> [names...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from update_database_by_wind_spark.registry import REGISTRY
from update_database_by_wind_spark.session import get_session
from update_database_by_wind_spark.plans.explain import formatted_plan
import update_database_by_wind_spark.operators  # noqa: F401

import bench

OUT_DIR = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    sf_dir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:] or (bench.HEADLINE + bench.EXTENDED)
    spark = get_session(app_name="r18-plans", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            with open(os.path.join(OUT_DIR, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(formatted_plan(df))
            print("ok", name)
        except Exception as exc:  # noqa: BLE001
            print("ERR", name, repr(exc)[:200])


if __name__ == "__main__":
    main()
