#!/usr/bin/env python
"""Dump explain('formatted') for the given registry queries.

Usage: python plans/r19/capture_plans.py <suffix> <sf_dir> <name> [...]
Writes plans/r19/<name>_<suffix>.txt
"""
from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
)

from update_database_by_wind_spark.registry import REGISTRY
from update_database_by_wind_spark.session import get_session
import update_database_by_wind_spark.operators  # noqa: F401

suffix, sf_dir = sys.argv[1], sys.argv[2]
names = sys.argv[3:]
spark = get_session(app_name="r19-plans", shuffle_partitions=16)
spark.sparkContext.setLogLevel("ERROR")
here = os.path.dirname(os.path.abspath(__file__))
for name in names:
    df = REGISTRY[name].fn(spark, sf_dir)
    txt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    out = os.path.join(here, f"{name}_{suffix}.txt")
    with open(out, "w") as fh:
        fh.write(txt)
    print("wrote", out)
