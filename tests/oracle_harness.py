"""Local mirror of the driver's DuckDB-oracle comparison.

The driver (per __spark_entry__ docstring) compares each Spark query
against its oracle SQL on row-count + schema + order-insensitive
value-hash, sorting columns by name.  This mirror is *stricter*: it
canonicalizes every cell to a string (exact float repr — a superset of
any hash comparison) and diffs the sorted frames, so a query passing
here passes any value-hash the driver computes, while mismatches show
the offending cells instead of just a hash.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

from update_database_by_wind_spark.sources import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    import os

    con = duckdb.connect()
    try:
        for t in TABLES:
            # generated corpora (test_generative_oracle) carry a subset
            # of the fixture tables; DuckDB binds views eagerly
            if os.path.exists(f"{sf_dir}/{t}.parquet"):
                con.sql(
                    f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
                )
        return con.sql(sql).df()
    finally:
        con.close()


def _canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NULL"
        return repr(f)
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return "NULL"
        return v.isoformat()
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    if v is pd.NaT or (isinstance(v, float) and pd.isna(v)):
        return "NULL"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    out = pd.DataFrame(
        {c: df[c].map(_canon_cell) for c in sorted(df.columns)}
    )
    if len(out):
        out = out.sort_values(list(out.columns), kind="mergesort").reset_index(
            drop=True
        )
    return out


def compare(spark_df, oracle_pd: pd.DataFrame) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = pass)."""
    spark_pd = spark_df.toPandas()
    problems: list[str] = []
    if sorted(spark_pd.columns) != sorted(oracle_pd.columns):
        problems.append(
            f"column names differ: spark={sorted(spark_pd.columns)} "
            f"oracle={sorted(oracle_pd.columns)}"
        )
        return problems
    if len(spark_pd) != len(oracle_pd):
        problems.append(f"row count: spark={len(spark_pd)} oracle={len(oracle_pd)}")
    # dtype parity: a strict driver-side schema compare would flag e.g.
    # int32 rank columns vs DuckDB's int64, or ns vs µs timestamps —
    # hold every pair to exact pandas-dtype equality
    for c in sorted(spark_pd.columns):
        a, b = str(spark_pd[c].dtype), str(oracle_pd[c].dtype)
        if a != b:
            problems.append(f"dtype {c!r}: spark={a} oracle={b}")
    a, b = canonicalize(spark_pd), canonicalize(oracle_pd)
    if len(a) == len(b) and not a.equals(b):
        neq = (a != b)
        bad_cols = [c for c in a.columns if neq[c].any()]
        for c in bad_cols[:5]:
            idx = neq[c].idxmax()
            problems.append(
                f"col {c!r} first diff at sorted-row {idx}: "
                f"spark={a[c][idx]!r} oracle={b[c][idx]!r} "
                f"({int(neq[c].sum())} differing rows)"
            )
    elif len(a) != len(b):
        pass  # row-count problem already recorded
    return problems
