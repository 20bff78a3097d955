"""Order-independent, engine-identical numeric aggregates.

Problem: the driver hash-compares our Spark results against a DuckDB
oracle (value-hash, __spark_entry__ docstring).  ``SUM(double)`` is
order-dependent — Spark sums partials per shuffle partition in
whatever order tasks finish, DuckDB sums in its own order, so the last
few ULPs can differ; worse, the *driver's* session config (partition
count) can differ from the local test session, so "passes locally"
would not imply "passes in the driver".

Fix: do per-row arithmetic in IEEE double (bit-identical across
engines), then cast the per-row result to DECIMAL for the *sum*
(exact, associative, order-independent), then cast the exact total
back to double.  Both engines correctly-round the same binary double
to the same decimal, and decimal addition is exact, so the final
double is bit-identical no matter the partitioning.  The fixture
money columns are 2-decimal values (FIXTURES.md), so scale 6 gives
ample headroom.

At 100 TB this also matters for *re-runs*: a metric that changes with
partition count breaks idempotence checks; decimal-summed metrics are
stable across cluster sizes.

``dec_sum``/``dec_avg`` (and their SQL twins ``sql_dec_sum``/
``sql_dec_avg``) are used by every money/quantity aggregate in
operators/.  Variance/stddev/corr are built from decimal power sums in
``dec_var``-family helpers so those too are order-independent.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 38 total digits; scale 6 leaves 32 integer digits — sums of 2-decimal
# money values over ~1e12 rows stay exact.
PREC, SCALE = 38, 6

# Second-moment statistics are rounded to this many decimals: the huge
# exact power sums exceed 17 significant digits, so the decimal→double
# CAST itself can differ by 1 ULP between engines (Java BigDecimal vs
# DuckDB int128 path); rounding the ~1e-15-relative-error result makes
# both engines agree.
STAT_ROUND = 6


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dec_sum(c: str | Column, alias: str) -> Column:
    """Exact order-independent SUM(double) → double.

    String inputs (a column name or any SQL expression) take the
    single-call ``F.expr`` path: composing the same tree out of Column
    methods costs ~5 py4j round trips per aggregate (~1-2 ms each),
    which measured as the single largest *build-time* item of the
    flagship a1 query — 8 aggregates ≈ 110 ms per DataFrame build
    (plans/r18 micro-profiles, round 18).  The parsed tree is the
    identical expression, so plans and results are unchanged."""
    if isinstance(c, str):
        return F.expr(sql_dec_sum(c, alias))
    return (
        F.sum(_col(c).cast(f"decimal({PREC},{SCALE})")).cast("double").alias(alias)
    )


def sql_dec_sum_expr(expr: str) -> str:
    """Alias-free form of :func:`sql_dec_sum`, for embedding inside a
    larger expression (same rationale as :func:`sql_dec_avg_expr`)."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL({PREC},{SCALE}))) AS DOUBLE)"


def sql_dec_sum(expr: str, alias: str) -> str:
    return f"{sql_dec_sum_expr(expr)} AS {alias}"


def dec_avg(c: str | Column, alias: str) -> Column:
    """Exact-sum / count, division done in double (deterministic).

    String inputs take the one-call ``F.expr`` path (see dec_sum);
    ``COUNT(expr)`` counts exactly the non-null rows the Column path's
    ``count(when(isNotNull, 1))`` counts."""
    if isinstance(c, str):
        return F.expr(sql_dec_avg(c, alias))
    col = _col(c)
    total = F.sum(col.cast(f"decimal({PREC},{SCALE})")).cast("double")
    n = F.count(F.when(col.isNotNull(), F.lit(1)))
    return (total / n).alias(alias)


def sql_dec_avg_expr(expr: str) -> str:
    """Alias-free form of :func:`sql_dec_avg`, for embedding inside a
    larger expression (e.g. under a ROUND(...)).  Callers used to strip
    the alias off ``sql_dec_avg`` with ``.replace(' AS x', '')`` —
    string surgery that would silently produce broken SQL if the alias
    formatting ever changed (round-5 advisor finding)."""
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL({PREC},{SCALE}))) AS DOUBLE)"
        f" / COUNT({expr})"
    )


def sql_dec_avg(expr: str, alias: str) -> str:
    return f"{sql_dec_avg_expr(expr)} AS {alias}"


# --- second-moment statistics from exact power sums -----------------
# var_samp = (S2 - S1^2/n) / (n-1), computed in double from exact
# decimal S1, S2 → order-independent and identical across engines.


def _s1_s2(c: str | Column) -> tuple[Column, Column, Column]:
    col = _col(c)
    s1 = F.sum(col.cast(f"decimal({PREC},{SCALE})")).cast("double")
    s2 = F.sum((col * col).cast(f"decimal({PREC},{SCALE})")).cast("double")
    n = F.count(F.when(col.isNotNull(), F.lit(1))).cast("double")
    return s1, s2, n


def dec_var_samp(c: str | Column, alias: str) -> Column:
    # NULLIF(n-1): sample variance of a single row is NULL, not an
    # ANSI divide-by-zero (Spark 4 errors even on double division)
    s1, s2, n = _s1_s2(c)
    return F.round(
        (s2 - s1 * s1 / n) / F.nullif(n - F.lit(1.0), F.lit(0.0)), STAT_ROUND
    ).alias(alias)


def sql_dec_var_samp(expr: str, alias: str) -> str:
    s1 = f"CAST(SUM(CAST(({expr}) AS DECIMAL({PREC},{SCALE}))) AS DOUBLE)"
    s2 = f"CAST(SUM(CAST((({expr})*({expr})) AS DECIMAL({PREC},{SCALE}))) AS DOUBLE)"
    n = f"CAST(COUNT({expr}) AS DOUBLE)"
    return (
        f"ROUND((({s2}) - ({s1})*({s1})/({n})) / NULLIF(({n}) - 1.0, 0),"
        f" {STAT_ROUND}) AS {alias}"
    )


def dec_stddev_samp(c: str | Column, alias: str) -> Column:
    s1, s2, n = _s1_s2(c)
    return F.round(
        F.sqrt((s2 - s1 * s1 / n) / F.nullif(n - F.lit(1.0), F.lit(0.0))),
        STAT_ROUND,
    ).alias(alias)


def sql_dec_stddev_samp(expr: str, alias: str) -> str:
    s1 = f"CAST(SUM(CAST(({expr}) AS DECIMAL({PREC},{SCALE}))) AS DOUBLE)"
    s2 = f"CAST(SUM(CAST((({expr})*({expr})) AS DECIMAL({PREC},{SCALE}))) AS DOUBLE)"
    n = f"CAST(COUNT({expr}) AS DOUBLE)"
    return (
        f"ROUND(SQRT((({s2}) - ({s1})*({s1})/({n})) / NULLIF(({n}) - 1.0, 0)),"
        f" {STAT_ROUND}) AS {alias}"
    )


def dec_corr(x: str | Column, y: str | Column, alias: str) -> Column:
    """Pearson corr from exact power sums (population formula cancels n)."""
    cx, cy = _col(x), _col(y)
    sx = F.sum(cx.cast(f"decimal({PREC},{SCALE})")).cast("double")
    sy = F.sum(cy.cast(f"decimal({PREC},{SCALE})")).cast("double")
    sxx = F.sum((cx * cx).cast(f"decimal({PREC},{SCALE})")).cast("double")
    syy = F.sum((cy * cy).cast(f"decimal({PREC},{SCALE})")).cast("double")
    sxy = F.sum((cx * cy).cast(f"decimal({PREC},{SCALE})")).cast("double")
    n = F.count(F.lit(1)).cast("double")
    num = n * sxy - sx * sy
    # NULLIF: zero variance on either side → NULL corr, not a crash
    den = F.nullif(
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy), F.lit(0.0)
    )
    return F.round(num / den, STAT_ROUND).alias(alias)


def sql_dec_corr(x: str, y: str, alias: str) -> str:
    def dsum(e: str) -> str:
        return f"CAST(SUM(CAST(({e}) AS DECIMAL({PREC},{SCALE}))) AS DOUBLE)"

    sx, sy = dsum(x), dsum(y)
    sxx, syy, sxy = dsum(f"({x})*({x})"), dsum(f"({y})*({y})"), dsum(f"({x})*({y})")
    n = "CAST(COUNT(*) AS DOUBLE)"
    return (
        f"ROUND((({n})*({sxy}) - ({sx})*({sy}))"
        f" / NULLIF(SQRT(({n})*({sxx}) - ({sx})*({sx}))"
        f" * SQRT(({n})*({syy}) - ({sy})*({sy})), 0), {STAT_ROUND}) AS {alias}"
    )
