"""Distributed exact order statistics — global rank / NTILE / running
sums WITHOUT a single-partition sort (SURVEY.md §4.2).

The problem: ``Window.orderBy(x)`` with no ``partitionBy`` plans
``Exchange SinglePartition`` + a full sort on one task — correct at any
cardinality, dead at 100 TB.  The round-11 verdict flagged the two
registry queries that used it at per-customer cardinality (e5's three
NTILE(5) scores, o8's descending running revenue sum) as the repo's
remaining scale-`weak` plans.

The fix implemented here is the classic two-phase distributed ranking
(the same shape TeraSort / Spark's own ``sortByKey`` use, specialised
to rank assignment):

1. **Boundary pass** — one ``percentile_approx`` aggregate picks
   ``n_buckets - 1`` split values.  ANY split set is CORRECT (it only
   affects balance); approx-quantile splits make the buckets roughly
   equal.  The splits are collected once to the driver (one row) and
   frozen as literals, so every downstream job classifies rows
   identically — no repartitionByRange re-sampling hazard.
2. **Count pass** — one map-side-combined aggregate counts rows (and
   optionally sums a measure) per bucket; collecting ``n_buckets``
   rows gives exact prefix offsets per bucket, plus exact global
   ``n`` / ``total`` as Python ints.
3. **Rank pass** — a window PARTITIONED BY the bucket (hash exchange,
   parallel across buckets) computes the local ``row_number`` /
   running sum; ``global = bucket_prefix_offset + local``.

Because the per-row order key carries a UNIQUE tiebreak column, the
resulting rank is total and deterministic under any partitioning —
bit-identical to the single-partition window it replaces, which is why
e5/o8 keep their original NTILE/running-sum oracles unchanged.

Scale contract: driver traffic is one row of splits plus ``n_buckets``
offset rows (metadata-sized); the only sorts are per-bucket.  Size
``n_buckets`` to the cluster (≈ tasks you want the sort spread over);
a hot single VALUE still lands in one bucket — the same tie mass any
exact ranking must order somewhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _bucket_expr(value_col: str, splits: list, *, descending: bool) -> Column:
    """Bucket index of ``value_col`` against frozen ``splits`` —
    ascending index 0 holds the smallest values; ``descending=True``
    mirrors the index so bucket 0 holds the LARGEST (bucket index must
    agree with the requested global order for prefix offsets to work).
    Splits are integer literals cast long so the comparison replays the
    column's exact int64 semantics.

    Deliberately a plain CASE chain, not a higher-order
    ``size(filter(array(...)))``: this column becomes a window
    PARTITION BY spec downstream, and a lambda expression there trips a
    Catalyst binding bug ([INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND] on the
    lambda's captured column — found by the ranks hypothesis
    property); a CASE chain is also whole-stage-codegen friendly."""
    if not splits:
        return F.lit(0)
    c = F.col(value_col)
    chain = None
    for i, b in enumerate(splits):
        cond = c < F.lit(int(b)).cast("long")
        chain = F.when(cond, i) if chain is None else chain.when(cond, i)
    asc = chain.otherwise(len(splits))
    return (F.lit(len(splits)) - asc) if descending else asc


def _approx_splits(
    df: DataFrame, value_cols: list[str], n_buckets: int
) -> dict[str, list]:
    """One aggregate job → per-column split values (deduped, sorted).
    Any split set is correct; approx quantiles make buckets balanced."""
    probs = [i / n_buckets for i in range(1, n_buckets)]
    row = df.select(
        *[
            F.percentile_approx(c, F.array(*[F.lit(p) for p in probs]), 10000)
            .alias(c)
            for c in value_cols
        ]
    ).first()
    out: dict[str, list] = {}
    for c in value_cols:
        vals = row[c] if row is not None and row[c] is not None else []
        out[c] = sorted(set(v for v in vals if v is not None))
    return out


def with_global_ranks(
    df: DataFrame,
    specs: list[dict],
    *,
    n_buckets: int | None = None,
) -> tuple[DataFrame, int]:
    """Attach exact global-order columns to ``df`` for every spec in
    one boundary job + one count job + per-spec bucket windows.

    Each spec is ``{"value": col, "key": unique_tiebreak_col,
    "rank": out_col}`` with optional ``"descending": True`` and
    ``"cum": (measure_col, out_col)`` for an inclusive running sum in
    the same order.  Returns ``(df_with_columns, n_rows)``; when a
    ``cum`` is requested the spec dict gains ``spec["total"]`` (exact
    Python int) as a side effect.

    All value/measure columns must be integer-typed (the repo's parity
    rule: order statistics run on exact int64 cents/micros, never
    doubles) and NON-NULL: a null value would land in the last bucket
    (the CASE chain's otherwise) while the in-bucket sort puts nulls
    first — callers rank aggregate outputs, which are never null.

    ``n_buckets`` defaults to 4× the cluster's default parallelism
    (clamped to [32, 1024]) — a FIXED bucket count would itself be a
    scale ceiling (each bucket is one task's sort).  Any bucket count
    yields identical results (the hypothesis property sweeps 1..64
    including more buckets than rows), so the default only tunes
    balance."""
    if n_buckets is None:
        par = df.sparkSession.sparkContext.defaultParallelism
        n_buckets = max(32, min(1024, par * 4))
    value_cols = [s["value"] for s in specs]
    splits = _approx_splits(df, value_cols, n_buckets)
    bcols = {s["rank"]: f"_bkt_{s['rank']}" for s in specs}
    staged = df
    for s in specs:
        staged = staged.withColumn(
            bcols[s["rank"]],
            _bucket_expr(
                s["value"], splits[s["value"]],
                descending=bool(s.get("descending")),
            ),
        )
    # one count/sum pass for every spec: explode each row to
    # (spec_id, bucket, measure) and aggregate — ≤ len(specs)*n_buckets
    # result rows, map-side combined before the shuffle
    spark = df.sparkSession
    structs = [
        F.struct(
            F.lit(i).alias("m"),
            F.col(bcols[s["rank"]]).alias("b"),
            (
                F.col(s["cum"][0]).cast("long")
                if s.get("cum")
                else F.lit(0).cast("long")
            ).alias("v"),
        )
        for i, s in enumerate(specs)
    ]
    stats = (
        staged.select(F.explode(F.array(*structs)).alias("x"))
        .groupBy("x.m", "x.b")
        .agg(F.count("*").alias("cnt"), F.sum("x.v").alias("s"))
        .collect()
    )
    per_spec: dict[int, list] = {i: [] for i in range(len(specs))}
    for r in stats:
        per_spec[r["m"]].append((r["b"], r["cnt"], r["s"]))
    totals = {
        i: sum(c for _, c, _ in rows) for i, rows in per_spec.items()
    }
    n_rows = totals[0] if specs else 0
    if any(t != n_rows for t in totals.values()):
        raise ValueError(
            f"with_global_ranks: bucket counts disagree across specs "
            f"({totals}) — bucket classification must partition the rows"
        )
    out = staged
    for i, s in enumerate(specs):
        cnt_off, sum_off, offsets = 0, 0, []
        for b, c, v in sorted(per_spec[i]):
            offsets.append((b, cnt_off, sum_off))
            cnt_off += c
            sum_off += int(v or 0)
        if s.get("cum"):
            s["total"] = sum_off
        bcol = bcols[s["rank"]]
        off = spark.createDataFrame(
            offsets or [(0, 0, 0)],
            f"{bcol} int, _cnt_off long, _sum_off long",
        )
        order = (
            [F.col(s["value"]).desc(), F.col(s["key"])]
            if s.get("descending")
            else [F.col(s["value"]), F.col(s["key"])]
        )
        w = Window.partitionBy(bcol).orderBy(*order)
        out = out.join(F.broadcast(off), bcol).withColumn(
            s["rank"], (F.row_number().over(w) + F.col("_cnt_off")).cast("long")
        )
        if s.get("cum"):
            measure, cum_out = s["cum"]
            out = out.withColumn(
                cum_out,
                (
                    F.sum(F.col(measure).cast("long")).over(
                        w.rowsBetween(
                            Window.unboundedPreceding, Window.currentRow
                        )
                    )
                    + F.col("_sum_off")
                ).cast("long"),
            )
        out = out.drop(bcol, "_cnt_off", "_sum_off")
    return out, n_rows


def ntile_from_rank(rank_col: str, n_rows: int, n_tiles: int) -> Column:
    """Exact NTILE(n_tiles) bucket from a 1-based global rank — the
    SQL-standard split (first ``n_rows mod n_tiles`` tiles get one
    extra row), in pure integer arithmetic so Spark and any oracle
    agree bit-for-bit."""
    q, rem = divmod(int(n_rows), n_tiles)
    threshold = rem * (q + 1)
    r = F.col(rank_col)
    first = F.expr(f"({rank_col} + {q}) DIV {q + 1}")
    # q can be 0 only when n_rows < n_tiles, in which case every row
    # satisfies r <= threshold and the otherwise-branch never
    # evaluates; max(q, 1) keeps the unevaluated expression legal
    # under ANSI division
    rest = F.expr(
        f"{rem} + ({rank_col} - {threshold} + {max(q, 1) - 1}) "
        f"DIV {max(q, 1)}"
    )
    return (
        F.when(r <= F.lit(threshold), first).otherwise(rest).cast("long")
    )
