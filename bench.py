#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

One shared SparkSession across all queries (JVM startup and planning
overhead amortized — the per-query cost model a real deployment has),
each query timed to full materialization via a count() action.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from update_database_by_wind_spark.registry import REGISTRY
from update_database_by_wind_spark.session import get_session
from update_database_by_wind_spark.sources import load
import update_database_by_wind_spark.operators  # noqa: F401

HEADLINE = [
    "a1_pricing_summary",
    "j1_star_join_revenue",
    "j8_asof_join_last_click",
    "w4_cumulative_spend",
    "u2_upsert_merge",
    "l2_hash_dedup",
    "l3a_near_dup_signatures",
    "l4_cosine_topk_exact",
    "l7_word_frequency",
    "l10_multimodal_join",
]

# extension surface, timed alongside but kept OUT of the headline
# metric so the total stays comparable across rounds (l3j added r4;
# s10/j12 added r5 — the layout and runtime-filter receipts; a16
# added r8 — the mergeable-sketch aggregation shape; e5/o8/j13 added
# r13 so the round-12 distributed-rank and two-pass-sessionize
# rewrites carry measured numbers across rounds — expect the local
# scheduling-floor tax a16 documents in BASELINE.md, constant at
# scale while the removed single-partition sorts were the ceiling)
EXTENDED = [
    "a16_quantile_sketch",
    "e5_rfm_segmentation",
    "o8_pareto_concentration",
    "j13_interval_bin_join",
    "s10_zorder_clustering",
    "j12_bloom_prefilter",
    "l3e_ngram_jaccard",
    "l3j_chunk_dedup",
    "l4c_cosine_topk_vectorized",
    "l5_ivf_topk",
    "j10_salted_skew_join",
    "tr_hash_split",
    "ts_rolling_corr",
    "st2_tumbling_window",
    "q5_local_supplier_volume",
    "u10_table_checksum",
]


# Tables Spark pins in its in-memory columnar cache for the bench (see
# _pin_refs below): the TRUE dimension tables only.  The doc/vector
# corpora (documents, embeddings) are the primary INPUTS of the LLM
# headline queries — pinning them would time a cache-bound variant of a
# workload whose production shape is scan-bound (and measurably hurts
# the dedup pipeline: the 4-partition cached relation feeds the
# shingle repartition worse than the raw parquet scan does).  DuckDB
# gets the IDENTICAL treatment — CREATE TABLE (materialized in memory)
# for these five, views over parquet for facts and corpora — so
# neither engine is cache-bound where the other is scan-bound.
_REF_TABLES = ("region", "nation", "customer", "supplier", "part")


def _duckdb_times(names: list[str], sf_dir: str) -> dict[str, float]:
    """Per-query min of 2 timed passes after 1 untimed warm pass, on
    ONE connection with all tables registered up front — the statistic
    and protocol the Spark side uses (_timed_min), applied
    symmetrically: same per-query minimums, same steady-state warm-up,
    same amortized session setup, and the same reference tables
    materialized in memory (_REF_TABLES ≙ Spark's pinned cache; facts
    stay as parquet views on both engines).  Returned per query (not
    just summed) so a scale-point ratio swing in the artifact can be
    attributed to a specific query and a specific side — engine plan
    vs shared-box comparator noise (the round-6 sf1 l7/l10 ambiguity)."""
    import duckdb

    from update_database_by_wind_spark.sources import TABLES

    con = duckdb.connect()
    try:
        for t in TABLES:
            kind = "TABLE" if t in _REF_TABLES else "VIEW"
            con.sql(
                f"CREATE {kind} {t} AS"
                f" SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        times: dict[str, float] = {}
        for name in names:
            sql = REGISTRY[name].oracle
            con.sql(sql).fetchall()  # untimed warm pass
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                con.sql(sql).fetchall()
                best = min(best, time.perf_counter() - t0)
            times[name] = best  # exact; callers round for display
    finally:
        con.close()
    return times


def _sweep_child_main(
    sf_dir: str, names: list[str], pin: bool, warm_dir: str = ""
) -> None:
    """Child-process mode (``bench.py --sweep-child <sf_dir> <names> <pin>``):
    time the given registry queries in a FRESH JVM and print one JSON
    line.  Round-5/6 finding (BASELINE.md): by the time the long-lived
    bench process reaches the replicated scale points it carries the
    heap/GC residue of every earlier sweep, and the late entries read
    2-5× their standalone times (measured at sf2: l7 2.21 s in-process
    vs 0.91 s fresh, l4 1.88 vs 0.67 — identical replica, identical
    config).  A fresh process per scale point makes the artifact
    numbers plan-attributable, and is SYMMETRIC with the DuckDB
    comparator, which already opens a fresh connection per scale
    point.  The JVM startup is untimed either way.  ``pin`` caches the
    five reference tables first (the counterpart of DuckDB's
    materialized _REF_TABLES)."""
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_session(
        app_name="wind-spark-bench-sweep", shuffle_partitions=16
    )
    spark.sparkContext.setLogLevel("ERROR")
    # same two-tier warm-up as the parent protocol: compile + JIT-tier
    # every plan on the tiny fixture first (fresh JVM ⇒ cold C2
    # otherwise — measured ~40-70% inflation on the fact queries), then
    # one untimed pass per query at the target scale
    if warm_dir and os.path.isdir(warm_dir):
        for name in names:
            REGISTRY[name].fn(spark, warm_dir).count()
    if pin:
        for t in _REF_TABLES:
            load(spark, sf_dir, t).cache().count()
    res: dict[str, float] = {}
    for name in names:
        REGISTRY[name].fn(spark, sf_dir).count()  # untimed warm pass
        res[name] = _timed_min(spark, name, sf_dir)
    print(json.dumps({"queries": res}))


def _sweep_in_child(
    sf_dir: str, names: list[str], pin: bool = True, warm_dir: str = ""
) -> dict:
    """Run a timed sweep via _sweep_child_main in a subprocess; parse
    the JSON line back.  Returns {} on ANY child failure — crash,
    unparseable output, or timeout (a partial bench artifact beats an
    aborted multi-hour run); the caller falls back to in-process
    timing."""
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--sweep-child",
             sf_dir, ",".join(names), "1" if pin else "0", warm_dir],
            capture_output=True,
            text=True,
            timeout=1800,
        )
    except (subprocess.TimeoutExpired, OSError):
        return {}
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            return json.loads(line)["queries"]
        except (json.JSONDecodeError, KeyError):
            continue
    return {}


def compact_summary(out: dict) -> dict:
    """The LAST stdout line's payload: headline metric/value/unit/
    per-query times plus each scale point's value/duckdb_total/
    extended_mode, and nothing else.  Kept deliberately small — the
    driver records only the final ~2000 bytes of stdout, and round 7's
    artifact was unparseable because the full-detail line outgrew that
    window.  tests/test_bench_contract.py pins the size budget."""
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "queries": out["queries"],
        "sf": out["sf"],
        "duckdb_total": out["duckdb_total"],
    }
    for key in ("scale2", "scale3"):
        if key in out:
            point = out[key]
            compact[key] = {
                "sf": point["sf"],
                "value": point["value"],
                "duckdb_total": point["duckdb_total"],
            }
            if "extended_mode" in point:
                compact[key]["extended_mode"] = point["extended_mode"]
    return compact


def _timed_min(spark, name: str, sf_dir: str, passes: int = 2) -> float:
    """Best of ``passes`` timed executions — the standard steady-state
    convention: a single local-mode pass carries multi-hundred-ms GC /
    scheduling spikes (measured ±30%+ at sf1), and the minimum is the
    statistic that reflects the plan rather than the jitter.  The
    DuckDB comparator reports the matching statistic (_duckdb_times:
    per-query min of 2 timed passes after an untimed warm pass)."""
    best = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, sf_dir).count()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    # 24g heap for the bench session (32 concurrent task threads + the
    # pinned reference caches at three scale points; 16g left the late
    # sweeps under enough old-gen pressure to inflate corpus-query
    # timings 2-5× on a loaded box — round-6 measurement); explicit
    # SPARK_DRIVER_MEMORY still wins
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    # 16 shuffle partitions measured fastest at sf0.1 on local[32]
    # (AQE coalesces further); prepare() respects values ≤ 64
    spark = get_session(app_name="wind-spark-bench", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    # Steady-state protocol: run every benched query once at sf0.001
    # first so whole-stage codegen + planning are compiled and cached
    # (identical schemas -> identical generated code), then time at the
    # target scale.  This measures per-query *execution*, the cost a
    # deployment pays on every run after the first — BASELINE.md
    # records both this and the cold total.
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in HEADLINE + EXTENDED:
        REGISTRY[name].fn(spark, warm_dir).count()

    # Pin the dimension tables (_REF_TABLES) in the columnar cache: the
    # production pattern for hot dimensions, and the "dimension-
    # broadcast reuse" a long-lived deployment gets for free.  Spark's
    # CacheManager substitutes the InMemoryRelation by logical-plan
    # match, so the per-query code is untouched.  Facts (lineitem,
    # orders, events) AND the doc/vector corpora stay on parquet —
    # caching a query's primary input would time a different workload
    # than the baseline reads.  DuckDB materializes the SAME five
    # tables in memory (_duckdb_times), so pinning is symmetric.
    def _pin_refs(d: str) -> list:
        pinned = [load(spark, d, t).cache() for t in _REF_TABLES]
        for df in pinned:
            df.count()
        return pinned

    pinned = _pin_refs(sf_dir)

    # one untimed pass at the TARGET scale (same convention as the
    # scale2 point): the sf0.001 warm-up compiles the codegen, but the
    # first full-scale execution still pays JIT tiering and first-touch
    # page-cache reads — steady state is the second pass, which is what
    # a deployed plan's thousandth run looks like.  DuckDB's comparator
    # gets the identical two-pass treatment (_duckdb_times).
    for name in HEADLINE + EXTENDED:
        REGISTRY[name].fn(spark, sf_dir).count()

    per_query = {name: _timed_min(spark, name, sf_dir) for name in HEADLINE}
    extended = {name: _timed_min(spark, name, sf_dir) for name in EXTENDED}

    total = round(sum(per_query.values()), 3)
    dq = _duckdb_times(HEADLINE, sf_dir)
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "extended": extended,
        "sf": sf,
        # total from the EXACT per-query values (same statistic as every
        # prior round), per-query values rounded for the artifact only
        "duckdb_total": round(sum(dq.values()), 3),
        "duckdb_queries": {k: round(v, 3) for k, v in dq.items()},
    }

    def _scale_point(mult: int, extended_names: tuple[str, ...] = ()) -> dict:
        """Replicate the fixture ``mult``× (key-shifted, FK-consistent)
        and re-run the headline sweep there under the same protocol:
        pin refs, one untimed pass per query at THIS scale (AQE-final
        plans compiled, page cache warm — steady state, same as
        DuckDB's OS-cached reads), then per-query min of 2.  The
        headline sweep stays IN the long-lived parent session — that
        protocol is what every prior round's artifact used (a fresh-JVM
        sweep re-pays C2 JIT tiering: measured +35-60% on the fact
        queries, which would break cross-round comparability).  The
        EXTENDED entries are timed in-parent too since round 18 (same
        steady-state statistic); see the protocol note at the
        ``ext_mode`` block below and OPTIMIZATION_r18.md."""
        from update_database_by_wind_spark.sources.replicate import (
            replicate_sf,
        )

        sfn = round(sf * mult, 6)
        sfn_dir = replicate_sf(
            sf_dir, f"/tmp/wind_spark_sf{sfn:g}", copies=mult
        )
        pinned_n = _pin_refs(sfn_dir)
        for name in HEADLINE:
            REGISTRY[name].fn(spark, sfn_dir).count()
        per_query_n = {
            name: _timed_min(spark, name, sfn_dir) for name in HEADLINE
        }
        # Extended protocol (round-18 measurement fix, declared in
        # OPTIMIZATION_r18.md): the fresh-JVM child was introduced in
        # round 5 because the then-16g parent's heap/GC residue
        # inflated late entries 2-5×.  The 24g heap (round 6) removed
        # the residue — re-measured round 18 by replaying the exact
        # bench sequence in ONE parent: l3e 1.11 s / l3f 2.58 s /
        # l3j 1.29 s in-parent AFTER the full sf0.1+sf1 sweeps, versus
        # 6.38 / 3.44 / 1.44 in the child, where cold C2 tiering (the
        # inflation the parent's own two-tier warm-up exists to
        # exclude) dominates.  The in-parent numbers are the
        # steady-state statistic every other entry reports, so they
        # are the default now; extended_mode labels the protocol so
        # rounds are never silently mixed, and SPARK_GRAFT_EXT_MODE=
        # child restores the old path for cross-checks.
        ext_n: dict[str, float] = {}
        ext_mode = os.environ.get("SPARK_GRAFT_EXT_MODE", "in-parent")
        if extended_names and ext_mode == "child":
            ext_n = _sweep_in_child(
                sfn_dir, list(extended_names), pin=False, warm_dir=warm_dir
            )
            if not ext_n:
                # child failed → the documented in-process fallback;
                # the mode flag keeps the artifact honest about it
                ext_mode = "in-process-fallback"
        if extended_names and not ext_n:
            for name in extended_names:
                REGISTRY[name].fn(spark, sfn_dir).count()
                ext_n[name] = _timed_min(spark, name, sfn_dir)
        for df in pinned_n:
            df.unpersist()
        dq_n = _duckdb_times(HEADLINE, sfn_dir)
        point = {
            "sf": sfn,
            "value": round(sum(per_query_n.values()), 3),
            "queries": per_query_n,
            "duckdb_total": round(sum(dq_n.values()), 3),
            "duckdb_queries": {k: round(v, 3) for k, v in dq_n.items()},
        }
        if ext_n:
            point["extended"] = ext_n
            point["extended_mode"] = ext_mode
        # receipt at every replicated point: the salting win only
        # emerges once the hot partition dominates (20×); the sf1 row
        # doubles as the "don't salt small joins" counter-receipt.
        # Deliberately kept in the parent session: the receipt's claim
        # is the RATIO between its three variants, which share
        # whatever session state exists.
        point["skew_receipt"] = _skew_receipt(sfn_dir)
        return point

    def _skew_receipt(sfn_dir: str) -> dict:
        """J10's salting claim, measured (BASELINE.md §skew): 90% of
        event rows remapped onto ONE customer key, shuffled-hash join
        timed three ways — unsalted with AQE's skew splitter off, on
        (its 256 MB split threshold ignores this sub-GB hot partition,
        so it measures identical), and with partial salting (only the
        hot key salted, only hot dim rows replicated)."""
        from update_database_by_wind_spark.operators.joins import (
            skewed_events_join,
        )

        def _t(salts: int, skew_aqe: bool) -> float:
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.enabled", str(skew_aqe).lower()
            )
            try:
                best = float("inf")
                skewed_events_join(spark, sfn_dir, salts=salts).count()
                for _ in range(2):
                    t0 = time.perf_counter()
                    skewed_events_join(spark, sfn_dir, salts=salts).count()
                    best = min(best, time.perf_counter() - t0)
                return round(best, 3)
            finally:
                spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

        return {
            "unsalted_noaqe": _t(0, False),
            "unsalted_aqe": _t(0, True),
            "salted32_partial": _t(32, True),
        }

    # Second + third scale points (10× / 20× by key-shifted
    # replication): Spark's fixed per-query cost (codegen, scheduling)
    # amortizes with data volume while DuckDB scales ~linearly, so the
    # engine-ratio TREND across three points is what a capacity plan
    # extrapolates from — and is where the 2× gate is claimed
    # (BASELINE.md).  scale2 also times the dedup-graph pair (l3e
    # posting index + l3f connected components) at 10× pair-graph
    # density, the receipt for the O(log chain) iteration claim.
    # Disable with SPARK_GRAFT_SCALE2=0 / SPARK_GRAFT_SCALE3=0.
    if os.environ.get("SPARK_GRAFT_SCALE2", "1") != "0" and sf <= 0.5:
        for df in pinned:
            df.unpersist()
        out["scale2"] = _scale_point(
            10,
            ("l3e_ngram_jaccard", "l3f_dup_clusters", "l3j_chunk_dedup"),
        )
        if os.environ.get("SPARK_GRAFT_SCALE3", "1") != "0" and sf <= 0.15:
            out["scale3"] = _scale_point(20)

    detail = json.dumps(out)
    print(detail)
    # The driver records only the last ~2000 bytes of stdout.  The
    # full-detail line above outgrew that window in round 7 (the
    # per-query DuckDB columns pushed it past 2000 bytes and the graded
    # artifact came back "parsed": null).  So: persist the detail line
    # to a sidecar for humans, then print a compact (<~700 byte)
    # summary line LAST — headline metric/value/queries plus the
    # value/duckdb_total of each scale point — so a JSON-parseable
    # record always sits wholly inside any tail window.
    try:
        with open(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "bench_detail.json",
            ),
            "w",
        ) as fh:
            fh.write(detail + "\n")
    except OSError:
        pass
    print(json.dumps(compact_summary(out)))


if __name__ == "__main__":
    if len(sys.argv) >= 5 and sys.argv[1] == "--sweep-child":
        _sweep_child_main(
            sys.argv[2],
            sys.argv[3].split(","),
            sys.argv[4] == "1",
            sys.argv[5] if len(sys.argv) > 5 else "",
        )
    else:
        main()
