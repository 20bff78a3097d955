#!/usr/bin/env python
"""Round-18 second-session A/B harness (quiet box).

Interleaved round-robin A/B (guide §1): all variants of one experiment
run alternately in ONE session, min-of-3 rounds per variant, so box
drift hits every variant equally.  Experiments:

  E1  j1's lineitem⋈orders at sf1/sf2: planner default (broadcast under
      the 64 MB threshold) vs SHUFFLE_HASH vs MERGE — is the per-pass
      driver collect+build of the ~1.8 M-row orders side really cheaper
      than a shuffled hash join that never touches the driver?
  E2  u2's anti join: SHUFFLE_MERGE (current) vs SHUFFLE_HASH.
  E3  l7 with vs without fan_out under this round's configs.
  E4  l10 docs⋈embeddings at sf2: default (now broadcast — the 64 MB
      threshold swallows the replicated embeddings table) vs
      SHUFFLE_HASH vs MERGE.  The embeddings side is DATA-sized: if
      broadcast is not clearly faster locally it is the wrong plan at
      every scale.
  E5  spark.sql.join.preferSortMergeJoin=false (guide §9) over the
      headline suite — runtime-settable, A/B'd as a whole.

Usage: python plans/r18/ab2.py [e1 e2 e3 e4 e5]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

from pyspark.sql import functions as F

from update_database_by_wind_spark.registry import REGISTRY
from update_database_by_wind_spark.session import get_session
from update_database_by_wind_spark.sources import fan_out, load
from update_database_by_wind_spark.functions.numeric import dec_sum

import update_database_by_wind_spark.operators  # noqa: F401

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/wind_spark_sf1"
SF2 = "/tmp/wind_spark_sf2"
_CUTOFF = "1998-01-01 00:00:00"
_RECENT = "1997-06-01 00:00:00"


def timed(fn, passes=3):
    best = float("inf")
    fn().count()  # warm
    for _ in range(passes):
        t0 = time.perf_counter()
        fn().count()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def interleave(variants: dict, rounds=3):
    """variants: name -> thunk returning DataFrame.  Returns best-of-
    rounds per variant with rounds interleaved."""
    best = {k: float("inf") for k in variants}
    for k, fn in variants.items():  # warm each once
        fn().count()
    for _ in range(rounds):
        for k, fn in variants.items():
            t0 = time.perf_counter()
            fn().count()
            best[k] = min(best[k], time.perf_counter() - t0)
    return {k: round(v, 3) for k, v in best.items()}


def j1_variant(spark, sf_dir, mode):
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    if mode == "shuffle_hash":
        orders = orders.hint("shuffle_hash")
    elif mode == "merge":
        orders = orders.hint("merge")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            dec_sum("l_extendedprice * (1 - l_discount)", "revenue"),
            F.count("*").alias("n_items"),
        )
    )


def u2_variant(spark, sf_dir, mode):
    orders = load(spark, sf_dir, "orders")
    target = orders.filter(
        F.col("o_orderdate") < F.lit(_CUTOFF).cast("timestamp")
    ).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") * 1.1
        ).otherwise(F.col("o_totalprice")).alias("price"),
        "o_orderdate",
    )
    source = orders.filter(
        F.col("o_orderdate") >= F.lit(_RECENT).cast("timestamp")
    ).select("o_orderkey", F.col("o_totalprice").alias("price"), "o_orderdate")
    s = source if mode == "default" else source.hint(mode)
    merged = target.join(s, "o_orderkey", "left_anti").unionByName(source)
    return merged.groupBy(F.year("o_orderdate").cast("int").alias("yr")).agg(
        F.count("*").alias("n_rows"), dec_sum("price", "total_price")
    )


def l7_variant(spark, sf_dir, use_fanout):
    from update_database_by_wind_spark.operators.text import tokens

    docs = load(spark, sf_dir, "documents")
    base = docs.select("text")
    if use_fanout:
        base = fan_out(base)
    return (
        base.select(F.explode(tokens()).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("word"))
        .limit(20)
    )


def l10_variant(spark, sf_dir, mode):
    from update_database_by_wind_spark.functions.numeric import dec_avg

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    if mode != "default":
        emb = emb.hint(mode)
    return (
        docs.join(emb, docs.doc_id == emb.vec_id)
        .groupBy("label")
        .agg(
            F.count("*").alias("n_docs"),
            dec_avg("n_chars", "avg_chars"),
            F.round(
                F.sum(
                    F.element_at("embedding", 1).cast("decimal(38,9)")
                ).cast("double")
                / F.count("*"),
                6,
            ).alias("avg_first_component"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


HEADLINE = [
    "a1_pricing_summary", "j1_star_join_revenue", "j8_asof_join_last_click",
    "w4_cumulative_spend", "u2_upsert_merge", "l2_hash_dedup",
    "l3a_near_dup_signatures", "l4_cosine_topk_exact", "l7_word_frequency",
    "l10_multimodal_join",
]


def main():
    which = set(sys.argv[1:]) or {"e1", "e2", "e3", "e4", "e5"}
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_session(app_name="r18-ab2", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    from update_database_by_wind_spark.sources.replicate import replicate_sf

    replicate_sf(SF01, SF1, copies=10)
    replicate_sf(SF01, SF2, copies=20)
    out = {}

    if "e1" in which:
        for d, tag in [(SF1, "sf1"), (SF2, "sf2")]:
            spark.sparkContext.setJobDescription(f"E1 j1 {tag}")
            out[f"e1_j1_{tag}"] = interleave({
                m: (lambda m=m, d=d: j1_variant(spark, d, m))
                for m in ("default", "shuffle_hash", "merge")
            })
            print(f"e1_{tag}", out[f"e1_j1_{tag}"], flush=True)

    if "e2" in which:
        for d, tag in [(SF1, "sf1"), (SF2, "sf2")]:
            spark.sparkContext.setJobDescription(f"E2 u2 {tag}")
            out[f"e2_u2_{tag}"] = interleave({
                m: (lambda m=m, d=d: u2_variant(spark, d, m))
                for m in ("shuffle_merge", "shuffle_hash")
            })
            print(f"e2_{tag}", out[f"e2_u2_{tag}"], flush=True)

    if "e3" in which:
        for d, tag in [(SF1, "sf1"), (SF2, "sf2")]:
            spark.sparkContext.setJobDescription(f"E3 l7 {tag}")
            out[f"e3_l7_{tag}"] = interleave({
                "fanout": (lambda d=d: l7_variant(spark, d, True)),
                "plain": (lambda d=d: l7_variant(spark, d, False)),
            })
            print(f"e3_{tag}", out[f"e3_l7_{tag}"], flush=True)

    if "e4" in which:
        for d, tag in [(SF1, "sf1"), (SF2, "sf2")]:
            spark.sparkContext.setJobDescription(f"E4 l10 {tag}")
            out[f"e4_l10_{tag}"] = interleave({
                m: (lambda m=m, d=d: l10_variant(spark, d, m))
                for m in ("default", "shuffle_hash", "merge")
            })
            print(f"e4_{tag}", out[f"e4_l10_{tag}"], flush=True)

    if "e5" in which:
        # whole-headline A/B of preferSortMergeJoin, interleaved
        for d, tag in [(SF1, "sf1")]:
            for name in HEADLINE:  # warm both configs
                REGISTRY[name].fn(spark, d).count()
            res = {"smj_pref_true": 0.0, "smj_pref_false": 0.0}
            per = {k: {} for k in res}
            for rnd in range(2):
                for conf, key in (
                    ("true", "smj_pref_true"), ("false", "smj_pref_false")
                ):
                    spark.conf.set("spark.sql.join.preferSortMergeJoin", conf)
                    for name in HEADLINE:
                        t0 = time.perf_counter()
                        REGISTRY[name].fn(spark, d).count()
                        dt = time.perf_counter() - t0
                        cur = per[key].get(name, float("inf"))
                        per[key][name] = min(cur, dt)
            spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
            for key in res:
                res[key] = round(sum(per[key].values()), 3)
                per[key] = {k: round(v, 3) for k, v in per[key].items()}
            out[f"e5_{tag}"] = {"totals": res, "per_query": per}
            print(f"e5_{tag}", res, flush=True)

    import json
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(__file__), "ab2_results.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
