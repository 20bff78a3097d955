#!/usr/bin/env python
"""Round-19 A/B + decomposition harness (quiet box).

Interleaved round-robin A/B (guide §1): all variants of one experiment
run alternately in ONE session, min-of-3 rounds per variant, so box
drift hits every variant equally.  Experiments:

  e1  u2's anti join at sf0.1/sf1/sf2: SHUFFLE_MERGE (current) vs the
      planner's broadcast (no hint) — VERDICT item 1's floor-cost
      re-adjudication on a clean box.
  e2  build/exec/pass decomposition of e5/a16/o8 (the exact-rank
      machinery) + l3f/g4 at sf0.1 — where does the 2-4 s actually go?
  e3  graph loops old-vs-new interleaved: the round-19 job folds in
      connected_components / bfs_hops (lazy localCheckpoint + probe
      fold, explode symmetrization, g4 pair checkpoint).  Old
      implementations are embedded below verbatim (pre-edit tree) so
      both run in ONE session.  Also records Spark job counts per call
      via job groups — the VERDICT item-3 "jobs per round halved"
      receipt.

Usage: python plans/r19/ab.py [e1 e2 e3] [--sf01-only]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
)

from pyspark.sql import DataFrame, functions as F

from update_database_by_wind_spark.registry import REGISTRY
from update_database_by_wind_spark.session import get_session
from update_database_by_wind_spark.sources import load
from update_database_by_wind_spark.functions.numeric import dec_sum

import update_database_by_wind_spark.operators  # noqa: F401
from update_database_by_wind_spark.operators.graph import (
    _free_ckpt,
    bfs_hops,
    connected_components,
)
from update_database_by_wind_spark.operators.dedup import ngram_jaccard_pairs

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/wind_spark_sf1"
SF2 = "/tmp/wind_spark_sf2"
_CUTOFF = "1998-01-01 00:00:00"
_RECENT = "1997-06-01 00:00:00"


def interleave(variants: dict, rounds=3):
    best = {k: float("inf") for k in variants}
    for k, fn in variants.items():  # warm each once
        fn().count()
    for _ in range(rounds):
        for k, fn in variants.items():
            t0 = time.perf_counter()
            fn().count()
            best[k] = min(best[k], time.perf_counter() - t0)
    return {k: round(v, 3) for k, v in best.items()}


def u2_variant(spark, sf_dir, mode):
    orders = load(spark, sf_dir, "orders")
    target = orders.filter(
        F.col("o_orderdate") < F.lit(_CUTOFF).cast("timestamp")
    ).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") * 0.9
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


# ---- pre-round-19 graph implementations, verbatim (for e3's A/B) ----


def connected_components_old(
    edges: DataFrame, src: str = "u", dst: str = "v", max_iter: int = 25
) -> DataFrame:
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr = sym.join(labels, sym["v"] == labels["id"]).select(
            F.col("u").alias("id"), "label"
        )
        stepped = (
            labels.unionByName(nbr)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
        )
        jump = stepped.select(
            F.col("id").alias("j_id"), F.col("label").alias("j_label")
        )
        new_labels = (
            stepped.join(jump, stepped["label"] == jump["j_id"], "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("j_label", "label")
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        _free_ckpt(labels)
        labels = new_labels
        if changed == 0:
            _free_ckpt(sym)
            return labels.select("id", F.col("label").alias("cluster_id"))
    raise RuntimeError("cc_old did not converge")


def bfs_hops_old(
    edges: DataFrame, source: int, src: str = "u", dst: str = "v",
    max_rounds: int = 20,
) -> DataFrame:
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    spark = edges.sparkSession
    dist = spark.createDataFrame(
        [(int(source), 0)], "id long, dist long"
    ).localCheckpoint()
    frontier = dist.select("id")
    for d in range(1, max_rounds + 1):
        new = (
            frontier.join(sym, frontier["id"] == sym["u"])
            .select(F.col("v").alias("id"))
            .distinct()
            .join(dist, "id", "left_anti")
            .withColumn("dist", F.lit(d).cast("long"))
            .localCheckpoint()
        )
        if new.count() == 0:
            _free_ckpt(sym)
            return dist
        old = dist
        dist = dist.unionByName(new).localCheckpoint()
        _free_ckpt(old)
        frontier = new.select("id")
    raise RuntimeError("bfs_old did not converge")


def _g4_pairs(spark, sf_dir, ckpt):
    lineitem = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_returnflag") == "R") & (F.col("l_quantity") >= 45)
    )
    l2 = lineitem.select(
        F.col("l_orderkey").alias("r_orderkey"),
        F.col("l_suppkey").alias("r_suppkey"),
    )
    pairs = (
        lineitem.join(l2, lineitem["l_orderkey"] == l2["r_orderkey"])
        .filter(F.col("l_suppkey") < F.col("r_suppkey"))
        .select(F.col("l_suppkey").alias("u"), F.col("r_suppkey").alias("v"))
        .distinct()
    )
    return pairs.localCheckpoint() if ckpt else pairs


def g4_variant(spark, sf_dir, new: bool):
    pairs = _g4_pairs(spark, sf_dir, ckpt=new)
    verts = (
        pairs.select(F.col("u").alias("id"))
        .union(pairs.select(F.col("v").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    source = verts.agg(F.min("id")).collect()[0][0]
    dist = (bfs_hops if new else bfs_hops_old)(pairs, source)
    n_unreached = verts.join(dist, "id", "left_anti").count()
    return dist.select(
        F.col("id").alias("suppkey"),
        "dist",
        F.lit(n_unreached).cast("long").alias("n_unreached"),
    )


def l3f_variant(spark, sf_dir, new: bool):
    docs = load(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs)
    cc = connected_components if new else connected_components_old
    labels = cc(pairs, src="doc_a", dst="doc_b")
    sizes = labels.groupBy("cluster_id").agg(
        F.count("*").cast("long").alias("cluster_size")
    )
    return (
        labels.select(F.col("id").alias("doc_id"), "cluster_id")
        .join(sizes, "cluster_id")
        .select("doc_id", "cluster_id", "cluster_size")
    )


def l3e_variant(spark, sf_dir, salts: int):
    """l3e with an OPTIONAL two-level salted posting aggregation
    (salts=0 → the shipped one-pass plan).  Salting the shingle
    groupBy (guide §2.5 two-level aggregation): partial lists per
    (shingle, salt), then merge — buffers bounded by df/salts at the
    cost of a second aggregation over the full posting data."""
    from update_database_by_wind_spark.operators.dedup import _L3E_DF_CAP

    docs = load(spark, sf_dir, "documents")
    n = 3
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    gram = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(F.col("toks"), i + j) for j in range(n)]
            ),
        )
    )
    par = spark.sparkContext.defaultParallelism
    narrow = docs.select("doc_id", "text")
    if narrow.rdd.getNumPartitions() < par:
        narrow = narrow.repartition(par)
    grams = (
        narrow.select("doc_id", toks.alias("toks"))
        .select(
            "doc_id",
            F.explode(
                F.when(F.size("toks") >= n, gram).otherwise(
                    F.array().cast("array<string>")
                )
            ).alias("shingle_text"),
        )
        .select("doc_id", F.xxhash64("shingle_text").alias("shingle"))
    )
    if salts:
        partial = (
            grams.withColumn(
                "_salt", F.pmod(F.xxhash64("doc_id"), F.lit(salts))
            )
            .groupBy("shingle", "_salt")
            .agg(
                F.count("*").alias("pc"),
                F.collect_list("doc_id").alias("pd"),
            )
        )
        posting = (
            partial.groupBy("shingle")
            .agg(
                F.sum("pc").alias("df"),
                F.array_sort(F.flatten(F.collect_list("pd"))).alias("docs"),
            )
            .filter(F.col("df") <= _L3E_DF_CAP)
            .select("shingle", "docs")
        )
    else:
        posting = (
            grams.groupBy("shingle")
            .agg(
                F.count("*").alias("df"),
                F.array_sort(F.collect_list("doc_id")).alias("docs"),
            )
            .filter(F.col("df") <= _L3E_DF_CAP)
            .select("shingle", "docs")
        )
    sizes = (
        posting.select(F.explode("docs").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
    )
    multi = posting.filter(F.size("docs") >= 2)
    pair_structs = F.flatten(
        F.transform(
            F.col("docs"),
            lambda x, i: F.transform(
                F.slice(F.col("docs"), i + 2, F.size(F.col("docs"))),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    pairs = (
        multi.select(F.explode(pair_structs).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    joined = pairs.join(sa, "doc_a").join(sb, "doc_b")
    jac = F.col("n_shared") / (F.col("na") + F.col("nb") - F.col("n_shared"))
    return joined.filter(jac >= 0.2).select(
        "doc_a", "doc_b", "n_shared", F.round(jac, 6).alias("jaccard")
    )


def timed_with_jobs(spark, label, fn, passes=3):
    """min-of-passes wall plus the Spark job count of one pass."""
    fn().count()  # warm
    sc = spark.sparkContext
    sc.setJobGroup(label, label)
    t0 = time.perf_counter()
    fn().count()
    first = time.perf_counter() - t0
    jobs = len(sc.statusTracker().getJobIdsForGroup(label))
    sc.setJobGroup(None, None)
    best = first
    for _ in range(passes - 1):
        t0 = time.perf_counter()
        fn().count()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3), jobs


def main():
    args = sys.argv[1:]
    sf01_only = "--sf01-only" in args
    which = set(a for a in args if not a.startswith("--")) or {
        "e1", "e2", "e3"
    }
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_session(app_name="r19-ab", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    dirs = [(SF01, "sf01")]
    if not sf01_only:
        from update_database_by_wind_spark.sources.replicate import (
            replicate_sf,
        )

        replicate_sf(SF01, SF1, copies=10)
        replicate_sf(SF01, SF2, copies=20)
        dirs += [(SF1, "sf1"), (SF2, "sf2")]

    if "e1" in which:
        for d, tag in dirs:
            spark.sparkContext.setJobDescription(f"e1 u2 {tag}")
            out[f"e1_u2_{tag}"] = interleave({
                m: (lambda m=m, d=d: u2_variant(spark, d, m))
                for m in ("shuffle_merge", "default")
            })
            print(f"e1_{tag}", out[f"e1_u2_{tag}"], flush=True)

    if "e2" in which:
        names = [
            "e5_rfm_segmentation", "a16_quantile_sketch",
            "o8_pareto_concentration",
        ]
        for name in names:
            REGISTRY[name].fn(spark, SF01).count()  # warm
            # build: fn() + schema (analysis); includes the machinery's
            # eager boundary/count actions
            best_b = best_e = best_p = float("inf")
            df = None
            for _ in range(3):
                t0 = time.perf_counter()
                df = REGISTRY[name].fn(spark, SF01)
                df.schema
                best_b = min(best_b, time.perf_counter() - t0)
            for _ in range(3):
                t0 = time.perf_counter()
                df.count()
                best_e = min(best_e, time.perf_counter() - t0)
            for _ in range(3):
                t0 = time.perf_counter()
                REGISTRY[name].fn(spark, SF01).count()
                best_p = min(best_p, time.perf_counter() - t0)
            out[f"e2_{name}"] = {
                "build_s": round(best_b, 3),
                "exec_s": round(best_e, 3),
                "pass_s": round(best_p, 3),
            }
            print(f"e2_{name}", out[f"e2_{name}"], flush=True)

    if "e3" in which:
        for d, tag in dirs:
            if tag == "sf2":
                continue  # g4/l3f are benched at sf0.1/sf1
            for qname, make in (
                ("g4", g4_variant), ("l3f", l3f_variant),
            ):
                res = {}
                for variant, new in (("old", False), ("new", True)):
                    wall, jobs = timed_with_jobs(
                        spark, f"{qname}-{variant}-{tag}",
                        lambda make=make, d=d, new=new: make(spark, d, new),
                    )
                    res[variant] = {"wall_s": wall, "jobs": jobs}
                # one more interleaved round, keep minima
                for variant, new in (("old", False), ("new", True)):
                    t0 = time.perf_counter()
                    make(spark, d, new).count()
                    res[variant]["wall_s"] = min(
                        res[variant]["wall_s"],
                        round(time.perf_counter() - t0, 3),
                    )
                out[f"e3_{qname}_{tag}"] = res
                print(f"e3_{qname}_{tag}", res, flush=True)

    if "e4" in which:
        for d, tag in dirs:
            if tag == "sf01":
                continue  # salting question only matters at the replicas
            out[f"e4_l3e_salted_{tag}"] = interleave({
                "plain": (lambda d=d: l3e_variant(spark, d, 0)),
                "salted16": (lambda d=d: l3e_variant(spark, d, 16)),
            })
            print(f"e4_{tag}", out[f"e4_l3e_salted_{tag}"], flush=True)

    print(json.dumps(out))
    with open(
        os.path.join(os.path.dirname(__file__), "ab_results.json"), "w"
    ) as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
