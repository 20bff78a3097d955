#!/usr/bin/env python
"""Round-19 shuffle-codec A/B (VERDICT item 6, guide §2.3).

``spark.io.compression.codec`` is a core SparkConf (static per JVM),
so each variant runs in a FRESH child process; the parent interleaves
children lz4, zstd, lz4, zstd per scale point (process-granularity
round robin, min per query across children) so box drift hits both
codecs equally.  Queries chosen for genuinely MB-scale shuffles at the
replicated points: the shingle/posting exchanges (l3e/l3f), the word
explode (l7), the anti-join shuffle (u2), the fact⋈fact star join
(j1).

Child mode: zstd_ab.py --child <codec> <sf_dir> <names,>
Parent:     zstd_ab.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
)

NAMES = [
    "j1_star_join_revenue",
    "u2_upsert_merge",
    "l7_word_frequency",
    "l3e_ngram_jaccard",
    "l3f_dup_clusters",
]
SF1 = "/tmp/wind_spark_sf1"
SF2 = "/tmp/wind_spark_sf2"
WARM = "/root/testdata/sf0.001"


def child(codec: str, sf_dir: str, names: list[str]) -> None:
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    from pyspark.sql import SparkSession
    from update_database_by_wind_spark.session import (
        get_session, prepare,
    )

    # same knobs as get_session, plus the codec under test
    os.environ["SPARK_GRAFT_CODEC"] = codec
    bcast = 64 << 20
    spark = (
        SparkSession.builder.appName(f"zstd-ab-{codec}")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.autoBroadcastJoinThreshold", str(bcast))
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", str(bcast))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ["SPARK_DRIVER_MEMORY"])
        .config("spark.ui.enabled", "false")
        .config("spark.io.compression.codec", codec)
        .getOrCreate()
    )
    prepare(spark)
    spark.sparkContext.setLogLevel("ERROR")
    from update_database_by_wind_spark.registry import REGISTRY
    import update_database_by_wind_spark.operators  # noqa: F401

    for name in names:  # codegen warm-up on the tiny fixture
        REGISTRY[name].fn(spark, WARM).count()
    res = {}
    for name in names:
        REGISTRY[name].fn(spark, sf_dir).count()  # untimed warm pass
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        res[name] = round(best, 3)
    print("CHILD_RESULT " + json.dumps(res))


def main() -> None:
    out: dict = {}
    for sf_dir, tag in ((SF1, "sf1"), (SF2, "sf2")):
        best: dict[str, dict[str, float]] = {
            c: {} for c in ("lz4", "zstd")
        }
        for rnd in range(2):
            for codec in ("lz4", "zstd"):
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--child", codec, sf_dir, ",".join(NAMES)],
                    capture_output=True, text=True, timeout=1800,
                )
                for line in proc.stdout.splitlines():
                    if line.startswith("CHILD_RESULT "):
                        r = json.loads(line[len("CHILD_RESULT "):])
                        for k, v in r.items():
                            best[codec][k] = min(
                                best[codec].get(k, float("inf")), v
                            )
                        break
                else:
                    print(f"child {codec} {tag} rnd{rnd} FAILED",
                          proc.stderr[-500:])
        out[tag] = {
            c: {"total": round(sum(v.values()), 3), **v}
            for c, v in best.items()
        }
        print(tag, json.dumps(out[tag]), flush=True)
    with open(
        os.path.join(os.path.dirname(__file__), "zstd_ab_results.json"), "w"
    ) as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    if len(sys.argv) >= 5 and sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3], sys.argv[4].split(","))
    else:
        main()
