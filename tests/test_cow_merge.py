"""Structural test for the copy-on-write partition MERGE (U8).

The oracle tier proves the merged *content* is right; this tier proves
the *file layout* behavior that makes COW worth having at 100 TB:
partitions the source batch does not touch keep their exact files
(same paths, sizes, mtimes — never rewritten), and only the affected
partition directories change.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from update_database_by_wind_spark.operators.update_pipeline import cow_merge
from update_database_by_wind_spark.sources import load


def _snapshot(root: str) -> dict[str, tuple[int, float]]:
    out: dict[str, tuple[int, float]] = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            p = os.path.join(dirpath, f)
            st = os.stat(p)
            out[os.path.relpath(p, root)] = (st.st_size, st.st_mtime)
    return out


def test_cow_merge_rewrites_only_affected_partitions(spark, sf_smoke, tmp_path):
    target_path = str(tmp_path / "orders_by_month")
    snap = load(spark, sf_smoke, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").alias("price"),
        F.date_format("o_orderdate", "yyyy-MM").alias("o_month"),
    )
    snap.repartition(F.col("o_month")).write.partitionBy("o_month").parquet(
        target_path
    )
    before = _snapshot(target_path)
    months_before = {p.split(os.sep)[0] for p in before}

    source = (
        snap.filter(F.col("o_month") == "1997-03")
        .withColumn("price", F.col("price") * 1.1)
    )
    affected = cow_merge(spark, target_path, source, "o_orderkey", "o_month")
    assert affected == ["1997-03"]

    after = _snapshot(target_path)
    touched = {p for p in set(before) | set(after) if p.startswith("o_month=1997-03")}
    untouched_before = {p: v for p, v in before.items() if p not in touched}
    untouched_after = {p: v for p, v in after.items() if p not in touched}
    # every un-affected partition keeps its exact files: same paths,
    # sizes, and mtimes — proof they were never rewritten
    assert untouched_before == untouched_after
    # the affected partition was actually rewritten (new file names)
    assert {p for p in before if p in touched} != {p for p in after if p in touched}
    # and no partition directory vanished
    months_after = {p.split(os.sep)[0] for p in after}
    assert months_after == months_before

    # merged content: row count unchanged (update-only batch), March
    # prices scaled
    back = spark.read.parquet(target_path)
    assert back.count() == snap.count()
    orig_march_total = (
        snap.filter(F.col("o_month") == "1997-03")
        .agg(F.sum(F.col("price").cast("decimal(38,6)")).alias("s"))
        .collect()[0]["s"]
    )
    new_march_total = (
        back.filter(F.col("o_month") == "1997-03")
        .agg(F.sum(F.col("price").cast("decimal(38,6)")).alias("s"))
        .collect()[0]["s"]
    )
    assert abs(float(new_march_total) - 1.1 * float(orig_march_total)) < 1e-2


def test_cow_merge_is_idempotent(spark, sf_smoke, tmp_path):
    """Re-applying the same source batch must leave the table content
    unchanged (anti ∪ source is a fixpoint for a fixed source) — the
    task-retry guarantee."""
    target_path = str(tmp_path / "orders_by_month")
    snap = load(spark, sf_smoke, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").alias("price"),
        F.date_format("o_orderdate", "yyyy-MM").alias("o_month"),
    )
    snap.repartition(F.col("o_month")).write.partitionBy("o_month").parquet(
        target_path
    )
    source = (
        snap.filter(F.col("o_month") == "1997-03")
        .withColumn("price", F.col("price") * 1.1)
    )
    cow_merge(spark, target_path, source, "o_orderkey", "o_month")
    first = sorted(
        (r["o_orderkey"], round(r["price"], 6))
        for r in spark.read.parquet(target_path).collect()
    )
    cow_merge(spark, target_path, source, "o_orderkey", "o_month")
    second = sorted(
        (r["o_orderkey"], round(r["price"], 6))
        for r in spark.read.parquet(target_path).collect()
    )
    assert first == second


def test_cow_delete_routes_partitions_to_drop_rewrite_untouched(
    spark, sf_smoke, tmp_path
):
    """U14's three-way routing, structurally: TTL-expired partitions
    vanish as directories (no rewrite), partitions holding an erased
    key are rewritten (new files), and every other partition keeps its
    exact files (same paths, sizes, mtimes)."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        cow_delete,
    )

    target_path = str(tmp_path / "orders_by_month")
    snap = load(spark, sf_smoke, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").alias("price"),
        F.date_format("o_orderdate", "yyyy-MM").alias("o_month"),
    )
    snap.repartition(F.col("o_month")).write.partitionBy("o_month").parquet(
        target_path
    )
    before = _snapshot(target_path)
    months = sorted({p.split(os.sep)[0] for p in before})
    ttl_cutoff = months[2].split("=")[1]  # expire the 2 earliest months
    # erase exactly one key, so exactly its month is rewritten
    victim = (
        snap.filter(F.col("o_month") >= ttl_cutoff)
        .orderBy("o_orderkey")
        .first()
    )
    predicate = (F.col("o_month") < ttl_cutoff) | (
        F.col("o_orderkey") == victim["o_orderkey"]
    )
    result = cow_delete(spark, target_path, predicate, "o_month")

    assert sorted(result["dropped"]) == [
        m.split("=")[1] for m in months[:2]
    ]
    assert result["rewritten"] == [victim["o_month"]]
    after = _snapshot(target_path)
    # dropped partitions: directories gone entirely
    for m in months[:2]:
        assert not any(p.startswith(m) for p in after)
    # rewritten partition: new files
    vdir = f"o_month={victim['o_month']}"
    assert {p for p in before if p.startswith(vdir)} != {
        p for p in after if p.startswith(vdir)
    }
    # untouched partitions: byte-identical file census
    touched = set(months[:2]) | {vdir}
    ut_before = {
        p: v
        for p, v in before.items()
        if not any(p.startswith(t) for t in touched)
    }
    ut_after = {
        p: v
        for p, v in after.items()
        if not any(p.startswith(t) for t in touched)
    }
    assert ut_before == ut_after
    # content: exactly the predicate's rows are gone
    back = spark.read.parquet(target_path)
    expected = snap.filter(~predicate)
    assert back.count() == expected.count()
    assert (
        back.join(expected, "o_orderkey", "left_anti").count() == 0
        and expected.join(back, "o_orderkey", "left_anti").count() == 0
    )


def test_cow_delete_drops_null_and_escaped_partitions(spark, tmp_path):
    """Two silent-retention traps, both fixed by resolving directories
    from their ACTUAL names: (a) a fully-deleted NULL partition cannot
    take the rewrite path (dynamic overwrite only replaces partitions
    present in the written output — zero survivors would leave the old
    files), so its __HIVE_DEFAULT_PARTITION__ directory must be
    removed; (b) a partition value Spark percent-escapes in the path
    (':' → '%3A') must still be found and dropped."""
    from pyspark.sql import functions as F

    from update_database_by_wind_spark.operators.update_pipeline import (
        cow_delete,
    )

    target_path = str(tmp_path / "t")
    rows = [
        (1, None),          # NULL partition, fully deleted
        (2, "keep-me"),     # untouched
        (3, "x:y"),         # escaped directory name, fully deleted
        (4, "x:y"),
        (5, "part-ial"),    # partial delete → rewrite
        (6, "part-ial"),
    ]
    df = spark.createDataFrame(rows, "pk long, part string")
    df.repartition(F.col("part")).write.partitionBy("part").parquet(
        target_path
    )
    result = cow_delete(
        spark,
        target_path,
        F.col("pk").isin(1, 3, 4, 5),
        "part",
    )
    assert set(map(str, result["dropped"])) == {"None", "x:y"}
    assert result["rewritten"] == ["part-ial"]
    import os

    dirs = {d for d in os.listdir(target_path) if d.startswith("part=")}
    assert "part=__HIVE_DEFAULT_PARTITION__" not in dirs
    assert not any("x%3Ay" in d or "x:y" in d for d in dirs), dirs
    back = spark.read.parquet(target_path)
    assert sorted(r.pk for r in back.collect()) == [2, 6]


def test_cow_delete_noop_on_no_matches(spark, sf_smoke, tmp_path):
    """A predicate matching nothing must not touch a single file."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        cow_delete,
    )

    target_path = str(tmp_path / "orders_by_month")
    snap = load(spark, sf_smoke, "orders").select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM").alias("o_month"),
    )
    snap.write.partitionBy("o_month").parquet(target_path)
    before = _snapshot(target_path)
    result = cow_delete(
        spark, target_path, F.col("o_orderkey") < 0, "o_month"
    )
    assert result == {"dropped": [], "rewritten": []}
    assert _snapshot(target_path) == before


def test_cow_merge_rejects_cross_partition_key_moves(spark, sf_smoke, tmp_path):
    """The COW contract: keys may not change partition.  With
    validate_keys=True a source batch that moves a key must be
    rejected before any write."""
    import pytest

    target_path = str(tmp_path / "orders_by_month")
    snap = load(spark, sf_smoke, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").alias("price"),
        F.date_format("o_orderdate", "yyyy-MM").alias("o_month"),
    )
    snap.write.partitionBy("o_month").parquet(target_path)
    moved = (
        snap.filter(F.col("o_month") == "1997-02")
        .limit(1)
        .withColumn("o_month", F.lit("1997-03"))
    )
    with pytest.raises(ValueError, match="across partitions"):
        cow_merge(
            spark, target_path, moved, "o_orderkey", "o_month",
            validate_keys=True,
        )
    # and the same batch without validation is the documented unsafe
    # path — the stale row survives, which is exactly why the contract
    # exists
