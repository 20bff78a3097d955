"""U31 compaction-scheduler laws (operators/update_pipeline.py):

1. the census is a faithful metadata read — per-partition file counts
   and byte totals straight off the listing, no data read;
2. the rewrite is TARGETED: only partitions past the threshold are
   rewritten, healthy partitions' files stay byte- and mtime-identical;
3. the scheduler is idempotent — a second run finds nothing fragmented
   and touches nothing;
4. crash residue is harmless — a stale ``_compact_tmp_*`` staging dir
   from a crashed prior run is cleared and replaced, never appended to,
   and the census/reader never counts it as table data.
"""

import os

from pyspark.sql import functions as F

from update_database_by_wind_spark.operators.update_pipeline import (
    compact_partitions,
    small_file_census,
)


def _build(spark, base: str, frag_files: int = 6) -> None:
    """Two-partition fixture: m=a healthy (1 file), m=b fragmented."""
    a = spark.range(10).select(
        F.lit("a").alias("m"), F.col("id"), (F.col("id") * 10).alias("v")
    )
    b = spark.range(40).select(
        F.lit("b").alias("m"), F.col("id"), (F.col("id") * 10).alias("v")
    )
    a.coalesce(1).write.partitionBy("m").parquet(base)
    b.repartition(frag_files).write.partitionBy("m").mode("append").parquet(
        base
    )


def _listing(pdir: str) -> list[tuple]:
    return sorted(
        (f, os.path.getsize(os.path.join(pdir, f)),
         os.stat(os.path.join(pdir, f)).st_mtime_ns)
        for f in os.listdir(pdir)
        if not f.startswith(("_", "."))
    )


def _rows(spark, base: str) -> list[tuple]:
    return sorted(
        map(tuple, spark.read.parquet(base).select("m", "id", "v").collect())
    )


def test_census_counts_files_per_partition(spark, tmp_path):
    base = str(tmp_path / "t")
    _build(spark, base)
    census = {c["partition"]: c for c in small_file_census(base, "m")}
    assert set(census) == {"a", "b"}
    assert census["a"]["n_files"] == 1
    assert census["b"]["n_files"] == 6
    assert census["b"]["bytes"] == sum(
        sz for _, sz, _ in _listing(census["b"]["dir"])
    )


def test_targeted_rewrite_spares_healthy_and_is_idempotent(spark, tmp_path):
    base = str(tmp_path / "t")
    _build(spark, base)
    before_rows = _rows(spark, base)
    healthy = os.path.join(base, "m=a")
    before_a = _listing(healthy)
    receipt = compact_partitions(spark, base, "m", max_files=4)
    assert receipt == {"n_partitions": 2, "fragmented": ["b"]}
    assert _listing(healthy) == before_a
    census = {c["partition"]: c for c in small_file_census(base, "m")}
    assert census["b"]["n_files"] == 1
    assert _rows(spark, base) == before_rows
    # second run: nothing fragmented, nothing touched anywhere
    snap = {p: _listing(os.path.join(base, f"m={p}")) for p in ("a", "b")}
    receipt2 = compact_partitions(spark, base, "m", max_files=4)
    assert receipt2 == {"n_partitions": 2, "fragmented": []}
    assert snap == {
        p: _listing(os.path.join(base, f"m={p}")) for p in ("a", "b")
    }


def test_all_healthy_is_a_no_op(spark, tmp_path):
    base = str(tmp_path / "t")
    _build(spark, base, frag_files=2)
    snap = {p: _listing(os.path.join(base, f"m={p}")) for p in ("a", "b")}
    receipt = compact_partitions(spark, base, "m", max_files=4)
    assert receipt["fragmented"] == []
    assert snap == {
        p: _listing(os.path.join(base, f"m={p}")) for p in ("a", "b")
    }


def test_crash_residue_is_cleared_not_appended(spark, tmp_path):
    base = str(tmp_path / "t")
    _build(spark, base)
    stage = os.path.join(base, "_compact_tmp_b")
    os.makedirs(stage)
    with open(os.path.join(stage, "junk.parquet"), "w") as fh:
        fh.write("torn partial write from a crashed run")
    before_rows = _rows(spark, base)
    receipt = compact_partitions(spark, base, "m", max_files=4)
    assert receipt["fragmented"] == ["b"]
    # the swap consumed the staging dir; no residue remains
    assert not os.path.exists(stage)
    assert _rows(spark, base) == before_rows
    # and the junk never leaked into the partition
    pdir = os.path.join(base, "m=b")
    assert all(not f.startswith("junk") for f, _, _ in _listing(pdir))


def test_crash_recovery_restores_or_cleans(spark, tmp_path):
    """The rename-swap's two crash windows, both recovered by
    recover_interrupted_compaction: (a) crash between the renames —
    the partition is missing and the old dir must be renamed back,
    discarding any staged rewrite; (b) crash after publish — the old
    dir is dead residue and must be removed without touching the
    published partition."""
    import shutil

    from update_database_by_wind_spark.operators.update_pipeline import (
        recover_interrupted_compaction,
    )

    base = str(tmp_path / "t")
    _build(spark, base)
    before_rows = _rows(spark, base)
    pdir = os.path.join(base, "m=b")
    # (a) simulate a crash between the renames: partition moved aside,
    # a staged rewrite left behind
    os.replace(pdir, os.path.join(base, "_compact_old_b"))
    os.makedirs(os.path.join(base, "_compact_tmp_b"))
    r = recover_interrupted_compaction(base, "m")
    assert r == {"restored": ["b"], "cleaned": ["_compact_tmp_b"]}
    assert _rows(spark, base) == before_rows
    # (b) simulate a crash after publish: old residue beside the live
    # partition
    shutil.copytree(pdir, os.path.join(base, "_compact_old_b"))
    r = recover_interrupted_compaction(base, "m")
    assert r == {"restored": [], "cleaned": ["_compact_old_b"]}
    assert _rows(spark, base) == before_rows
    # idempotent on a clean table
    assert recover_interrupted_compaction(base, "m") == {
        "restored": [],
        "cleaned": [],
    }


def test_compaction_pass_is_self_healing(spark, tmp_path):
    """Round-14 advisor: a crash between the two swap renames leaves
    the partition invisible, and the census cannot see a MISSING
    partition — so the next compact_partitions pass must recover it
    itself, not depend on the operator separately calling
    recover_interrupted_compaction."""
    base = str(tmp_path / "t")
    _build(spark, base)
    before_rows = _rows(spark, base)
    pdir = os.path.join(base, "m=b")
    # crash between the renames: partition moved aside, stage published
    # nowhere
    os.replace(pdir, os.path.join(base, "_compact_old_b"))
    assert not os.path.exists(pdir)
    receipt = compact_partitions(spark, base, "m", max_files=4)
    # the pass healed FIRST (m=b visible again, so the census saw its
    # 6 fragmented files), then compacted it as usual
    assert receipt == {"n_partitions": 2, "fragmented": ["b"]}
    assert not os.path.exists(os.path.join(base, "_compact_old_b"))
    census = {c["partition"]: c for c in small_file_census(base, "m")}
    assert census["b"]["n_files"] == 1
    assert _rows(spark, base) == before_rows
