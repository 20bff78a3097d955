"""U15 snapshot-versioning laws (operators/update_pipeline.py):

1. commit cost scales with the CHANGED data — v2's directory holds
   only the corrected months plus the new partition, nothing else;
2. snapshot isolation — reading v1 through its manifest after v2 is
   committed returns exactly the pre-commit table (v1's files are
   untouched, byte-for-byte);
3. read-at-v2 sees exactly the corrections.
"""

import os

from pyspark.sql import functions as F

from update_database_by_wind_spark.operators.update_pipeline import (
    snapshot_commit,
    snapshot_read,
)
from update_database_by_wind_spark.plans import formatted_plan


def _parts(d: str) -> set[str]:
    return {
        e.split("=", 1)[1] for e in os.listdir(d) if e.startswith("m=")
    }


def test_snapshot_commit_writes_only_changed_partitions(spark, tmp_path):
    base = str(tmp_path / "t")
    v1 = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "c", 40)],
        "pk long, m string, val long",
    )
    snapshot_commit(v1, base, 1, "m")
    # correction touches only partition b; d is brand new
    v2_delta = spark.createDataFrame(
        [(3, "b", 99), (5, "d", 50)], "pk long, m string, val long"
    )
    before = {
        p: os.path.getmtime(os.path.join(base, "v1", f"m={p}"))
        for p in _parts(os.path.join(base, "v1"))
    }
    snapshot_commit(v2_delta, base, 2, "m", parts=["b", "d"])

    assert _parts(os.path.join(base, "v1")) == {"a", "b", "c"}
    assert _parts(os.path.join(base, "v2")) == {"b", "d"}
    after = {
        p: os.path.getmtime(os.path.join(base, "v1", f"m={p}"))
        for p in _parts(os.path.join(base, "v1"))
    }
    assert before == after, "v2 commit must not touch v1 files"

    back1 = sorted(
        map(
            tuple,
            snapshot_read(spark, base, 1, "m")
            .select("pk", "m", "val")  # partitionBy reorders columns on read
            .collect(),
        )
    )
    assert back1 == sorted(map(tuple, v1.collect()))

    back2 = sorted(
        map(
            tuple,
            snapshot_read(spark, base, 2, "m")
            .select("pk", "m", "val")
            .collect(),
        )
    )
    # v2 = v1 with partition b replaced by the correction, plus d
    expected2 = sorted(
        [(1, "a", 10), (2, "a", 20), (3, "b", 99), (4, "c", 40), (5, "d", 50)]
    )
    assert back2 == expected2


def test_snapshot_read_prunes_partitions(spark, tmp_path):
    """The per-version scans must carry PartitionFilters (directory
    pruning), not read-then-filter: at 100 TB a version reads only
    the partitions its manifest assigns to each directory."""
    base = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "pk long, m string, val long"
    )
    snapshot_commit(df, base, 1, "m")
    snapshot_commit(
        spark.createDataFrame([(2, "b", 21)], "pk long, m string, val long"),
        base,
        2,
        "m",
        parts=["b"],
    )
    plan = formatted_plan(snapshot_read(spark, base, 2, "m"))
    lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert len(lines) >= 2, plan
    assert all("m IN" in ln or "m#" in ln for ln in lines), lines


def test_snapshot_expire_keeps_shared_directories(spark, tmp_path):
    """GC law: expiring old versions removes a version directory only
    when no RETAINED manifest references it — v1 survives expiry as
    long as the head still reads untouched partitions from it, while a
    fully superseded middle version is reclaimed."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        snapshot_expire,
    )

    base = str(tmp_path / "t")
    rows = "pk long, m string, val long"
    snapshot_commit(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30)], rows
        ),
        base, 1, "m",
    )
    # v2 rewrites b; v3 rewrites b again -> v2 fully superseded
    snapshot_commit(
        spark.createDataFrame([(2, "b", 21)], rows), base, 2, "m",
        parts=["b"],
    )
    snapshot_commit(
        spark.createDataFrame([(2, "b", 22)], rows), base, 3, "m",
        parts=["b"],
    )
    out = snapshot_expire(base, keep_versions=[3])
    assert out["removed_dirs"] == ["v2"]
    assert out["removed_manifests"] == [
        "_manifest_v1.json", "_manifest_v2.json",
    ]
    # head still reads a/c from v1 and b from v3
    back = sorted(
        map(
            tuple,
            snapshot_read(spark, base, 3, "m")
            .select("pk", "m", "val")
            .collect(),
        )
    )
    assert back == [(1, "a", 10), (2, "b", 22), (3, "c", 30)]


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_COMMITS = st.lists(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),  # partition
            st.integers(0, 99),                # value
        ),
        min_size=1,
        max_size=3,
        unique_by=lambda t: t[0],
    ),
    min_size=1,
    max_size=4,
)


@given(commits=_COMMITS)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_snapshot_store_replays_like_a_dict(
    spark, tmp_path_factory, commits
):
    """U15 law: for ANY sequence of partial commits, reading the table
    AS OF every version equals a dict replay (each commit wholly
    replaces the partitions it touches and leaves the rest at their
    previous version).  This is the snapshot-isolation contract under
    arbitrary touch patterns, not just the fixture's."""
    base = str(tmp_path_factory.mktemp("ttfuzz") / "t")
    states = []  # per version: {part: val}
    state: dict = {}
    for v, batch in enumerate(commits, start=1):
        rows = [(p, val) for p, val in batch]
        df = spark.createDataFrame(rows, "m string, val long")
        snapshot_commit(
            df, base, v, "m", parts=None if v == 1 else [p for p, _ in batch]
        )
        state = {**state, **dict(batch)}
        states.append(dict(state))
    for v, want in enumerate(states, start=1):
        got = {
            r["m"]: r["val"]
            for r in snapshot_read(spark, base, v, "m").collect()
        }
        assert got == want, (v, got, want)


def test_snapshot_commit_refuses_gap_in_manifest_chain(spark, tmp_path):
    """Guard: a delta commit with no predecessor manifest must raise —
    starting silently from an empty manifest would orphan every
    untouched partition at read time."""
    import pytest

    base = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a", 10)], "pk long, m string, val long")
    snapshot_commit(df, base, 1, "m")
    with pytest.raises(ValueError, match="missing predecessor manifest"):
        snapshot_commit(df, base, 3, "m", parts=["a"])  # skipped v2


def test_snapshot_commit_refuses_empty_declared_part(spark, tmp_path):
    """Guard: a declared part with zero rows must raise — a manifest
    pointer to a directory that was never written would make the
    partition vanish at that version without a delete being asked."""
    import pytest

    base = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "pk long, m string, val long"
    )
    snapshot_commit(df, base, 1, "m")
    delta = spark.createDataFrame([(2, "b", 21)], "pk long, m string, val long")
    with pytest.raises(ValueError, match="contributed no rows"):
        snapshot_commit(delta, base, 2, "m", parts=["b", "c"])  # c empty


def test_snapshot_commit_retry_after_refusal_does_not_double(
    spark, tmp_path
):
    """Retry safety (advisor finding, round 7): a guard-refused attempt
    must leave nothing a successful retry appends on top of.  The old
    mode('append') write doubled partition b's rows on retry; staging
    + rename makes the retried commit's directory exactly the delta."""
    import pytest

    base = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "pk long, m string, val long"
    )
    snapshot_commit(df, base, 1, "m")
    delta = spark.createDataFrame(
        [(2, "b", 21)], "pk long, m string, val long"
    )
    with pytest.raises(ValueError, match="contributed no rows"):
        snapshot_commit(delta, base, 2, "m", parts=["b", "c"])  # fails
    snapshot_commit(delta, base, 2, "m", parts=["b"])  # retry succeeds
    back = sorted(
        map(
            tuple,
            snapshot_read(spark, base, 2, "m")
            .select("pk", "m", "val")
            .collect(),
        )
    )
    assert back == [(1, "a", 10), (2, "b", 21)], back


def test_snapshot_commit_retry_clears_crashed_partial(spark, tmp_path):
    """A v{N} dir left by a CRASHED attempt (no manifest published) is
    cleared by the retry, and a stale stage dir never leaks into the
    committed data."""
    base = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a", 10)], "pk long, m string, val long")
    snapshot_commit(df, base, 1, "m")
    # simulate a crashed v2 attempt: partial data dir + stage residue,
    # but no _manifest_v2.json was ever published
    crashed = spark.createDataFrame(
        [(9, "a", 99)], "pk long, m string, val long"
    )
    crashed.write.partitionBy("m").parquet(os.path.join(base, "v2"))
    crashed.write.partitionBy("m").parquet(os.path.join(base, "_tmp_v2"))
    delta = spark.createDataFrame(
        [(1, "a", 11)], "pk long, m string, val long"
    )
    snapshot_commit(delta, base, 2, "m", parts=["a"])
    back = sorted(
        map(
            tuple,
            snapshot_read(spark, base, 2, "m")
            .select("pk", "m", "val")
            .collect(),
        )
    )
    assert back == [(1, "a", 11)], back
    assert not os.path.exists(os.path.join(base, "_tmp_v2"))


def test_snapshot_commit_refuses_published_version(spark, tmp_path):
    """Once a version's manifest exists the version is published —
    re-committing it would mutate data under readers' feet."""
    import pytest

    base = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a", 10)], "pk long, m string, val long")
    snapshot_commit(df, base, 1, "m")
    with pytest.raises(ValueError, match="already committed"):
        snapshot_commit(df, base, 1, "m")


def test_snapshot_expire_refuses_to_drop_head(spark, tmp_path):
    """Expiry guard (advisor finding, round 7): keep_versions that
    omits the newest manifest must raise — the current snapshot is
    never expirable, matching Iceberg's expireSnapshots contract."""
    import pytest

    from update_database_by_wind_spark.operators.update_pipeline import (
        snapshot_expire,
    )

    base = str(tmp_path / "t")
    rows = "pk long, m string, val long"
    snapshot_commit(spark.createDataFrame([(1, "a", 10)], rows), base, 1, "m")
    snapshot_commit(
        spark.createDataFrame([(1, "a", 11)], rows), base, 2, "m", parts=["a"]
    )
    with pytest.raises(ValueError, match="head snapshot"):
        snapshot_expire(base, keep_versions=[1])
    # nothing was removed by the refused call
    assert os.path.isdir(os.path.join(base, "v2"))
    assert os.path.exists(os.path.join(base, "_manifest_v2.json"))


_CRASHY_COMMITS = st.lists(
    st.tuples(
        st.lists(
            st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 99)),
            min_size=1,
            max_size=3,
            unique_by=lambda t: t[0],
        ),
        # pre-commit failure mode injected before the real commit:
        # none / crashed data write (partial v-dir, no manifest) /
        # refused attempt (empty declared part raises)
        st.sampled_from(["none", "crash", "refuse"]),
    ),
    min_size=1,
    max_size=3,
)


@given(commits=_CRASHY_COMMITS)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_snapshot_store_survives_crashed_and_refused_attempts(
    spark, tmp_path_factory, commits
):
    """Retry-safety law, fuzzed (round-8 hardening of the advisor's
    finding): before EVERY commit, an adversary may leave behind a
    crashed attempt's partial v{N} directory or make a guard-refused
    attempt — and the store must still replay exactly like a dict,
    at every version."""
    import pytest

    base = str(tmp_path_factory.mktemp("ttcrash") / "t")
    states, state = [], {}
    for v, (batch, failure) in enumerate(commits, start=1):
        rows = [(p, val) for p, val in batch]
        df = spark.createDataFrame(rows, "m string, val long")
        parts = None if v == 1 else [p for p, _ in batch]
        if failure == "crash":
            # a prior attempt wrote data then died before the manifest
            df.withColumn("val", F.col("val") + 1000).write.partitionBy(
                "m"
            ).parquet(os.path.join(base, f"v{v}"))
        elif failure == "refuse" and v > 1:
            with pytest.raises(ValueError, match="contributed no rows"):
                snapshot_commit(df, base, v, "m", parts=[*parts, "zz"])
        snapshot_commit(df, base, v, "m", parts=parts)
        state = {**state, **dict(batch)}
        states.append(dict(state))
    for v, want in enumerate(states, start=1):
        got = {
            r["m"]: r["val"]
            for r in snapshot_read(spark, base, v, "m").collect()
        }
        assert got == want, (v, got, want)


def test_recommit_of_expired_intermediate_version_is_refused(
    spark, tmp_path
):
    """Round-8 advisor finding (medium): after expiry removes an
    intermediate manifest but keeps its v-dir (a retained newer
    manifest still shares it), re-committing that version passed the
    old guards and rmtree'd the shared directory — corrupting the
    retained head.  The commit must refuse any version at or below
    the max committed manifest version, and the shared data must
    survive the refused attempt byte-for-byte."""
    import pytest

    from update_database_by_wind_spark.operators.update_pipeline import (
        snapshot_expire,
    )

    base = str(tmp_path / "t")
    rows = "pk long, m string, val long"
    snapshot_commit(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30)], rows
        ),
        base, 1, "m",
    )
    # v2 rewrites b; v3 rewrites c -> head v3 still reads b from v2
    snapshot_commit(
        spark.createDataFrame([(2, "b", 21)], rows), base, 2, "m",
        parts=["b"],
    )
    snapshot_commit(
        spark.createDataFrame([(3, "c", 31)], rows), base, 3, "m",
        parts=["c"],
    )
    out = snapshot_expire(base, keep_versions=[3])
    # v2's manifest is gone but its directory survives (head shares it)
    assert "_manifest_v2.json" in out["removed_manifests"]
    assert "v2" not in out["removed_dirs"]
    with pytest.raises(ValueError, match="not newer than"):
        snapshot_commit(
            spark.createDataFrame([(9, "b", 99)], rows), base, 2, "m",
            parts=["b"],
        )
    back = sorted(
        map(
            tuple,
            snapshot_read(spark, base, 3, "m")
            .select("pk", "m", "val")
            .collect(),
        )
    )
    assert back == [(1, "a", 10), (2, "b", 21), (3, "c", 31)]


def test_snapshot_changes_classifies_and_skips_carried_rows(
    spark, tmp_path
):
    """U20 CDF laws on a hand-built store: v2 rewrites partition b
    (one row updated, one carried forward verbatim, one deleted) and
    adds partition d (insert).  The changelog must emit exactly the
    three changed rows with before/after images — the verbatim
    carried-forward row and the untouched partition a must not
    appear — and the identity diff (v→v) must be empty."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        snapshot_changes,
    )

    base = str(tmp_path / "t")
    rows = "pk long, m string, val long"
    snapshot_commit(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "b", 30), (4, "b", 40)], rows
        ),
        base, 1, "m",
    )
    snapshot_commit(
        spark.createDataFrame([(2, "b", 21), (3, "b", 30), (9, "d", 90)],
                              rows),
        base, 2, "m", parts=["b", "d"],
    )
    feed = sorted(
        map(
            tuple,
            snapshot_changes(spark, base, 1, 2, "m", "pk", ["val"])
            .select("m", "pk", "change_type", "val_before", "val_after")
            .collect(),
        )
    )
    assert feed == [
        ("b", 2, "update", 20, 21),
        ("b", 4, "delete", 40, None),
        ("d", 9, "insert", None, 90),
    ]
    assert (
        snapshot_changes(spark, base, 2, 2, "m", "pk", ["val"]).count() == 0
    )


def test_snapshot_changes_scans_only_changed_partitions(spark, tmp_path):
    """U20 cost law: both sides of the diff carry PartitionFilters
    restricted to the manifest-diff partitions — partition a, owned by
    v1 in BOTH manifests, is pruned at directory level, never read."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        snapshot_changes,
    )

    base = str(tmp_path / "t")
    rows = "pk long, m string, val long"
    snapshot_commit(
        spark.createDataFrame([(1, "a", 10), (2, "b", 20)], rows),
        base, 1, "m",
    )
    snapshot_commit(
        spark.createDataFrame([(2, "b", 21)], rows), base, 2, "m",
        parts=["b"],
    )
    plan = formatted_plan(
        snapshot_changes(spark, base, 1, 2, "m", "pk", ["val"])
    )
    lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert lines, plan
    # every scan carries the changed-partition equality (the v1 side is
    # its manifest-wide IN list CONJOINED with `= b`, which prunes the
    # directory listing to b alone — partition a is never read)
    assert all("= b)" in ln for ln in lines), lines


def test_snapshot_changes_pruned_skip_soundness(spark, tmp_path):
    """u41's partition-skip laws on a hand-built store: a changed
    partition is scanned when EITHER side's band intersects — in
    particular a value moved INTO the band (from-side disjoint,
    to-side intersecting) is found — both-sides-disjoint partitions
    are skipped, an out-of-domain band is metadata-only, and a band
    column outside value_cols refuses."""
    import pytest

    from update_database_by_wind_spark.operators.update_pipeline import (
        snapshot_changes_pruned,
        snapshot_commit_with_stats,
    )

    base = str(tmp_path / "t")
    rows = "pk long, m string, val long"
    snapshot_commit_with_stats(
        spark,
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "b", 25), (4, "c", 30)], rows
        ),
        base, 1, "m", ["pk", "val"],
    )
    snapshot_commit_with_stats(
        spark,
        spark.createDataFrame([(2, "b", 21), (3, "b", 25), (4, "c", 5)],
                              rows),
        base, 2, "m", ["pk", "val"], parts=["b", "c"],
    )

    def run(lo, hi):
        df, scanned, changed = snapshot_changes_pruned(
            spark, base, 1, 2, "m", "pk", ["val"], "val", lo, hi
        )
        assert changed == ["b", "c"]
        return (
            sorted(
                map(
                    tuple,
                    df.select(
                        "m", "pk", "change_type", "val_before", "val_after"
                    ).collect(),
                )
            ),
            scanned,
        )

    # moved INTO the band: c's from-stats [30,30] are disjoint from
    # [0,9] but its to-stats [5,5] intersect — must be scanned
    feed, scanned = run(0, 9)
    assert scanned == ["c"]
    assert feed == [("c", 4, "update", 30, 5)]
    # both-sides intersection picks b alone; the carried-forward row
    # (pk 3) stays invisible
    feed, scanned = run(20, 29)
    assert scanned == ["b"]
    assert feed == [("b", 2, "update", 20, 21)]
    # out-of-domain band: zero partitions scanned, empty feed
    feed, scanned = run(100, 200)
    assert scanned == []
    assert feed == []
    with pytest.raises(ValueError, match="must be"):
        snapshot_changes_pruned(
            spark, base, 1, 2, "m", "pk", ["val"], "pk", 0, 9
        )


# --- U23 snapshot_restore laws -------------------------------------------------


def _seed(spark, base):
    v1 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "pk long, m string, val long",
    )
    snapshot_commit(v1, base, 1, "m")
    v2 = spark.createDataFrame(
        [(2, "b", 99)], "pk long, m string, val long"
    )
    snapshot_commit(v2, base, 2, "m", parts=["b"])


def test_restore_is_metadata_only_and_exact(spark, tmp_path):
    from update_database_by_wind_spark.operators.update_pipeline import (
        snapshot_restore,
    )

    base = str(tmp_path / "t")
    _seed(spark, base)
    dirs_before = {e for e in os.listdir(base) if e.startswith("v")}
    snapshot_restore(base, to_version=1, new_version=3)
    dirs_after = {e for e in os.listdir(base) if e.startswith("v")}
    assert dirs_after == dirs_before, "restore must write no data dir"
    v1 = sorted(map(tuple, snapshot_read(spark, base, 1, "m").collect()))
    v3 = sorted(map(tuple, snapshot_read(spark, base, 3, "m").collect()))
    assert v3 == v1
    # history preserved: the bad version still answers as committed
    v2 = {r["pk"]: r["val"] for r in snapshot_read(spark, base, 2, "m").collect()}
    assert v2[2] == 99


def test_restore_refuses_expired_target(spark, tmp_path):
    import pytest as _pytest

    from update_database_by_wind_spark.operators.update_pipeline import (
        snapshot_expire,
        snapshot_restore,
    )

    base = str(tmp_path / "t")
    _seed(spark, base)
    snapshot_expire(base, keep_versions=[2])
    with _pytest.raises(ValueError, match="nothing to restore"):
        snapshot_restore(base, to_version=1, new_version=3)


def test_restore_refuses_rewriting_history(spark, tmp_path):
    import pytest as _pytest

    from update_database_by_wind_spark.operators.update_pipeline import (
        snapshot_restore,
    )

    base = str(tmp_path / "t")
    _seed(spark, base)
    with _pytest.raises(ValueError, match="not newer"):
        snapshot_restore(base, to_version=1, new_version=2)


def test_restore_then_commit_continues_the_chain(spark, tmp_path):
    """After a restore, normal delta commits continue on top of the
    restored state — the manifest chain has no special cases."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        snapshot_restore,
    )

    base = str(tmp_path / "t")
    _seed(spark, base)
    snapshot_restore(base, to_version=1, new_version=3)
    v4 = spark.createDataFrame(
        [(3, "c", 77)], "pk long, m string, val long"
    )
    snapshot_commit(v4, base, 4, "m", parts=["c"])
    got = {r["pk"]: r["val"] for r in snapshot_read(spark, base, 4, "m").collect()}
    assert got == {1: 10, 2: 20, 3: 77}  # b back at 20 (restored), c updated


def test_snapshot_read_merges_vintages(spark, tmp_path):
    """Schema evolution (u50): a widening commit leaves mixed-vintage
    version dirs under one manifest.  The evolved read NULL-backfills
    the narrow dirs; a pre-evolution manifest still answers the
    narrow schema (time travel preserves vintages)."""
    base = str(tmp_path / "t")
    v1 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "pk long, m string, val long"
    )
    snapshot_commit(v1, base, 1, "m")
    widened = spark.createDataFrame(
        [(2, "b", 21, "x")], "pk long, m string, val long, tag string"
    )
    snapshot_commit(widened, base, 2, "m", parts=["b"])

    old = snapshot_read(spark, base, 1, "m")
    assert "tag" not in old.columns
    new = snapshot_read(spark, base, 2, "m")
    rows = {
        r.pk: (r.val, r.tag)
        for r in new.select("pk", "val", "tag").collect()
    }
    assert rows == {1: (10, None), 2: (21, "x")}


def test_snapshot_changes_backfills_vintage_gap(spark, tmp_path):
    """A value column that exists at only ONE endpoint reads as NULL
    on the other side — both directions (widening: NULL before-images;
    narrowing rewrite: NULL after-images), and a delete row carries
    the backfilled NULL in its before-image."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        snapshot_changes,
    )

    base = str(tmp_path / "t")
    v1 = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20)], "pk long, m string, val long"
    )
    snapshot_commit(v1, base, 1, "m")
    v2 = spark.createDataFrame(
        [(1, "a", 10, "x")], "pk long, m string, val long, tag string"
    )
    snapshot_commit(v2, base, 2, "m", parts=["a"])

    feed = {
        (r.pk, r.change_type): (
            r.val_before, r.val_after, r.tag_before, r.tag_after
        )
        for r in snapshot_changes(
            spark, base, 1, 2, "m", "pk", ["val", "tag"]
        ).collect()
    }
    # pk 1: val carried, tag NULL -> 'x' (update); pk 2: deleted, its
    # before-image backfills tag with NULL
    assert feed == {
        (1, "update"): (10, 10, None, "x"),
        (2, "delete"): (20, None, None, None),
    }

    # narrowing direction: v3 rewrites the partition WITHOUT tag —
    # deliberate, so it needs the write gate's explicit opt-out
    v3 = spark.createDataFrame(
        [(1, "a", 11)], "pk long, m string, val long"
    )
    snapshot_commit(v3, base, 3, "m", parts=["a"], schema_change="any")
    back = {
        (r.pk, r.change_type): (r.tag_before, r.tag_after)
        for r in snapshot_changes(
            spark, base, 2, 3, "m", "pk", ["val", "tag"]
        ).collect()
    }
    assert back == {(1, "update"): ("x", None)}


def test_snapshot_changes_refuses_ghost_value_column(spark, tmp_path):
    """A value column absent from BOTH endpoints is a caller error,
    not an all-NULL feed — the backfill must never fabricate a column
    that never existed anywhere."""
    import pytest

    from update_database_by_wind_spark.operators.update_pipeline import (
        snapshot_changes,
    )

    base = str(tmp_path / "t")
    v1 = spark.createDataFrame([(1, "a", 10)], "pk long, m string, val long")
    snapshot_commit(v1, base, 1, "m")
    v2 = spark.createDataFrame([(1, "a", 11)], "pk long, m string, val long")
    snapshot_commit(v2, base, 2, "m", parts=["a"])
    with pytest.raises(ValueError, match="ghost|exist at neither"):
        snapshot_changes(spark, base, 1, 2, "m", "pk", ["val", "nope"])


def test_snapshot_commit_refuses_accidental_column_drop(spark, tmp_path):
    """The write-side schema gate: once evolved reads NULL-backfill
    vintage gaps, a typo'd rename in a partial rewrite would read as
    silent NULLs — so the commit refuses a frame missing columns the
    evolved schema carries, unless the narrowing is declared."""
    import pytest

    base = str(tmp_path / "t")
    v1 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "pk long, m string, val long"
    )
    snapshot_commit(v1, base, 1, "m")
    renamed = spark.createDataFrame(
        [(1, "a", 11)], "pk long, m string, vall long"
    )
    with pytest.raises(ValueError, match="missing columns.*val"):
        snapshot_commit(renamed, base, 2, "m", parts=["a"])
    # widening needs no opt-in: the committed frame declares the column
    widened = spark.createDataFrame(
        [(1, "a", 11, "x")], "pk long, m string, val long, tag string"
    )
    snapshot_commit(widened, base, 2, "m", parts=["a"])
    # and after the widening, dropping the NEW column is also refused
    narrow = spark.createDataFrame(
        [(1, "a", 12)], "pk long, m string, val long"
    )
    with pytest.raises(ValueError, match="missing columns.*tag"):
        snapshot_commit(narrow, base, 3, "m", parts=["a"])


def test_snapshot_changes_pruned_backfills_vintage_gap(spark, tmp_path):
    """The band-scoped changelog must survive the same widening spans
    the plain changelog does — the sharded daemons consume widening
    commits through it (round-18 review finding #1)."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        snapshot_changes_pruned,
        snapshot_commit_stats,
    )

    base = str(tmp_path / "t")
    v1 = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30)],
        "pk long, m string, val long",
    )
    snapshot_commit(v1, base, 1, "m")
    snapshot_commit_stats(spark, base, 1, ["val"])
    widened = spark.createDataFrame(
        [(1, "a", 10, "x"), (2, "a", 25, "y")],
        "pk long, m string, val long, tag string",
    )
    snapshot_commit(widened, base, 2, "m", parts=["a"])
    snapshot_commit_stats(spark, base, 2, ["val"])
    feed, scanned, changed = snapshot_changes_pruned(
        spark, base, 1, 2, "m", "pk", ["val", "tag"], "val", 0, 100
    )
    rows = {
        (r.pk, r.change_type): (
            r.val_before, r.val_after, r.tag_before, r.tag_after
        )
        for r in feed.collect()
    }
    # both rows of the rewritten partition changed (pk 1 gained a tag,
    # pk 2 changed val AND gained a tag); before-images carry the
    # backfilled NULL tag; partition b is never scanned
    assert rows == {
        (1, "update"): (10, 10, None, "x"),
        (2, "update"): (20, 25, None, "y"),
    }
    assert scanned == ["a"] and changed == ["a"]


_EVO_COMMITS = st.lists(
    st.tuples(
        st.booleans(),  # this commit's schema carries the tag column
        st.lists(
            st.tuples(
                st.sampled_from(["a", "b", "c"]),  # partition
                st.integers(0, 9),                 # val
                st.integers(0, 9),                 # tag (if carried)
            ),
            min_size=1,
            max_size=3,
            unique_by=lambda t: t[0],
        ),
    ),
    min_size=2,
    max_size=4,
)


@given(commits=_EVO_COMMITS)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_vintage_feed_replays_like_a_dict(
    spark, tmp_path_factory, commits
):
    """Composition fuzz for the vintage contract: ANY interleaving of
    widening / narrowing / same-schema partial commits must feed, for
    EVERY version pair, exactly the dict-model diff where each side's
    value of an absent column is NULL per the OWNING commit's schema
    (the per-dir vintage rule — a version is a mix of dirs, so 'has
    the column' is per partition, not per version).  A pair where
    neither side's owning dirs carry the column refuses as a ghost."""
    import pytest

    from update_database_by_wind_spark.operators.update_pipeline import (
        snapshot_changes,
    )

    base = str(tmp_path_factory.mktemp("evofuzz") / "t")
    states: list[dict] = []  # per version: part -> (val, tag_or_None)
    state: dict = {}
    for v, (has_tag, batch) in enumerate(commits, start=1):
        if has_tag:
            rows = [(1, p, val, tag) for p, val, tag in batch]
            df = spark.createDataFrame(
                rows, "pk long, m string, val long, tag long"
            )
        else:
            rows = [(1, p, val) for p, val, _ in batch]
            df = spark.createDataFrame(rows, "pk long, m string, val long")
        snapshot_commit(
            df, base, v, "m",
            parts=None if v == 1 else [p for p, _, _ in batch],
            schema_change="any",
        )
        for p, val, tag in batch:
            state = {**state, p: (val, tag if has_tag else None)}
        states.append(dict(state))
    for i in range(1, len(commits) + 1):
        for j in range(i + 1, len(commits) + 1):
            si, sj = states[i - 1], states[j - 1]
            ghost = all(
                t is None for _v, t in list(si.values()) + list(sj.values())
            )
            if ghost:
                with pytest.raises(ValueError, match="neither"):
                    snapshot_changes(
                        spark, base, i, j, "m", "pk", ["val", "tag"]
                    ).collect()
                continue
            feed = {
                r.m: (
                    r.change_type, r.val_before, r.val_after,
                    r.tag_before, r.tag_after,
                )
                for r in snapshot_changes(
                    spark, base, i, j, "m", "pk", ["val", "tag"]
                ).collect()
            }
            want = {}
            for p in set(si) | set(sj):
                b, a = si.get(p), sj.get(p)
                if b is None:
                    want[p] = ("insert", None, a[0], None, a[1])
                elif a is None:
                    want[p] = ("delete", b[0], None, b[1], None)
                elif b != a:
                    want[p] = ("update", b[0], a[0], b[1], a[1])
            assert feed == want, (i, j, feed, want)


def test_evolved_read_keeps_partition_pruning(spark, tmp_path):
    """The allowMissingColumns union must not cost the scale property:
    a MIXED-VINTAGE read still plans one directory-pruned scan per
    version dir (PartitionFilters present on both sides), and the
    NULL backfill happens in the plan, not via a Python node."""
    base = str(tmp_path / "t")
    v1 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "pk long, m string, val long"
    )
    snapshot_commit(v1, base, 1, "m")
    widened = spark.createDataFrame(
        [(2, "b", 21, "x")], "pk long, m string, val long, tag string"
    )
    snapshot_commit(widened, base, 2, "m", parts=["b"])
    plan = formatted_plan(snapshot_read(spark, base, 2, "m"))
    lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert len(lines) >= 2, plan
    assert "EvalPython" not in plan, plan


@given(commits=_EVO_COMMITS)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_vintage_pruned_feed_replays_like_a_dict(
    spark, tmp_path_factory, commits
):
    """The band-scoped changelog under the same schema interleavings:
    for every version pair, snapshot_changes_pruned on a val band must
    equal the dict-model diff band-filtered on before OR after images
    (NULL never in band) — if stats pruning ever skipped a partition
    that holds an in-band changed row, the feed would diverge from the
    model here.  Stats are published on val only (the always-present
    column): pruning keys must not depend on the evolving column."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        snapshot_changes_pruned,
        snapshot_commit_stats,
    )

    lo, hi = 3, 6
    base = str(tmp_path_factory.mktemp("evoprune") / "t")
    states: list[dict] = []
    state: dict = {}
    for v, (has_tag, batch) in enumerate(commits, start=1):
        if has_tag:
            rows = [(1, p, val, tag) for p, val, tag in batch]
            df = spark.createDataFrame(
                rows, "pk long, m string, val long, tag long"
            )
        else:
            rows = [(1, p, val) for p, val, _ in batch]
            df = spark.createDataFrame(rows, "pk long, m string, val long")
        snapshot_commit(
            df, base, v, "m",
            parts=None if v == 1 else [p for p, _, _ in batch],
            schema_change="any",
        )
        snapshot_commit_stats(spark, base, v, ["val"])
        for p, val, tag in batch:
            state = {**state, p: (val, tag if has_tag else None)}
        states.append(dict(state))
    for i in range(1, len(commits) + 1):
        for j in range(i + 1, len(commits) + 1):
            si, sj = states[i - 1], states[j - 1]
            if all(
                t is None
                for _v, t in list(si.values()) + list(sj.values())
            ):
                continue  # ghost refusal covered by the plain fuzz
            feed, _scanned, _changed = snapshot_changes_pruned(
                spark, base, i, j, "m", "pk", ["val", "tag"],
                "val", lo, hi,
            )
            got = {
                r.m: (
                    r.change_type, r.val_before, r.val_after,
                    r.tag_before, r.tag_after,
                )
                for r in feed.collect()
            }
            want = {}
            for p in set(si) | set(sj):
                b, a = si.get(p), sj.get(p)
                if b is None:
                    row = ("insert", None, a[0], None, a[1])
                elif a is None:
                    row = ("delete", b[0], None, b[1], None)
                elif b != a:
                    row = ("update", b[0], a[0], b[1], a[1])
                else:
                    continue
                in_band = (
                    (row[1] is not None and lo <= row[1] <= hi)
                    or (row[2] is not None and lo <= row[2] <= hi)
                )
                if in_band:
                    want[p] = row
            assert got == want, (i, j, got, want)


def test_restore_rolls_back_the_evolved_schema(spark, tmp_path):
    """Evolution is restorable: RESTORE past a widening re-points the
    manifest at narrow dirs, so the restored head reads the NARROW
    schema, the write gate follows the restored vintage (a narrow
    commit on top needs no opt-out — the evolved column was rolled
    back), and the widened version keeps time-travelling with its
    column while retained."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        snapshot_restore,
    )

    base = str(tmp_path / "t")
    snapshot_commit(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "pk long, m string, val long"
        ),
        base, 1, "m",
    )
    snapshot_commit(
        spark.createDataFrame(
            [(1, "a", 11, "x")], "pk long, m string, val long, tag string"
        ),
        base, 2, "m", parts=["a"],
    )
    assert "tag" in snapshot_read(spark, base, 2, "m").columns
    snapshot_restore(base, to_version=1, new_version=3)
    # the restored head is narrow again
    assert "tag" not in snapshot_read(spark, base, 3, "m").columns
    # the gate follows the restored vintage: narrow commit, no opt-out
    snapshot_commit(
        spark.createDataFrame(
            [(1, "a", 12)], "pk long, m string, val long"
        ),
        base, 4, "m", parts=["a"],
    )
    assert "tag" not in snapshot_read(spark, base, 4, "m").columns
    # the bad-but-audit-retained widened version still answers its column
    got = {
        r.pk: r.tag
        for r in snapshot_read(spark, base, 2, "m").collect()
    }
    assert got == {1: "x", 2: None}


_EVO_ACTIONS = st.lists(
    st.one_of(
        # commit: (kind, has_tag, batch)
        st.tuples(
            st.just("commit"),
            st.booleans(),
            st.lists(
                st.tuples(
                    st.sampled_from(["a", "b"]),
                    st.integers(0, 9),
                    st.integers(0, 9),
                ),
                min_size=1,
                max_size=2,
                unique_by=lambda t: t[0],
            ),
        ),
        # restore: (kind, target-selector)
        st.tuples(st.just("restore"), st.integers(0, 9), st.just(None)),
        # expire: (kind, keep-mask)
        st.tuples(st.just("expire"), st.integers(0, 255), st.just(None)),
    ),
    min_size=2,
    max_size=5,
)


@given(actions=_EVO_ACTIONS)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_evolution_composes_with_restore_and_expiry(
    spark, tmp_path_factory, actions
):
    """The vintage rules under the FULL lifecycle: any interleaving of
    widening/narrowing partial commits, metadata-only restores, and
    expiry must leave every RETAINED version reading exactly its dict
    state — with each part's tag NULL per the owning commit's schema,
    carried through restore re-pointing — and every retained version
    pair feeding exactly the model diff.  Expiry may never reclaim a
    dir a retained manifest still reads through (the shared-reference
    law), including manifests created by restore."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        snapshot_changes,
        snapshot_expire,
        snapshot_restore,
    )

    base = str(tmp_path_factory.mktemp("evolife") / "t")
    states: dict[int, dict] = {}   # version -> part -> (val, tag|None)
    retained: list[int] = []
    head = 0
    first_committed = False
    for act in actions:
        kind = act[0]
        if kind == "commit":
            _, has_tag, batch = act
            v = head + 1
            if has_tag:
                df = spark.createDataFrame(
                    [(1, p, val, tag) for p, val, tag in batch],
                    "pk long, m string, val long, tag long",
                )
            else:
                df = spark.createDataFrame(
                    [(1, p, val) for p, val, _ in batch],
                    "pk long, m string, val long",
                )
            snapshot_commit(
                df, base, v, "m",
                parts=None if not first_committed
                else [p for p, _, _ in batch],
                schema_change="any",
            )
            prev = states.get(head, {})
            states[v] = {
                **prev,
                **{
                    p: (val, tag if has_tag else None)
                    for p, val, tag in batch
                },
            }
            retained.append(v)
            head = v
            first_committed = True
        elif kind == "restore":
            if not first_committed:
                continue
            target = retained[act[1] % len(retained)]
            v = head + 1
            snapshot_restore(base, to_version=target, new_version=v)
            states[v] = dict(states[target])
            retained.append(v)
            head = v
        else:  # expire
            if not first_committed:
                continue
            mask = act[1]
            keeps = sorted(
                {head}
                | {v for i, v in enumerate(retained) if mask & (1 << i)}
            )
            snapshot_expire(base, keep_versions=keeps)
            retained = keeps
        # every retained version reads exactly its model state
        for v in retained:
            got = {
                r.m: (r.val, getattr(r, "tag", None))
                for r in snapshot_read(spark, base, v, "m").collect()
            }
            assert got == states[v], (v, got, states[v])
    # vintage feeds across every retained pair
    import pytest

    for i in retained:
        for j in retained:
            if i >= j:
                continue
            si, sj = states[i], states[j]
            if all(
                t is None
                for _v, t in list(si.values()) + list(sj.values())
            ):
                with pytest.raises(ValueError, match="neither"):
                    snapshot_changes(
                        spark, base, i, j, "m", "pk", ["val", "tag"]
                    ).collect()
                continue
            feed = {
                r.m: (
                    r.change_type, r.val_before, r.val_after,
                    r.tag_before, r.tag_after,
                )
                for r in snapshot_changes(
                    spark, base, i, j, "m", "pk", ["val", "tag"]
                ).collect()
            }
            want = {}
            for p in set(si) | set(sj):
                b, a = si.get(p), sj.get(p)
                if b is None:
                    want[p] = ("insert", None, a[0], None, a[1])
                elif a is None:
                    want[p] = ("delete", b[0], None, b[1], None)
                elif b != a:
                    want[p] = ("update", b[0], a[0], b[1], a[1])
            assert feed == want, (i, j, feed, want)
