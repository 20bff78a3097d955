"""Snapshot-store machinery: versioned parquet snapshots with manifests,
stats, tags, pruned reads, expiry/GC, clustering, and OCC.

Extracted verbatim from operators/update_pipeline.py at the round-18
boundary (the round-17 verdict's ask #5) — one definition home per
function, zero semantics change; update_pipeline re-exports every name
so existing import paths keep working.  The snapshot layout contract
(SURVEY.md §2.9 U15/U23/U26-U29): a table dir holds _manifest_vN.json
(the version's partition->file map), vN/ data dirs shared ACROSS
versions for unchanged partitions, optional _stats_vN.json, and
_tag_*.json GC roots.  Readers resolve a version through its manifest
only; writers publish data before the manifest, so a crash can only
leak data a re-run reclaims (orphan_gc), never tear a read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from update_database_by_wind_spark.functions.fsutil import (
    atomic_write_json,
    pin_snapshot,
)
from update_database_by_wind_spark.operators.maintenance import (
    compact_partitions,
    recover_interrupted_compaction,
    small_file_census,
)


def snapshot_commit(
    df: DataFrame,
    base: str,
    version: int,
    partition_col: str,
    parts: list | None = None,
    schema_change: str = "widen",
) -> dict:
    """Commit ``df`` as snapshot ``version`` of a manifest-versioned
    table — the minimal form of the Iceberg/Delta snapshot contract,
    on plain parquet:

    * the DATA written is only the partitions in ``parts`` (all of
      ``df`` when None — the initial full commit), laid out under
      ``{base}/v{version}/`` with normal ``partitionBy`` dirs;
    * the MANIFEST (``_manifest_v{version}.json``) maps every
      partition value to the version directory that owns its current
      files: the previous manifest carried forward, overridden for
      the committed partitions.  Unchanged partitions are never
      rewritten and never copied — versions share their files.

    The manifest is metadata-sized (one entry per partition, like
    cow_delete's census) and each commit is atomic-ish in the same
    sense as Hive: data lands first, the manifest pointer last, so a
    reader at version N never sees a half-written N+1.  Time travel =
    read any retained manifest; version GC = drop ``v{k}`` dirs no
    manifest references.

    Guards (all raise rather than lose data): a delta commit whose
    predecessor manifest is missing is refused (it would silently
    orphan every untouched partition), a version whose manifest
    already exists is refused (re-committing published data), and a
    declared part that contributed no rows is refused (an empty
    commit is not a partition delete).  Partition values must be
    non-null strings — the manifest is string-keyed.

    Schema gate (round-18 review): once :func:`snapshot_read` unions
    vintages with NULL backfill, an ACCIDENTAL column rename or drop
    in a partial rewrite would no longer crash a read — it would read
    as silent NULLs.  So the gate moved to the write side, where
    Delta puts it: a delta commit may WIDEN the schema (new columns —
    the u50 evolution path, no opt-in needed: the committed frame
    itself declares them) but a commit MISSING columns the table's
    evolved schema carries is refused unless the caller passes
    ``schema_change="any"`` (the deliberate-narrowing opt-out; a
    rename is a drop + an add, so typos are caught by default).  The
    check reads one footer per distinct referenced version dir —
    metadata-sized, and only on delta commits.

    Retry safety (advisor finding, round 7): data is staged under
    ``_tmp_v{version}`` and renamed into place only after every
    pre-publish guard has passed, and the manifest is written via
    temp-file + ``os.replace``.  A crashed or guard-refused attempt
    leaves at worst a stale temp dir / partial ``v{version}`` dir
    that no manifest references; the retry clears both before
    writing, so a retried commit can never append on top of a
    partial one and a torn manifest can never be observed."""
    import json as _json
    import os
    import re
    import shutil

    os.makedirs(base, exist_ok=True)
    manifest_path = os.path.join(base, f"_manifest_v{version}.json")
    if os.path.exists(manifest_path):
        # the manifest pointer IS the publish: once it exists, readers
        # may hold this version — a re-commit would mutate published
        # data underneath them
        raise ValueError(
            f"snapshot_commit: version {version} is already committed "
            f"({manifest_path} exists); commit the next version instead"
        )
    existing = [
        int(m.group(1))
        for entry in os.listdir(base)
        if (m := re.fullmatch(r"_manifest_v(\d+)\.json", entry))
    ]
    if existing and version <= max(existing):
        # the manifest-exists guard above is not enough once
        # snapshot_expire has run: expiry can remove an INTERMEDIATE
        # version's manifest while keeping its v-dir alive because a
        # retained newer manifest still reads shared partitions from it
        # (advisor finding, round 8).  Re-committing that version would
        # pass both older guards, rmtree the shared v-dir, and silently
        # corrupt every partition the retained head maps to it.  Commits
        # are consecutive by contract, so any version at or below the
        # max known manifest is a re-commit of history — refuse.
        raise ValueError(
            f"snapshot_commit: version {version} is not newer than the "
            f"max committed version v{max(existing)}; retained manifests "
            f"may share v{version}'s directory (expired intermediates "
            "stay referenced) — commit the next version instead"
        )
    prev_path = os.path.join(base, f"_manifest_v{version - 1}.json")
    manifest: dict[str, int] = {}
    if os.path.exists(prev_path):
        with open(prev_path) as fh:
            manifest = _json.load(fh)
    elif version != 1:
        # a delta commit that silently started from an EMPTY manifest
        # would drop every untouched partition from read time on —
        # refuse, don't lose data (reviewer finding, round 7)
        raise ValueError(
            f"snapshot_commit: missing predecessor manifest {prev_path}; "
            f"commits must be consecutive (expected v{version - 1} first)"
        )
    if manifest and schema_change != "any":
        evolved: set[str] = set()
        for v in sorted(set(manifest.values())):
            evolved |= set(
                df.sparkSession.read.parquet(
                    os.path.join(base, f"v{v}")
                ).columns
            )
        dropped = sorted(evolved - set(df.columns))
        if dropped:
            raise ValueError(
                f"snapshot_commit: commit is missing columns "
                f"{dropped} the table's evolved schema carries — a "
                "rename/drop would read back as silent NULLs; pass "
                "schema_change='any' if the narrowing is deliberate"
            )
    data = df if parts is None else df.filter(
        F.col(partition_col).isin(list(parts))
    )
    # stage, verify, then rename: an unpublished v{version} dir can only
    # be the residue of a crashed attempt (the manifest-exists guard
    # above refuted the committed case), so both it and the stage dir
    # are safe to clear on entry
    tmp_dir = os.path.join(base, f"_tmp_v{version}")
    vdir = os.path.join(base, f"v{version}")
    shutil.rmtree(tmp_dir, ignore_errors=True)
    data.repartition(F.col(partition_col)).write.partitionBy(
        partition_col
    ).parquet(tmp_dir)
    committed = (
        [str(p) for p in parts]
        if parts is not None
        else [
            str(r[partition_col])
            for r in df.select(partition_col).distinct().collect()
        ]
    )
    # a declared part with no rows would get a manifest pointer to a
    # directory partitionBy never created — the partition would vanish
    # at this version without anyone asking for a delete (deletes are
    # cow_delete's job, not an empty commit's).  Directory names are
    # DECODED (Hive percent-escapes special characters — the cow_delete
    # lesson) rather than re-derived.
    from urllib.parse import unquote

    prefix = f"{partition_col}="
    written = {
        unquote(e[len(prefix):])
        for e in os.listdir(tmp_dir)
        if e.startswith(prefix)
    }
    missing = [p for p in committed if p not in written]
    if missing:
        shutil.rmtree(tmp_dir, ignore_errors=True)
        raise ValueError(
            f"snapshot_commit: parts {missing} contributed no rows; "
            "an empty commit is not a partition delete"
        )
    shutil.rmtree(vdir, ignore_errors=True)
    os.replace(tmp_dir, vdir)
    for p in committed:
        manifest[p] = version
    atomic_write_json(manifest_path, manifest)
    return manifest


def snapshot_read(
    spark: SparkSession, base: str, version: int, partition_col: str
) -> DataFrame:
    """Read the table AS OF ``version``: group the manifest's
    partitions by owning version directory and union one pruned scan
    per directory (the ``isin`` filter on the partition column becomes
    PartitionFilters — directory-level pruning, no data read from
    partitions another version owns).

    Vintage semantics (SCHEMA EVOLUTION, the U6 read-side contract
    applied to the store): a schema-widening commit rewrites only the
    partitions it touches, so one manifest can reference version dirs
    of DIFFERENT vintages — pre-evolution dirs simply lack the added
    columns.  The union NULL-backfills them
    (``allowMissingColumns=True``, exactly what ``mergeSchema`` does
    for a loose file collection), so a reader at an evolved version
    sees one uniform evolved schema while a reader at a pre-evolution
    version still sees the narrow vintage schema (its manifest only
    references narrow dirs).  Columns appear in the order their
    vintages introduced them (oldest dir first), so the evolved
    column lands appended — the same position the widening writer
    gave it.  On a store whose dirs all share one schema the flag is
    a no-op; mixed vintages previously CRASHED this union
    (AnalysisException), so every previously-succeeding read is
    byte-identical."""
    import json as _json
    import os
    from collections import defaultdict

    with open(os.path.join(base, f"_manifest_v{version}.json")) as fh:
        manifest: dict[str, int] = _json.load(fh)
    by_version: dict[int, list[str]] = defaultdict(list)
    for part, v in manifest.items():
        by_version[v].append(part)
    scans = [
        spark.read.parquet(os.path.join(base, f"v{v}")).filter(
            F.col(partition_col).isin(parts)
        )
        for v, parts in sorted(by_version.items())
    ]
    out = scans[0]
    for s in scans[1:]:
        out = out.unionByName(s, allowMissingColumns=True)
    return out


def snapshot_expire(base: str, keep_versions: list[int]) -> dict:
    """Expire snapshots: retain only the manifests in ``keep_versions``
    and delete every ``v{k}`` data directory that NO retained manifest
    references — the Iceberg ``expireSnapshots`` contract.  Because
    commits share unchanged partitions by reference, an old version
    directory must survive for as long as ANY retained manifest still
    points at one of its partitions: expiring v1 and v2 while keeping
    v3 removes v2's directory only if v3 re-wrote every partition v2
    owned, and keeps v1's directory whenever v3 still reads untouched
    partitions from it.  Pure metadata work — no data is read.

    The head (newest) snapshot is never expirable: ``keep_versions``
    must include the maximum existing manifest version, matching
    Iceberg's ``expireSnapshots`` contract that the current snapshot
    always survives (advisor finding, round 7 — without this,
    ``keep_versions=[1]`` after a v2 commit would irreversibly delete
    the newest data)."""
    import json as _json
    import os
    import re
    import shutil

    existing = [
        int(m.group(1))
        for entry in os.listdir(base)
        if (m := re.fullmatch(r"_manifest_v(\d+)\.json", entry))
    ]
    head = max(existing) if existing else None
    if head is not None and head not in keep_versions:
        raise ValueError(
            f"snapshot_expire: keep_versions {sorted(keep_versions)} "
            f"omits the head snapshot v{head}; the current snapshot "
            "cannot be expired"
        )
    referenced: set[int] = set()
    for v in keep_versions:
        with open(os.path.join(base, f"_manifest_v{v}.json")) as fh:
            referenced |= set(_json.load(fh).values())
    removed_dirs, removed_manifests = [], []
    for entry in sorted(os.listdir(base)):
        m = re.fullmatch(r"v(\d+)", entry)
        if m and int(m.group(1)) not in referenced:
            shutil.rmtree(os.path.join(base, entry))
            removed_dirs.append(entry)
        m = re.fullmatch(r"_manifest_v(\d+)\.json", entry)
        if m and int(m.group(1)) not in keep_versions:
            os.remove(os.path.join(base, entry))
            removed_manifests.append(entry)
    return {
        "removed_dirs": removed_dirs,
        "removed_manifests": removed_manifests,
    }


# --- U20: change data feed between snapshot versions ---------------------------


def snapshot_changes(
    spark: SparkSession,
    base: str,
    v_from: int,
    v_to: int,
    partition_col: str,
    key_col: str,
    value_cols: list,
) -> DataFrame:
    """Row-level changelog between two committed snapshot versions —
    the Delta ``table_changes`` / Iceberg changelog-scan contract on
    the plain-parquet snapshot store: every row inserted, deleted, or
    value-changed between ``v_from`` and ``v_to``, tagged
    ``change_type`` ∈ {insert, delete, update} with ``{col}_before`` /
    ``{col}_after`` images.

    The cost model is the point: the two manifests are diffed FIRST
    (metadata-sized — one entry per partition), and only partitions
    whose owning version differs are scanned from either side.  A
    commit rewrites whole partitions, so "owning version unchanged"
    proves "no row changed" without reading a byte; within rewritten
    partitions the diff is a per-(partition, key) full-outer join,
    with unchanged rows (a rewrite can carry rows forward verbatim)
    filtered out.  At 100 TB a nightly correction touching 1% of
    partitions yields a CDF scan of 2% of the table (both images of
    the changed 1%) — never a full-table diff, and downstream
    incremental consumers (u16's Δ-view maintenance is the natural
    reader) get exactly the signed rows they need.

    Keys are assumed stable within a partition (a key that moves
    between partitions reads as delete + insert — the same contract
    as partition-keyed CDC everywhere).

    Vintage semantics (schema evolution ACROSS the span): a value
    column added between the endpoints exists at ``v_to`` but not at
    ``v_from`` — the before-image of a column is NULL for every row
    that predates the column, exactly what a reader at ``v_from``
    would have answered had the evolved schema existed (Delta's CDF
    answers the same for pre-evolution versions).  Each side
    NULL-backfills value columns its vintage lacks, typed from the
    side that has them; a value column absent from BOTH endpoints is
    a caller error (loud — an all-NULL feed column is a claim about
    data that never existed anywhere).  The partition and key columns
    are never backfilled: they are the diff's identity and must exist
    at both endpoints.  On a span with no evolution every column
    resolves on both sides and the projection is the old one
    verbatim; a missing column previously CRASHED the select, so
    every previously-succeeding span is byte-identical."""
    import json as _json
    import os

    def manifest(v: int) -> dict:
        with open(os.path.join(base, f"_manifest_v{v}.json")) as fh:
            return _json.load(fh)

    m_from, m_to = manifest(v_from), manifest(v_to)
    changed = sorted(
        p
        for p in set(m_from) | set(m_to)
        if m_from.get(p) != m_to.get(p)
    )

    def scan(v: int, m: dict) -> tuple[DataFrame, bool]:
        parts = [p for p in changed if p in m]
        s = snapshot_read(spark, base, v, partition_col)
        if parts:
            s = s.filter(F.col(partition_col).isin(parts))
        return s, bool(parts)

    raw_old, old_nonempty = scan(v_from, m_from)
    raw_new, new_nonempty = scan(v_to, m_to)
    dt_old, dt_new = dict(raw_old.dtypes), dict(raw_new.dtypes)
    ghost = [c for c in value_cols if c not in dt_old and c not in dt_new]
    if ghost:
        raise ValueError(
            f"snapshot_changes: value columns {ghost} exist at neither "
            f"v{v_from} nor v{v_to} — not a vintage gap, a caller error"
        )

    def side(s: DataFrame, dts: dict, other: dict, nonempty: bool) -> DataFrame:
        out = s.select(
            partition_col,
            key_col,
            *[
                F.col(c) if c in dts
                else F.lit(None).cast(other[c]).alias(c)
                for c in value_cols
            ],
        )
        return out if nonempty else out.limit(0)

    old = side(raw_old, dt_old, dt_new, old_nonempty)
    new = side(raw_new, dt_new, dt_old, new_nonempty)
    joined = old.alias("a").join(
        new.alias("b"),
        on=[
            F.col(f"a.{partition_col}") == F.col(f"b.{partition_col}"),
            F.col(f"a.{key_col}") == F.col(f"b.{key_col}"),
        ],
        how="full_outer",
    )
    differs = F.lit(False)
    for c in value_cols:
        differs = differs | ~F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}"))
    return joined.filter(
        F.col(f"a.{key_col}").isNull()
        | F.col(f"b.{key_col}").isNull()
        | differs
    ).select(
        F.coalesce(f"a.{partition_col}", f"b.{partition_col}").alias(
            partition_col
        ),
        F.coalesce(f"a.{key_col}", f"b.{key_col}").alias(key_col),
        F.when(F.col(f"a.{key_col}").isNull(), "insert")
        .when(F.col(f"b.{key_col}").isNull(), "delete")
        .otherwise("update")
        .alias("change_type"),
        *[F.col(f"a.{c}").alias(f"{c}_before") for c in value_cols],
        *[F.col(f"b.{c}").alias(f"{c}_after") for c in value_cols],
    )


# --- U23: snapshot RESTORE (metadata-only rollback commit) ---------------------


def snapshot_restore(base: str, to_version: int, new_version: int) -> dict:
    """Roll the table back to ``to_version`` by committing
    ``new_version`` whose manifest is a verbatim copy of the restore
    target's — the Delta ``RESTORE TABLE ... TO VERSION`` contract:
    rollback is a NEW commit (history stays intact, the bad version
    remains auditable/time-travelable), and it is METADATA-ONLY (the
    restored manifest re-points partitions at data directories that
    already exist; zero data bytes move, so restoring a 100 TB table
    costs one manifest write).

    Guards mirror :func:`snapshot_commit`'s: the restore target's
    manifest must exist (an expired version cannot be restored — its
    shared files may be gone), and ``new_version`` must be strictly
    newer than the max committed version (re-committing history is
    refused for the same corruption reasons).  Returns the restored
    manifest mapping."""
    import json as _json
    import os
    import re

    from update_database_by_wind_spark.functions.fsutil import (
        atomic_write_json,
    )

    src = os.path.join(base, f"_manifest_v{to_version}.json")
    if not os.path.exists(src):
        raise ValueError(
            f"snapshot_restore: version {to_version} has no manifest "
            "(expired or never committed) — nothing to restore to"
        )
    existing = [
        int(m.group(1))
        for entry in os.listdir(base)
        if (m := re.fullmatch(r"_manifest_v(\d+)\.json", entry))
    ]
    if new_version <= max(existing):
        raise ValueError(
            f"snapshot_restore: new version {new_version} is not newer "
            f"than the max committed version v{max(existing)}"
        )
    with open(src) as fh:
        manifest = _json.load(fh)
    atomic_write_json(
        os.path.join(base, f"_manifest_v{new_version}.json"), manifest
    )
    return manifest


# --- U25: partition-spec evolution (no-rewrite layout change) ------------------


def evolved_read(spark: SparkSession, base: str) -> DataFrame:
    """Read a table whose manifest lists MULTIPLE partition specs: one
    DataFrame per spec directory, unioned by name.  Each spec's scan
    prunes on its OWN partition columns (Spark pushes the same logical
    filter into both scans; a directory-level column in one spec is an
    ordinary data column in the other), which is the Iceberg
    partition-spec-evolution contract: changing the layout must not
    rewrite history, and readers must keep pruning as well as each
    layout allows."""
    import json
    import os

    with open(os.path.join(base, "manifest.json")) as f:
        manifest = json.load(f)
    parts = [
        spark.read.parquet(os.path.join(base, spec["dir"]))
        for spec in manifest["specs"]
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --- U27: orphan-directory GC (crash-artifact reclamation) ---------------------


def orphan_gc(base: str, min_age_s: float = 0.0) -> dict:
    """Remove data directories that NO manifest references — the
    Iceberg ``removeOrphanFiles`` contract on the snapshot store:
    a crashed commit can leave a fully-written ``v{k}`` directory
    whose manifest was never published (the manifest pointer IS the
    publish), and a guard-refused retry can leave a ``_tmp_v{k}``
    staging directory.  Neither is reachable from any manifest, so
    both are dead bytes — but unlike :func:`snapshot_expire` this
    NEVER touches a manifest: expiry rewrites history by policy,
    orphan GC only reclaims what history already cannot see, so it is
    safe to run at any point in the table's life.

    ``min_age_s`` is the concurrent-writer guard (same caveat as
    Iceberg's): an in-flight commit's staging dir looks orphaned
    until its manifest publishes, so production runs pass an age
    threshold comfortably above the longest commit; directories
    younger than it are skipped, not removed.

    Returns the removed entry names (sorted), for receipt checks."""
    import os
    import re
    import shutil
    import time

    referenced: set[int] = set()
    for entry in os.listdir(base):
        if re.fullmatch(r"_manifest_v(\d+)\.json", entry):
            with open(os.path.join(base, entry)) as fh:
                import json as _json

                referenced |= set(_json.load(fh).values())
    removed = []
    now = time.time()
    for entry in sorted(os.listdir(base)):
        full = os.path.join(base, entry)
        if not os.path.isdir(full):
            continue
        m = re.fullmatch(r"v(\d+)", entry)
        is_orphan_vdir = m is not None and int(m.group(1)) not in referenced
        is_stage = re.fullmatch(r"_tmp_v\d+", entry) is not None
        if not (is_orphan_vdir or is_stage):
            continue
        if now - os.path.getmtime(full) < min_age_s:
            continue  # concurrent-writer guard: too young to judge
        shutil.rmtree(full)
        removed.append(entry)
    return {"removed": removed}


# --- U28: named refs (tags) as GC roots over the snapshot store -----------------


def snapshot_tag(base: str, name: str, version: int) -> None:
    """Create an immutable named ref ``name`` → ``version`` — the
    Iceberg tag contract: a human-meaningful, stable handle
    ("audit-2024", "pre-migration") onto a snapshot that survives any
    amount of later history.  Refuses a version with no manifest
    (tagging the expired or never-committed is meaningless) and an
    existing name (tags are immutable; retargeting a published name
    would silently change what auditors re-read — delete + re-tag is
    the explicit two-step).  Names are restricted to a filesystem-safe
    alphabet because the ref IS a file."""
    import os
    import re

    from update_database_by_wind_spark.functions.fsutil import (
        atomic_write_json,
    )

    if not re.fullmatch(r"[A-Za-z0-9][A-Za-z0-9_.-]*", name):
        raise ValueError(f"snapshot_tag: unsafe ref name {name!r}")
    if not os.path.exists(os.path.join(base, f"_manifest_v{version}.json")):
        raise ValueError(
            f"snapshot_tag: version {version} has no manifest — cannot "
            "tag an expired or uncommitted snapshot"
        )
    ref = os.path.join(base, f"_ref_{name}.json")
    if os.path.exists(ref):
        raise ValueError(
            f"snapshot_tag: ref {name!r} already exists — tags are "
            "immutable (delete then re-tag to retarget, explicitly)"
        )
    atomic_write_json(ref, {"version": version})


def snapshot_tags(base: str) -> dict[str, int]:
    """All named refs as {name: version}."""
    import json as _json
    import os
    import re

    out: dict[str, int] = {}
    for entry in os.listdir(base):
        if m := re.fullmatch(r"_ref_(.+)\.json", entry):
            with open(os.path.join(base, entry)) as fh:
                out[m.group(1)] = _json.load(fh)["version"]
    return out


def snapshot_read_tag(
    spark: SparkSession, base: str, name: str, partition_col: str
) -> DataFrame:
    """Read the table AS OF the tagged snapshot."""
    tags = snapshot_tags(base)
    if name not in tags:
        raise ValueError(f"snapshot_read_tag: no ref named {name!r}")
    return snapshot_read(spark, base, tags[name], partition_col)


def expire_untagged(base: str) -> dict:
    """Expire every snapshot that is neither the head nor tagged —
    the retention policy tags exist for: refs are GC ROOTS, so
    ``snapshot_expire``'s keep set is computed (head ∪ tagged) rather
    than hand-listed, and a tagged snapshot can never be vacuumed out
    from under the name auditors use to reach it."""
    import os
    import re

    versions = [
        int(m.group(1))
        for entry in os.listdir(base)
        if (m := re.fullmatch(r"_manifest_v(\d+)\.json", entry))
    ]
    keep = sorted({max(versions)} | set(snapshot_tags(base).values()))
    receipt = snapshot_expire(base, keep_versions=keep)
    receipt["kept_versions"] = keep
    return receipt


# --- U29: optimistic-concurrency commit with conflict validation ----------------


def occ_commit(
    df: DataFrame,
    base: str,
    expected_base: int,
    partition_col: str,
    parts: list,
) -> dict:
    """Commit under OPTIMISTIC CONCURRENCY — the Iceberg writer
    contract: a writer prepares its change against the snapshot it
    read (``expected_base``), and at publish time either the head is
    still that snapshot (fast path) or someone committed meanwhile
    and the writer must VALIDATE before rebasing: if any partition it
    wants to write was rewritten by a commit newer than its base
    snapshot, its staged change was computed from stale data — refuse
    (the caller re-reads and re-derives); if the concurrent commits
    touched only OTHER partitions, the write is rebased onto the
    current head (committed at head+1, whose predecessor manifest
    carries the concurrent changes forward) and both writers' work
    lands.

    This is what makes a multi-writer table safe without locks: the
    manifest's partition→version map IS the conflict ledger, so
    validation is a metadata scan — no data read, no lock held while
    the (possibly hour-long) staging write runs."""
    import json as _json
    import os
    import re

    versions = [
        int(m.group(1))
        for entry in os.listdir(base)
        if (m := re.fullmatch(r"_manifest_v(\d+)\.json", entry))
    ]
    if not versions:
        raise ValueError("occ_commit: no committed snapshot to build on")
    head = max(versions)
    rebased = head > expected_base
    if rebased:
        with open(os.path.join(base, f"_manifest_v{head}.json")) as fh:
            owners: dict[str, int] = _json.load(fh)
        conflicts = sorted(
            p for p in parts if owners.get(str(p), 0) > expected_base
        )
        if conflicts:
            raise ValueError(
                f"occ_commit: conflict on partitions {conflicts} — they "
                f"were rewritten after base snapshot v{expected_base}; "
                "re-read the table and re-derive the change"
            )
    snapshot_commit(df, base, head + 1, partition_col, parts=parts)
    return {"version": head + 1, "rebased": rebased}


# --- U32: GDPR erasure under a legal hold — delete → hold → GC lifecycle --------


def snapshot_untag(base: str, name: str) -> None:
    """Remove a named ref — the explicit hold-release half of the
    tag contract (:func:`snapshot_tag` refuses retargeting precisely
    so that removal is a separate, auditable act).  Refuses a missing
    ref: releasing a hold that does not exist is a workflow bug, not
    a no-op — the caller believed data was pinned."""
    import os

    ref = os.path.join(base, f"_ref_{name}.json")
    if not os.path.exists(ref):
        raise ValueError(f"snapshot_untag: no ref named {name!r}")
    os.remove(ref)


def partition_orphan_gc(base: str, min_age_s: float = 0.0) -> dict:
    """PARTITION-granular orphan GC — the reclamation step
    :func:`snapshot_expire` cannot perform.  Expiry removes a version
    DIRECTORY only when no retained manifest references it at all;
    because commits share unchanged partitions by reference, a version
    dir often stays alive for the partitions later snapshots still
    read from it, while its REWRITTEN partitions' old files sit
    unreachable inside it forever.  For retention that is cosmetic;
    for ERASURE it is the difference between "unreachable" and
    "gone": a GDPR delete is not complete while the pre-erasure
    images exist on disk, even unreferenced.

    The live set is every ``(owner_version, partition)`` pair any
    retained manifest routes to; any ``v{k}/{col}={val}`` subdir not
    in that set is removed.  Metadata-only decision (manifest reads +
    listings), deletion cost proportional to the dead bytes.
    ``min_age_s`` is the same concurrent-writer guard as
    :func:`orphan_gc`: an in-flight commit's freshly-written partition
    subdirs look orphaned until its manifest publishes.

    This is the snapshot-store analogue of Iceberg's two-step
    ``expireSnapshots`` + ``removeOrphanFiles`` — expiry drops the
    catalog's roots, this reclaims what the surviving roots can no
    longer see."""
    import json as _json
    import os
    import re
    import shutil
    import time
    from urllib.parse import unquote

    live: set[tuple[int, str]] = set()
    for entry in os.listdir(base):
        if re.fullmatch(r"_manifest_v(\d+)\.json", entry):
            with open(os.path.join(base, entry)) as fh:
                for part, ver in _json.load(fh).items():
                    live.add((ver, part))
    removed = []
    now = time.time()
    for entry in sorted(os.listdir(base)):
        m = re.fullmatch(r"v(\d+)", entry)
        vdir = os.path.join(base, entry)
        if not m or not os.path.isdir(vdir):
            continue
        ver = int(m.group(1))
        for sub in sorted(os.listdir(vdir)):
            if "=" not in sub:
                continue
            # Directory names are Hive percent-ESCAPED; manifest keys
            # are the DECODED values (snapshot_commit's cow_delete
            # lesson).  Probing the live set with the raw suffix made
            # any escapable partition value (':', '%', '=', ...) look
            # orphaned and rmtree'd a LIVE shared partition — found by
            # the round-14 advisor's repro (value 'a:x': v1/m=a%3Ax
            # deleted with both manifests retained).
            part = unquote(sub.split("=", 1)[1])
            if (ver, part) in live:
                continue
            full = os.path.join(vdir, sub)
            if now - os.path.getmtime(full) < min_age_s:
                continue  # concurrent-writer guard
            shutil.rmtree(full)
            removed.append(f"{entry}/{sub}")
    return {"removed": removed}


# --- S19: file-skipping stats that travel with the snapshot ---------------------


def snapshot_commit_stats(
    spark: SparkSession, base: str, version: int, columns: list
) -> dict:
    """Persist footer min/max stats for the files VERSION wrote —
    ``_stats_v{k}.json`` beside the manifest, keyed by base-relative
    path.  The sweep covers ONLY ``v{k}``'s directory, so stats cost
    is commit-proportional: partitions a commit shares by reference
    keep the stats row their owning version already published, exactly
    as they keep the data files.  This is the Iceberg/Delta contract
    of stats living in the table metadata (manifest entries / the
    transaction log) rather than in a side index that goes stale the
    moment the table advances — :func:`snapshot_stats_for` reassembles
    the per-version ledgers through the manifest, giving every
    snapshot its own exact stats view.

    Columns must be int/long/string-statted (JSON-portable); that
    covers the skipping keys the S13 family uses.  Run it right after
    :func:`snapshot_commit` with the same version number — a version
    with data but no stats ledger makes :func:`snapshot_stats_for`
    refuse loudly rather than silently skip nothing."""
    import os

    from update_database_by_wind_spark.operators.storage import (
        build_file_stats_index,
    )

    vdir = os.path.join(base, f"v{version}")
    rows = build_file_stats_index(spark, vdir, list(columns)).collect()
    stats = {
        os.path.relpath(r["file"], base): {
            k: v for k, v in r.asDict().items() if k != "file"
        }
        for r in rows
    }
    atomic_write_json(
        os.path.join(base, f"_stats_v{version}.json"), stats
    )
    return stats


def snapshot_commit_with_stats(
    spark: SparkSession,
    df: DataFrame,
    base: str,
    version: int,
    partition_col: str,
    stat_cols: list,
    parts: list | None = None,
) -> dict:
    """Commit + stats as ONE protocol step: :func:`snapshot_commit`
    publishes the data and manifest, then :func:`snapshot_commit_stats`
    publishes the version's stats ledger.  Crash ordering is the
    contract: the ledger is written strictly AFTER the manifest, so a
    crash in the gap leaves the version fully READABLE
    (snapshot_read never consults stats) while every stats-routed
    band read refuses loudly (:func:`snapshot_stats_for`'s missing-
    ledger error) instead of silently scanning nothing — and recovery
    is exactly one idempotent re-run of ``snapshot_commit_stats`` for
    the named version (the footer sweep rereads immutable committed
    files; atomic_write_json republishes the same ledger).  The
    reverse order would be wrong twice over: a ledger describing
    files that never published poisons :func:`snapshot_stats_for`'s
    reachability claim, and snapshot_commit's own crash-retry path
    (stage + rename) could legitimately produce different file names
    on the retry.

    Returns the stats ledger (the commit's manifest is on disk, same
    as snapshot_commit)."""
    snapshot_commit(df, base, version, partition_col, parts)
    return snapshot_commit_stats(spark, base, version, stat_cols)


def snapshot_stats_for(
    base: str, version: int, partition_col: str
) -> dict:
    """The stats view AS OF a snapshot: resolve the manifest's
    partition → owning-version map and pull each partition's file
    entries from the OWNER's stats ledger.  Metadata-only (one JSON
    per referenced version), and the result covers exactly the files
    :func:`snapshot_read` at that version would scan — shared
    partitions carry their original stats by reference, rewritten
    ones carry the rewriter's.  Partition-dir components are DECODED
    before matching (Hive percent-escapes values — the
    partition_orphan_gc lesson)."""
    import json as _json
    import os
    from urllib.parse import unquote

    with open(os.path.join(base, f"_manifest_v{version}.json")) as fh:
        manifest: dict[str, int] = _json.load(fh)
    ledgers: dict[int, dict] = {}
    grouped: dict[int, dict[str, dict]] = {}
    prefix = f"{partition_col}="
    merged: dict[str, dict] = {}
    for part, ver in manifest.items():
        if ver not in ledgers:
            path = os.path.join(base, f"_stats_v{ver}.json")
            if not os.path.exists(path):
                raise ValueError(
                    f"snapshot_stats_for: version {ver} has no stats "
                    "ledger; run snapshot_commit_stats at commit time"
                )
            with open(path) as fh:
                ledgers[ver] = _json.load(fh)
            by_part: dict[str, dict] = {}
            for rel, s in ledgers[ver].items():
                comp = rel.split("/")[1]
                if not comp.startswith(prefix):
                    raise ValueError(
                        f"snapshot_stats_for: ledger entry {rel!r} is "
                        f"not under a {partition_col}= directory"
                    )
                by_part.setdefault(
                    unquote(comp[len(prefix):]), {}
                )[rel] = s
            grouped[ver] = by_part
        merged.update(grouped[ver].get(part, {}))
    return merged


def snapshot_read_pruned(
    spark: SparkSession,
    base: str,
    version: int,
    partition_col: str,
    column: str,
    lo,
    hi,
) -> tuple[DataFrame, list, int]:
    """Band read of a snapshot THROUGH its travelling stats: files
    whose ``[column_min, column_max]`` cannot intersect ``[lo, hi]``
    are dropped before any scan is planned.  Returns
    ``(df, kept, n_total)`` — ``kept`` is the base-relative path list
    the read actually plans over, so callers can assert both that
    skipping engaged (``len(kept) < n_total``) and that the executed
    scan stayed inside it, against the SAME rule the read used rather
    than a re-derivation that could drift (round-15 reviewer).  The
    point versus S13's side index: the pruning decision here is valid
    AS OF the snapshot — time travel to v1 prunes with v1-era stats
    even after v2 rewrote half the table — and a predicate on a
    NON-partition column can skip whole partitions without the reader
    knowing the partition transform (Iceberg's hidden-partitioning
    read path)."""
    merged = snapshot_stats_for(base, version, partition_col)
    kept = sorted(
        rel
        for rel, s in merged.items()
        if s[f"{column}_min"] <= hi and s[f"{column}_max"] >= lo
    )
    if not kept:
        empty = snapshot_read(
            spark, base, version, partition_col
        ).limit(0)
        return empty, [], len(merged)
    out = _assemble_kept_scan(spark, base, kept)
    return (
        out.filter(F.col(column).between(lo, hi)),
        kept,
        len(merged),
    )


def _assemble_kept_scan(
    spark: SparkSession, base: str, kept: list
) -> DataFrame:
    """Plan a scan over exactly the kept base-relative files, one
    basePath-anchored read per owning version dir (the partition
    column is recovered from the dir names), unioned by name — shared
    by the single-band and conjunctive multi-band snapshot reads."""
    import os
    from collections import defaultdict

    by_vdir: dict[str, list] = defaultdict(list)
    for rel in kept:
        by_vdir[rel.split("/")[0]].append(os.path.join(base, rel))
    scans = [
        spark.read.option("basePath", os.path.join(base, vd)).parquet(
            *sorted(files)
        )
        for vd, files in sorted(by_vdir.items())
    ]
    out = scans[0]
    for sc in scans[1:]:
        out = out.unionByName(sc)
    return out


def snapshot_read_pruned_multi(
    spark: SparkSession,
    base: str,
    version: int,
    partition_col: str,
    bands: dict,
) -> tuple[DataFrame, list, int]:
    """CONJUNCTIVE band read of a snapshot through its travelling
    stats — S13's ``skipping_read_multi`` semantics on the snapshot
    path: ``bands`` maps ``column -> (lo, hi)``, a file survives only
    when EVERY band intersects its footer ``[min, max]``, and the one
    merged stats view (one JSON probe per referenced owner version)
    serves all predicates at once.  The kept set is by construction
    the INTERSECTION of the per-column kept sets — the s21 receipt
    pins that identity against the single-band reads — and the
    executed scan re-applies every band as a data filter, so the
    stats can only ever drop provably-empty files, never rows.

    Why conjunctive pruning needs LAYOUT, not just stats: a band on
    one column prunes only where the layout correlates files with
    that column.  The s21 fixture gets two independent dimensions by
    composing the partition transform (bucket dirs carry the custkey
    correlation) with in-dir range clustering on cents
    (:func:`cluster_partitions`) — each file then spans a narrow band
    of BOTH columns, and the conjunctive read keeps strictly fewer
    files than either single-column read."""
    merged = snapshot_stats_for(base, version, partition_col)
    kept = sorted(
        rel
        for rel, s in merged.items()
        if all(
            s[f"{c}_min"] <= hi and s[f"{c}_max"] >= lo
            for c, (lo, hi) in bands.items()
        )
    )
    if not kept:
        empty = snapshot_read(
            spark, base, version, partition_col
        ).limit(0)
        return empty, [], len(merged)
    out = _assemble_kept_scan(spark, base, kept)
    for c, (lo, hi) in sorted(bands.items()):
        out = out.filter(F.col(c).between(lo, hi))
    return out, kept, len(merged)


# --- U36: travelling stats stay exact across layout rewrites --------------------


def snapshot_stats_resync(
    spark: SparkSession, base: str, version: int, partition_col: str
) -> dict:
    """Re-true ``version``'s travelling stats ledger against what is
    actually on disk under ``v{version}`` — the repair half of the
    layout-coherence protocol: ledger entries whose file no longer
    exists are dropped, and files on disk the ledger does not cover
    get fresh footer entries, swept per PARTITION dir so the cost is
    proportional to the partitions a rewrite touched, never the
    version.  The stat columns are inferred from the ledger itself
    (``{col}_min``/``{col}_max`` keys), so a resync can never drift
    from what the commit originally tracked.

    Idempotent and self-healing by construction: a crash anywhere
    (including between a compaction's data swap and its ledger
    republish) is recovered by re-running this function — existence
    is the only signal it needs, so it never has to know WHICH
    rewrite died.  A clean ledger returns all-empty deltas without
    writing.  Refuses loudly when the version has no ledger (the
    snapshot_commit_with_stats contract) or an empty one (no entries
    to infer columns from)."""
    import json as _json
    import os

    from update_database_by_wind_spark.operators.storage import (
        build_file_stats_index,
    )

    ledger_path = os.path.join(base, f"_stats_v{version}.json")
    if not os.path.exists(ledger_path):
        raise ValueError(
            f"snapshot_stats_resync: version {version} has no stats "
            "ledger; run snapshot_commit_stats at commit time"
        )
    with open(ledger_path) as fh:
        ledger: dict[str, dict] = _json.load(fh)
    # the same ledger-shape validation snapshot_stats_for performs
    # (round-15 review: an unused partition_col parameter implied a
    # check that never ran — a caller naming the wrong column must
    # hear about it, not get a silent pass)
    prefix = f"{partition_col}="
    for rel in ledger:
        if not rel.split("/")[1].startswith(prefix):
            raise ValueError(
                f"snapshot_stats_resync: ledger entry {rel!r} is not "
                f"under a {partition_col}= directory"
            )
    vdir = os.path.join(base, f"v{version}")
    on_disk: set[str] = set()
    for root_, dirs, files in os.walk(vdir):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        on_disk.update(
            os.path.relpath(os.path.join(root_, f), base)
            for f in files
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
    dead = sorted(k for k in ledger if k not in on_disk)
    uncovered = sorted(p for p in on_disk if p not in ledger)
    if not dead and not uncovered:
        # includes the total-deletion edge the churn fuzz found: an
        # EMPTY ledger over an empty version dir is trivially coherent,
        # and refusing it broke the "re-running recovery is free"
        # contract after a rewrite removed every partition
        return {"dropped": [], "added": [], "resynced_parts": []}
    if uncovered and not ledger:
        # files appeared under a version whose ledger holds no entry to
        # infer the tracked stat columns from — not a state the commit
        # or maintenance protocols can produce; refuse loudly
        raise ValueError(
            f"snapshot_stats_resync: version {version}'s ledger is "
            "empty but files exist on disk — no entries to infer the "
            "tracked stat columns from"
        )
    stat_cols = sorted(
        {
            k[: -len("_min")]
            for k in next(iter(ledger.values()))
            if k.endswith("_min")
        }
    )
    for k in dead:
        del ledger[k]
    # footer re-sweep ONLY for partition dirs holding uncovered files;
    # a dropped-only partition (files deleted, nothing new) needs none
    for comp in sorted({p.split("/")[1] for p in uncovered}):
        rows = build_file_stats_index(
            spark, os.path.join(vdir, comp), stat_cols
        ).collect()
        for r in rows:
            ledger[os.path.relpath(r["file"], base)] = {
                k: v for k, v in r.asDict().items() if k != "file"
            }
    atomic_write_json(ledger_path, ledger)
    return {
        "dropped": dead,
        "added": uncovered,
        "resynced_parts": sorted(
            {p.split("/")[1] for p in [*dead, *uncovered]}
        ),
    }


def snapshot_compact_stats(
    spark: SparkSession,
    base: str,
    version: int,
    partition_col: str,
    max_files: int = 8,
    target_files: int = 1,
    only: list | None = None,
) -> dict:
    """Compact INSIDE a snapshot version's directory and keep that
    version's travelling stats ledger exact — the coherence step the
    round-15 ledger named: stats key on immutable version dirs, so an
    ordinary table rewrite invalidates nothing, but a compaction
    (or any layout maintenance) that rewrites files UNDER ``v{k}``
    must republish ``_stats_v{k}.json`` or every snapshot whose
    manifest references those partitions from ``v{k}`` plans band
    reads over files that no longer exist.

    Composition, both halves already hardened: the rewrite is
    :func:`compact_partitions` on the version dir (census → policy →
    targeted rename-swap, self-healing against its own crash
    residue), the republish is :func:`snapshot_stats_resync`
    (existence-driven, partition-proportional).  Crash ordering: data
    swaps first, ledger after — a crash in the gap leaves stats-
    routed reads FAILING LOUDLY on missing files (never silently
    wrong: plain snapshot reads don't consult stats, and a pruned
    read plans over paths that no longer resolve), and recovery is
    one idempotent re-run of either this function or the resync
    alone.  Refuses before touching any data when the version has no
    ledger, so the protocol can't create the very incoherence it
    exists to prevent.

    Content-preservation is what makes this safe for SHARED
    partitions: a manifest in ANY later snapshot that maps a
    partition to ``v{k}`` reads the compacted files with identical
    rows, and :func:`snapshot_stats_for` hands it the republished
    entries — coherence travels to every snapshot, which the u36
    receipts check at a version that was committed before the
    rewrite ran."""
    import os

    if not os.path.exists(os.path.join(base, f"_stats_v{version}.json")):
        raise ValueError(
            f"snapshot_compact_stats: version {version} has no stats "
            "ledger; a layout rewrite without a ledger to republish "
            "would strand every stats-routed read — run "
            "snapshot_commit_stats first"
        )
    report = compact_partitions(
        spark,
        os.path.join(base, f"v{version}"),
        partition_col,
        max_files=max_files,
        target_files=target_files,
        only=only,
    )
    sync = snapshot_stats_resync(spark, base, version, partition_col)
    return {**report, **{f"stats_{k}": v for k, v in sync.items()}}


# --- U41: the change feed pruned through the travelling stats ---------------------


def _stats_band_by_partition(
    base: str, version: int, partition_col: str, column: str
) -> dict:
    """Partition-level ``column`` bands AS OF a snapshot: fold the
    version's merged stats view (:func:`snapshot_stats_for`) from
    per-file ``[min, max]`` to per-partition ``[min, max]`` — the
    granularity the changelog prunes at (the diff's unit of work is
    the partition, not the file: file-level pruning would starve the
    full-outer key join of images and misclassify rows)."""
    from urllib.parse import unquote

    merged = snapshot_stats_for(base, version, partition_col)
    prefix = f"{partition_col}="
    bands: dict[str, tuple] = {}
    for rel, s in merged.items():
        part = unquote(rel.split("/")[1][len(prefix):])
        mn, mx = s[f"{column}_min"], s[f"{column}_max"]
        if part in bands:
            bands[part] = (min(bands[part][0], mn), max(bands[part][1], mx))
        else:
            bands[part] = (mn, mx)
    return bands


def snapshot_changes_pruned(
    spark: SparkSession,
    base: str,
    v_from: int,
    v_to: int,
    partition_col: str,
    key_col: str,
    value_cols: list,
    column: str,
    lo,
    hi,
) -> tuple[DataFrame, list, list]:
    """U20's changelog pruned through S19's travelling stats — the
    r15 ledger's round-16 candidate #2: a CDC consumer that only cares
    about a band of ``column`` (a tenant range, a key shard, a price
    tier) should pay for the partitions whose CHANGE could touch the
    band, not for every partition the commit rewrote.

    Two-stage pruning, both metadata-only:

    1. the manifest diff (U20's rule) — only partitions whose owning
       version differs can hold changed rows;
    2. the stats rule — a changed partition is scanned only if EITHER
       side's partition-level ``[min, max]`` on ``column``
       (reassembled version-exactly through the manifests, so the
       from-side prunes with from-era stats) intersects ``[lo, hi]``.
       Skipping needs BOTH sides disjoint because the changelog's
       band semantics is ``before ∈ band OR after ∈ band``: a row
       repriced INTO the band lives in a partition whose to-side
       stats intersect even when the from-side's do not.

    The pruning unit is the PARTITION, deliberately coarser than the
    band reads' file-level rule: the diff's full-outer join needs the
    complete key set of both images per partition — dropping
    band-disjoint FILES inside a surviving partition would make their
    rows look inserted/deleted.  Returns ``(changelog, scanned,
    changed)``; a band disjoint from every changed partition returns
    the empty changelog with ``scanned == []`` — zero files planned,
    the metadata-only receipt.  ``column`` must be in ``value_cols``
    (the band filter needs both images).

    At 100 TB: a nightly commit rewrites 1% of partitions; a sharded
    consumer's band intersects a few of those.  U20 alone scans 2% of
    the table; this scans both images of only the intersecting
    partitions and decides the rest from two JSON probes."""
    import json as _json
    import os

    if column not in value_cols:
        raise ValueError(
            f"snapshot_changes_pruned: band column {column!r} must be "
            f"in value_cols {value_cols} — the changelog filter needs "
            "its before/after images"
        )

    def manifest(v: int) -> dict:
        with open(os.path.join(base, f"_manifest_v{v}.json")) as fh:
            return _json.load(fh)

    m_from, m_to = manifest(v_from), manifest(v_to)
    changed = sorted(
        p
        for p in set(m_from) | set(m_to)
        if m_from.get(p) != m_to.get(p)
    )
    band_f = _stats_band_by_partition(base, v_from, partition_col, column)
    band_t = _stats_band_by_partition(base, v_to, partition_col, column)

    def hits(bands: dict, p: str) -> bool:
        if p not in bands:
            return False
        mn, mx = bands[p]
        return mn <= hi and mx >= lo

    scanned = [p for p in changed if hits(band_f, p) or hits(band_t, p)]

    # vintage semantics, same as snapshot_changes': a value column one
    # endpoint's vintage lacks is NULL-backfilled typed from the side
    # that has it, absent-from-both refuses loudly — the band-scoped
    # feed must survive exactly the evolved spans the plain feed does
    # (st25/st28/st30's daemons consume widening commits through here)
    raw_old = snapshot_read(spark, base, v_from, partition_col)
    raw_new = snapshot_read(spark, base, v_to, partition_col)
    dt_old, dt_new = dict(raw_old.dtypes), dict(raw_new.dtypes)
    ghost = [c for c in value_cols if c not in dt_old and c not in dt_new]
    if ghost:
        raise ValueError(
            f"snapshot_changes_pruned: value columns {ghost} exist at "
            f"neither v{v_from} nor v{v_to} — not a vintage gap, a "
            "caller error"
        )

    def side(
        raw: DataFrame, m: dict, dts: dict, other: dict
    ) -> DataFrame:
        parts = [p for p in scanned if p in m]
        out = raw.select(
            partition_col,
            key_col,
            *[
                F.col(c) if c in dts
                else F.lit(None).cast(other[c]).alias(c)
                for c in value_cols
            ],
        )
        if not parts:
            return out.limit(0)
        return out.filter(F.col(partition_col).isin(parts))

    old = side(raw_old, m_from, dt_old, dt_new).alias("a")
    new = side(raw_new, m_to, dt_new, dt_old).alias("b")
    joined = old.join(
        new,
        on=[
            F.col(f"a.{partition_col}") == F.col(f"b.{partition_col}"),
            F.col(f"a.{key_col}") == F.col(f"b.{key_col}"),
        ],
        how="full_outer",
    )
    differs = F.lit(False)
    for c in value_cols:
        differs = differs | ~F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}"))
    out = joined.filter(
        F.col(f"a.{key_col}").isNull()
        | F.col(f"b.{key_col}").isNull()
        | differs
    ).select(
        F.coalesce(f"a.{partition_col}", f"b.{partition_col}").alias(
            partition_col
        ),
        F.coalesce(f"a.{key_col}", f"b.{key_col}").alias(key_col),
        F.when(F.col(f"a.{key_col}").isNull(), "insert")
        .when(F.col(f"b.{key_col}").isNull(), "delete")
        .otherwise("update")
        .alias("change_type"),
        *[F.col(f"a.{c}").alias(f"{c}_before") for c in value_cols],
        *[F.col(f"b.{c}").alias(f"{c}_after") for c in value_cols],
    )
    return (
        out.filter(
            F.col(f"{column}_before").between(lo, hi)
            | F.col(f"{column}_after").between(lo, hi)
        ),
        scanned,
        changed,
    )


# --- S20: clustering maintenance on the snapshot path ---------------------------


def cluster_partitions(
    spark: SparkSession,
    table_path: str,
    partition_col: str,
    cluster_col: str,
    files_per_part: int = 6,
    only: list | None = None,
) -> dict:
    """Range-cluster each partition directory on ``cluster_col`` —
    the 1-D case of S10's z-order, as MAINTENANCE: every partition is
    rewritten into ``files_per_part`` range-disjoint, internally
    sorted files (``repartitionByRange`` + ``sortWithinPartitions``),
    so each file's footer min/max spans a narrow band of the cluster
    key and stats-routed reads skip most files — the property an
    append-order ingest does not have (arrival order is uncorrelated
    with the cluster key, so every file spans the whole domain and
    skipping keeps everything).

    ``only`` scopes the work order to the named partitions (decoded
    values), same contract as :func:`compact_partitions`.  The
    rename-swap protocol and the ``_compact_tmp_``/``_compact_old_``
    staging names are deliberately IDENTICAL to compact_partitions'
    (including the staging-name law: no "=" in hidden names), so
    :func:`recover_interrupted_compaction` heals a crashed clustering
    pass exactly as it heals a crashed compaction — one recovery
    protocol for every partition rewriter.  The swap loop is kept
    separate from compact_partitions rather than parameterized into
    it so the hardened scheduler path stays byte-identical and its
    driver evidence stays valid.

    At 100 TB: clustering cost is proportional to the partitions
    named (one sort each, no shuffle across partitions — the
    partition dir IS the unit), and the payoff is permanent: every
    band read on the cluster key afterwards plans over
    ``~1/files_per_part`` of the files."""
    import os
    import shutil

    recover_interrupted_compaction(table_path, partition_col)
    targets = small_file_census(table_path, partition_col)
    if only is not None:
        from urllib.parse import unquote

        want = {str(v) for v in only}
        targets = [t for t in targets if unquote(t["partition"]) in want]
    for c in targets:
        if c["n_files"] == 0:
            # an empty partition dir (possible after partition-granular
            # GC interleavings) has nothing to sort and would fail the
            # staged read — clustering it is vacuously done
            continue
        stage = os.path.join(
            table_path, f"_compact_tmp_{c['partition']}"
        )
        old = os.path.join(
            table_path, f"_compact_old_{c['partition']}"
        )
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)
        (
            spark.read.parquet(c["dir"])
            .repartitionByRange(files_per_part, F.col(cluster_col))
            .sortWithinPartitions(cluster_col)
            .write.parquet(stage)
        )
        os.replace(c["dir"], old)
        os.replace(stage, c["dir"])
        shutil.rmtree(old)
    return {
        "clustered": sorted(
            t["partition"] for t in targets if t["n_files"] > 0
        )
    }


def snapshot_cluster_stats(
    spark: SparkSession,
    base: str,
    version: int,
    partition_col: str,
    cluster_col: str,
    files_per_part: int = 6,
    only: list | None = None,
) -> dict:
    """Cluster INSIDE a snapshot version's directory and keep that
    version's travelling stats ledger exact — :func:`cluster_partitions`
    on ``v{k}`` followed by :func:`snapshot_stats_resync`, the same
    coherence protocol as :func:`snapshot_compact_stats` with the
    other rewriter: compaction makes skipping CHEAPER (fewer files),
    clustering makes it SHARPER (narrower per-file spans at the same
    data), and both must republish the ledger or every snapshot
    referencing the rewritten partitions plans band reads over dead
    files.  Same crash contract: refuse before touching data when the
    version has no ledger; data swaps first, ledger after; recovery
    is an idempotent re-run of either this function or the resync
    alone."""
    import os

    if not os.path.exists(os.path.join(base, f"_stats_v{version}.json")):
        raise ValueError(
            f"snapshot_cluster_stats: version {version} has no stats "
            "ledger; a layout rewrite without a ledger to republish "
            "would strand every stats-routed read — run "
            "snapshot_commit_stats first"
        )
    report = cluster_partitions(
        spark,
        os.path.join(base, f"v{version}"),
        partition_col,
        cluster_col,
        files_per_part=files_per_part,
        only=only,
    )
    sync = snapshot_stats_resync(spark, base, version, partition_col)
    return {**report, **{f"stats_{k}": v for k, v in sync.items()}}
