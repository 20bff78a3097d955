"""Filesystem durability helpers shared by the metadata-commit paths
(snapshot manifests, txn pointers, ingest checkpoints)."""

from __future__ import annotations

import glob
import json
import os
import time

# a temp file this old cannot belong to a live writer — reclaiming
# younger ones would race a concurrent committer's os.replace (the
# round-8 third-pass review finding: deleting an in-flight tmp makes
# the other writer's replace raise AFTER its data already published).
# Assumption (documented per the round-8 advisor): metadata commits
# are single-writer per path and a writer never stalls longer than
# this between opening its tmp and replacing it — a >1h-stalled
# writer's live tmp WOULD be reclaimed and its replace would raise
# (fail loud, never torn).
_STALE_TMP_SECONDS = 3600


def atomic_write_json(path: str, payload) -> None:
    """Write JSON via same-directory temp file + ``os.replace`` so a
    crash mid-write can never leave a torn file at ``path`` (round-7
    advisor finding — the manifest pointer must be atomic for the
    'data first, pointer last' commit story to hold).  One shared
    implementation for every manifest/checkpoint writer (round-8
    review finding: two hand-rolled copies of durability-critical
    logic drift apart).

    Temp residue policy: a crash between the write and the replace
    leaves ``{path}.tmp.{pid}`` behind.  The residue is inert — every
    reader filters on the real name — and is reclaimed HERE, for all
    writers at once, only when old enough that no live writer can own
    it (age-gated; an unconditional delete would race a concurrent
    commit's replace), with the glob pattern escaped so metacharacters
    in ``path`` can neither hide the residue nor match unrelated
    files."""
    now = time.time()
    for stale in glob.glob(glob.escape(path) + ".tmp.*"):
        try:
            if now - os.path.getmtime(stale) > _STALE_TMP_SECONDS:
                os.remove(stale)
        except OSError:
            pass  # already reclaimed by a concurrent writer
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(payload, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, path)
    # the rename publishes the pointer, but the rename itself lives in
    # the parent directory's metadata — fsync the directory too, or a
    # power failure can roll the publish back after callers observed
    # it (advisor finding, round 8: 'data first, pointer last' needs
    # the pointer durable, not just un-torn)
    dfd = os.open(os.path.dirname(os.path.abspath(path)), os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def pin_snapshot(df, path: str):
    """Freeze a lazy DataFrame's CURRENT rows by writing them to
    scratch parquet and re-reading — a distributed checkpoint for the
    multi-phase lifecycle queries whose later phases mutate the files
    underneath an earlier phase's plan (MOR compaction, vector GC,
    checkpoint cleanup).

    Replaces the old ``spark.createDataFrame(df.collect(), df.schema)``
    driver round-trip (round-11 verdict sweep): same freezing effect
    and identical schema (parquet preserves Spark types exactly), but
    the rows never visit the driver, so the pattern is safe at ANY
    snapshot size, not just the month-cardinality rollups it happened
    to carry.  The caller owns ``path``'s lifecycle — the lifecycle
    queries put pins inside their tag-scoped scratch dir, recreated
    per run and left for the driver to finish collecting from.

    LIFETIME CONTRACT (round-13, advisor finding): unlike the
    ``collect()`` round-trip it replaced, the returned frame is still
    LAZY over the scratch files — it is a snapshot of the data, not of
    the result's liveness.  A result must be fully consumed before the
    same query runs again against the same ``sf_dir``: the re-run's
    first act is an ``rmtree`` of the tag-scoped scratch dir, which
    pulls the files out from under any frame still held from the
    previous run (and two CONCURRENT runs of one query on one sf_dir
    race the same way — the driver runs serially, and local runs must
    too, per the repo's verify protocol).  Callers needing a pin that
    survives re-runs should pass a path containing their own
    per-invocation nonce; the lifecycle queries deliberately do not,
    so their scratch space is bounded by tag count, not run count."""
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)
