"""Filesystem durability helpers shared by the metadata-commit paths
(snapshot manifests, ingest checkpoints)."""

from __future__ import annotations

import json
import os


def atomic_write_json(path: str, payload) -> None:
    """Write JSON via same-directory temp file + ``os.replace`` so a
    crash mid-write can never leave a torn file at ``path`` (round-7
    advisor finding — the manifest pointer must be atomic for the
    'data first, pointer last' commit story to hold).  One shared
    implementation for every manifest/checkpoint writer (round-8
    review finding: two hand-rolled copies of durability-critical
    logic drift apart)."""
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(payload, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, path)
