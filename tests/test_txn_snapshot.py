"""U19 multi-table transaction laws (operators/update_pipeline.py):

1. the txn pointer is the only publish — a crash after some tables
   committed but before the pointer leaves the previous transaction
   fully intact, and the retry reclaims the orphaned table commits
   (which snapshot_commit's own already-committed guard would
   otherwise refuse) and converges;
2. tables untouched by a transaction resolve through the pointer to
   their older versions — no table-version numerology;
3. pointer guards mirror the single-table ones (no gaps, no
   re-commit of a published transaction);
4. orphan reclamation never touches a table version any retained
   pointer references.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from update_database_by_wind_spark.operators.update_pipeline import (
    snapshot_commit,
    txn_commit,
    txn_read,
)

_SCHEMA = "pk long, m string, val long"


def _df(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def _rows(df):
    return sorted(map(tuple, df.select("pk", "m", "val").collect()))


def _seed(spark, base):
    txn_commit(
        spark, base, 1,
        {
            "a": (_df(spark, [(1, "x", 10), (2, "y", 20)]), "m", None),
            "b": (_df(spark, [(1, "x", 100), (2, "y", 200)]), "m", None),
        },
    )


def test_crashed_attempt_is_invisible_and_retry_converges(spark, tmp_path):
    base = str(tmp_path / "t")
    _seed(spark, base)
    # crash state: table a committed its v2 (with STALE data from the
    # failed attempt), pointer never written
    snapshot_commit(
        _df(spark, [(1, "x", 999)]), os.path.join(base, "a"), 2, "m",
        parts=["x"],
    )
    # readers at txn v1 see the pre-crash state of BOTH tables
    assert _rows(txn_read(spark, base, 1, "a", "m")) == [
        (1, "x", 10), (2, "y", 20),
    ]
    # the retry (with the REAL correction) reclaims the orphan first
    txn_commit(
        spark, base, 2,
        {
            "a": (_df(spark, [(1, "x", 11)]), "m", ["x"]),
            "b": (_df(spark, [(1, "x", 101)]), "m", ["x"]),
        },
    )
    assert _rows(txn_read(spark, base, 2, "a", "m")) == [
        (1, "x", 11), (2, "y", 20),
    ]
    assert _rows(txn_read(spark, base, 2, "b", "m")) == [
        (1, "x", 101), (2, "y", 200),
    ]


def test_untouched_table_resolves_to_older_version(spark, tmp_path):
    base = str(tmp_path / "t")
    _seed(spark, base)
    txn_commit(
        spark, base, 2,
        {"a": (_df(spark, [(2, "y", 21)]), "m", ["y"])},  # b untouched
    )
    with open(os.path.join(base, "_txn_v2.json")) as fh:
        assert json.load(fh) == {"a": 2, "b": 1}
    assert _rows(txn_read(spark, base, 2, "b", "m")) == [
        (1, "x", 100), (2, "y", 200),
    ]
    assert _rows(txn_read(spark, base, 2, "a", "m")) == [
        (1, "x", 10), (2, "y", 21),
    ]


def test_pointer_guards(spark, tmp_path):
    base = str(tmp_path / "t")
    _seed(spark, base)
    with pytest.raises(ValueError, match="already committed"):
        txn_commit(
            spark, base, 1, {"a": (_df(spark, [(1, "x", 1)]), "m", None)}
        )
    with pytest.raises(ValueError, match="missing predecessor pointer"):
        txn_commit(
            spark, base, 3,
            {"a": (_df(spark, [(1, "x", 1)]), "m", ["x"])},
        )


def test_orphan_reclaim_spares_referenced_versions(spark, tmp_path):
    """A table version a retained pointer references is NEVER
    reclaimed, even when a later transaction advances the table."""
    base = str(tmp_path / "t")
    _seed(spark, base)
    txn_commit(
        spark, base, 2, {"a": (_df(spark, [(2, "y", 21)]), "m", ["y"])}
    )
    # both a@1 (referenced by txn 1) and a@2 (txn 2) must survive a
    # further commit's reclamation scan
    txn_commit(
        spark, base, 3, {"a": (_df(spark, [(1, "x", 12)]), "m", ["x"])}
    )
    for tv in (1, 2, 3):
        assert os.path.exists(
            os.path.join(base, "a", f"_manifest_v{tv}.json")
        )
    assert _rows(txn_read(spark, base, 1, "a", "m")) == [
        (1, "x", 10), (2, "y", 20),
    ]
    assert _rows(txn_read(spark, base, 3, "a", "m")) == [
        (1, "x", 12), (2, "y", 21),
    ]
