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
   pointer references — and when the target version IS referenced,
   the commit refuses rather than destroying published data;
5. the consistency receipt has teeth: a deliberately torn pointer
   (child table new, parent old) makes the orphan anti-join fire —
   on the toy ledger here AND at the registry query's own scale
   (= 10, the documented figure).
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
        base, 1,
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
        base, 2,
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
        base, 2,
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
            base, 1, {"a": (_df(spark, [(1, "x", 1)]), "m", None)}
        )
    with pytest.raises(ValueError, match="missing predecessor pointer"):
        txn_commit(
            base, 3,
            {"a": (_df(spark, [(1, "x", 1)]), "m", ["x"])},
        )


def test_orphan_reclaim_spares_referenced_versions(spark, tmp_path):
    """Normal commits never delete referenced versions (every txn
    version remains readable after later commits) — and the sparing
    guard's protective direction is exercised directly: when the
    TARGET table version is referenced by a retained pointer, the
    reclamation must not touch it and the commit must REFUSE
    (snapshot_commit's already-committed guard) rather than destroy
    published data."""
    base = str(tmp_path / "t")
    _seed(spark, base)
    txn_commit(
        base, 2, {"a": (_df(spark, [(2, "y", 21)]), "m", ["y"])}
    )
    txn_commit(
        base, 3, {"a": (_df(spark, [(1, "x", 12)]), "m", ["x"])}
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
    # protective direction (second review pass, round 8: the original
    # test never reached the guard): corrupt state where the NEXT
    # target version a@4 already exists AND is referenced by a stray
    # retained pointer — reclamation must spare it and the commit must
    # raise, leaving manifest + data intact
    snapshot_commit(
        _df(spark, [(1, "x", 13)]), os.path.join(base, "a"), 4, "m",
        parts=["x"],
    )
    with open(os.path.join(base, "_txn_v9.json"), "w") as fh:
        json.dump({"a": 4}, fh)
    with pytest.raises(ValueError, match="already committed"):
        txn_commit(
            base, 4, {"a": (_df(spark, [(1, "x", 14)]), "m", ["x"])}
        )
    assert os.path.exists(os.path.join(base, "a", "_manifest_v4.json"))
    assert os.path.isdir(os.path.join(base, "a", "v4"))


def test_torn_pointer_fires_the_orphan_detector(spark, tmp_path):
    """The u19 consistency receipt must have teeth: keys that exist
    only at a later table version orphan their child rows under a
    deliberately TORN pointer (child table at v2, parent at v1) —
    proving orphan-count zero in the real query is a detection, not a
    tautology."""
    base = str(tmp_path / "t")
    # parent/child: child rows reference parent pks; v2 adds pk 3 to
    # BOTH tables in the same transaction
    txn_commit(
        base, 1,
        {
            "parent": (_df(spark, [(1, "x", 0), (2, "y", 0)]), "m", None),
            "child": (_df(spark, [(1, "x", 11), (2, "y", 22)]), "m", None),
        },
    )
    txn_commit(
        base, 2,
        {
            "parent": (_df(spark, [(3, "z", 0)]), "m", ["z"]),
            "child": (_df(spark, [(3, "z", 33)]), "m", ["z"]),
        },
    )

    def orphans(parent_df, child_df):
        return child_df.join(
            parent_df.select(F.col("pk").alias("k")),
            child_df["pk"] == F.col("k"),
            "left_anti",
        ).count()

    # consistent reads: zero orphans at both transactions
    for v in (1, 2):
        assert orphans(
            txn_read(spark, base, v, "parent", "m"),
            txn_read(spark, base, v, "child", "m"),
        ) == 0
    # torn resolution (child@2 against parent@1): the detector fires
    with open(os.path.join(base, "_txn_v1.json")) as fh:
        p1 = json.load(fh)
    with open(os.path.join(base, "_txn_v2.json")) as fh:
        p2 = json.load(fh)
    torn = {"parent": p1["parent"], "child": p2["child"]}
    with open(os.path.join(base, "_txn_v3.json"), "w") as fh:
        json.dump(torn, fh)
    assert orphans(
        txn_read(spark, base, 3, "parent", "m"),
        txn_read(spark, base, 3, "child", "m"),
    ) == 1


def test_registry_ledger_torn_pointer_orphans_ten_items(spark):
    """The docstring's concrete claim — 'a torn resolution yields ten
    orphaned lineitems' on the registry query's own ledger — asserted
    against the real artifact: run u19 at the smoke scale, then hand-
    write a torn pointer (items at table v2, orders at table v1) and
    count the 2024-01 late-booking lineitems left without parents."""
    import hashlib
    import tempfile

    from pyspark.sql import functions as F

    from update_database_by_wind_spark.operators.update_pipeline import (
        u19_txn_snapshot,
    )

    sf_dir = "/root/testdata/sf0.001"
    u19_txn_snapshot(spark, sf_dir).count()  # builds the ledger
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = f"{tempfile.gettempdir()}/wind_spark_txn_{tag}/ledger"
    with open(os.path.join(base, "_txn_v1.json")) as fh:
        p1 = json.load(fh)
    with open(os.path.join(base, "_txn_v2.json")) as fh:
        p2 = json.load(fh)
    torn = {"orders": p1["orders"], "items": p2["items"]}
    with open(os.path.join(base, "_txn_v3.json"), "w") as fh:
        json.dump(torn, fh)
    ov = txn_read(spark, base, 3, "orders", "o_month")
    lv = txn_read(spark, base, 3, "items", "o_month")
    orphans = lv.join(
        ov.select(F.col("o_orderkey").alias("k")),
        lv["l_orderkey"] == F.col("k"),
        "left_anti",
    )
    assert orphans.count() == 10
    assert [
        r["o_month"]
        for r in orphans.select("o_month").distinct().collect()
    ] == ["2024-01"]


# --- U30: occ_commit interleaving fuzz (round-14 widening plan (b)) ----------

import uuid

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as _hst

from update_database_by_wind_spark.operators.update_pipeline import (
    occ_commit,
    snapshot_read,
)

_OCC_MONTHS = ["2024-01", "2024-02", "2024-03", "2024-04"]

# a schedule of writers: each picks a partition subset and a staleness
# offset (how many commits ago it prepared its change).  Offsets make
# overlap-after-rewrite — the refusal case — common, not an edge case.
_OCC_SCHEDULES = _hst.lists(
    _hst.tuples(
        _hst.lists(
            _hst.sampled_from(_OCC_MONTHS),
            min_size=1,
            max_size=len(_OCC_MONTHS),
            unique=True,
        ),
        _hst.integers(min_value=0, max_value=3),
    ),
    min_size=1,
    max_size=5,
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(schedule=_OCC_SCHEDULES)
def test_occ_interleaving_fuzz(spark, tmp_path, schedule):
    """Randomized multi-writer schedules against a MODEL of the OCC
    ledger: writer i prepares against the head as of ``offset``
    commits ago, so schedules generate fast-path commits, rebase
    chains of arbitrary depth, and stale-overlap refusals in every
    interleaving.  The model predicts, for every writer, (a) refuse
    vs land, (b) the landed version number and rebased flag, and (c)
    the final partition→version ownership; the test then proves the
    real ledger agrees AND that refused writers left no manifest
    behind, and replays the expected surviving rows through
    snapshot_read.  This is the law u30's lifecycle query instantiates
    once; here it must hold for every interleaving hypothesis finds."""
    base = str(tmp_path / f"occ_{uuid.uuid4().hex[:8]}")
    seed = _df(
        spark,
        [(pk, m, 1000 + pk) for m in _OCC_MONTHS for pk in (1, 2)],
    )
    snapshot_commit(seed, base, 1, "m")
    owners = {m: 1 for m in _OCC_MONTHS}
    head = 1
    expect_rows = {
        (pk, m): 1000 + pk for m in _OCC_MONTHS for pk in (1, 2)
    }
    n_manifests = 1
    for i, (parts, offset) in enumerate(schedule):
        basev = max(1, head - offset)
        rows = [(pk, m, (i + 1) * 100 + pk) for m in parts for pk in (1, 2)]
        df = _df(spark, rows)
        conflicts = [m for m in parts if owners[m] > basev]
        if conflicts:
            with pytest.raises(ValueError, match="conflict on partitions"):
                occ_commit(df, base, basev, "m", parts=parts)
            # refusal is invisible: no manifest, no ownership change
        else:
            receipt = occ_commit(df, base, basev, "m", parts=parts)
            assert receipt == {
                "version": head + 1,
                "rebased": head > basev,
            }, (i, parts, offset, receipt)
            head += 1
            n_manifests += 1
            for m in parts:
                owners[m] = head
            for pk, m, v in rows:
                expect_rows[(pk, m)] = v
        manifests = [
            e
            for e in os.listdir(base)
            if e.startswith("_manifest_v") and e.endswith(".json")
        ]
        assert len(manifests) == n_manifests, (i, manifests)
    got = {
        (r.pk, r.m): r.val
        for r in snapshot_read(spark, base, head, "m").collect()
    }
    assert got == expect_rows
    # the head manifest's ownership map IS the model's
    with open(os.path.join(base, f"_manifest_v{head}.json")) as fh:
        assert json.load(fh) == owners


# --- U32: partition-granular orphan GC + hold release -------------------------

from update_database_by_wind_spark.operators.update_pipeline import (
    partition_orphan_gc,
    snapshot_tag,
    snapshot_tags,
    snapshot_untag,
)


def _seed_two_versions(spark, base):
    """v1 owns months a+b; v2 rewrites ONLY b — so v1/m=b is dead the
    moment v1's manifest goes, while v1/m=a stays shared."""
    snapshot_commit(
        _df(spark, [(1, "a", 10), (1, "b", 20)]), base, 1, "m"
    )
    snapshot_commit(
        _df(spark, [(1, "b", 21)]), base, 2, "m", parts=["b"]
    )


def test_partition_gc_removes_only_unreferenced_subdirs(spark, tmp_path):
    base = str(tmp_path / "t")
    _seed_two_versions(spark, base)
    # both manifests retained: nothing is dead yet
    assert partition_orphan_gc(base) == {"removed": []}
    # expire v1 (keep head): v1's dir survives whole-dir expiry because
    # v2 still routes m=a to it — but v1/m=b is now unreachable
    from update_database_by_wind_spark.operators.update_pipeline import (
        snapshot_expire,
    )

    snapshot_expire(base, keep_versions=[2])
    assert os.path.isdir(os.path.join(base, "v1", "m=a"))
    assert partition_orphan_gc(base) == {"removed": ["v1/m=b"]}
    assert os.path.isdir(os.path.join(base, "v1", "m=a"))
    assert not os.path.exists(os.path.join(base, "v1", "m=b"))
    # the surviving head still reads both months correctly
    got = _rows(snapshot_read(spark, base, 2, "m").select("pk", "m", "val"))
    assert got == [(1, "a", 10), (1, "b", 21)]
    # idempotent
    assert partition_orphan_gc(base) == {"removed": []}


def test_partition_gc_age_guard_spares_young_dirs(spark, tmp_path):
    base = str(tmp_path / "t")
    _seed_two_versions(spark, base)
    from update_database_by_wind_spark.operators.update_pipeline import (
        snapshot_expire,
    )

    snapshot_expire(base, keep_versions=[2])
    # everything here was written moments ago: a generous age threshold
    # must treat the dead subdir as a possible in-flight write
    assert partition_orphan_gc(base, min_age_s=3600) == {"removed": []}
    assert os.path.isdir(os.path.join(base, "v1", "m=b"))


def test_partition_gc_probes_with_decoded_hive_names(spark, tmp_path):
    """Round-14 advisor repro: directory names are Hive
    percent-ESCAPED ('a:x' -> m=a%3Ax) while manifest keys are the
    DECODED values — probing the live set with the raw suffix made
    every escapable partition value look orphaned, so the GC rmtree'd
    a LIVE shared partition with both manifests retained and the head
    read silently lost rows."""
    base = str(tmp_path / "t")
    snapshot_commit(
        _df(spark, [(1, "a:x", 10), (1, "b=c", 20)]), base, 1, "m"
    )
    snapshot_commit(
        _df(spark, [(1, "b=c", 21)]), base, 2, "m", parts=["b=c"]
    )
    import urllib.parse

    enc = {
        v: f"m={urllib.parse.quote(v, safe='')}" for v in ("a:x", "b=c")
    }
    assert os.path.isdir(os.path.join(base, "v1", enc["a:x"]))
    # both manifests retained: NOTHING is dead, escaped or not
    assert partition_orphan_gc(base) == {"removed": []}
    assert os.path.isdir(os.path.join(base, "v1", enc["a:x"]))
    # expire v1: only its rewritten b=c image is dead; the shared a:x
    # partition must survive and the head read must keep both rows
    from update_database_by_wind_spark.operators.update_pipeline import (
        snapshot_expire,
    )

    snapshot_expire(base, keep_versions=[2])
    assert partition_orphan_gc(base) == {
        "removed": [f"v1/{enc['b=c']}"]
    }
    assert os.path.isdir(os.path.join(base, "v1", enc["a:x"]))
    got = _rows(snapshot_read(spark, base, 2, "m").select("pk", "m", "val"))
    assert got == [(1, "a:x", 10), (1, "b=c", 21)]


def test_untag_is_explicit_and_refuses_missing(spark, tmp_path):
    base = str(tmp_path / "t")
    snapshot_commit(_df(spark, [(1, "a", 10)]), base, 1, "m")
    snapshot_tag(base, "hold", 1)
    assert snapshot_tags(base) == {"hold": 1}
    snapshot_untag(base, "hold")
    assert snapshot_tags(base) == {}
    with pytest.raises(ValueError, match="no ref named"):
        snapshot_untag(base, "hold")


# --- U33: transaction-level OCC ------------------------------------------------

from update_database_by_wind_spark.operators.update_pipeline import (
    txn_occ_commit,
)


def test_txn_occ_fast_rebase_refuse_and_carry(spark, tmp_path):
    """The three writer fates at the transaction level, plus the
    cross-table carry: a rebase's pointer must publish the concurrent
    transaction's versions for every table the rebasing writer never
    touched — and a refusal (any updated table's partition advanced
    past the writer's read) must leave pointers and manifests alone."""
    base = str(tmp_path / "g")
    txn_commit(
        base, 1,
        {
            "t1": (_df(spark, [(1, "a", 10), (1, "b", 20)]), "m", None),
            "t2": (_df(spark, [(1, "a", 1), (1, "b", 2)]), "m", None),
        },
    )
    # A: fast path on both tables' partition a
    r = txn_occ_commit(
        base, 1,
        {
            "t1": (_df(spark, [(1, "a", 11)]), "m", ["a"]),
            "t2": (_df(spark, [(1, "a", 5)]), "m", ["a"]),
        },
    )
    assert r == {"txn": 2, "rebased": False}
    # B: prepared against 1, touches only t1/m=b -> rebase; pointer
    # must carry t2 at A's version
    r = txn_occ_commit(
        base, 1, {"t1": (_df(spark, [(1, "b", 21)]), "m", ["b"])}
    )
    assert r == {"txn": 3, "rebased": True}
    with open(os.path.join(base, "_txn_v3.json")) as fh:
        assert json.load(fh) == {"t1": 3, "t2": 2}
    # C: prepared against 1, touches t2/m=a which A rewrote -> refused
    # as a WHOLE even though its t1 part is clean
    with pytest.raises(ValueError, match="conflict on partitions"):
        txn_occ_commit(
            base, 1,
            {
                "t1": (_df(spark, [(1, "b", 99)]), "m", ["b"]),
                "t2": (_df(spark, [(1, "a", 9)]), "m", ["a"]),
            },
        )
    ptrs = sorted(
        e for e in os.listdir(base) if e.startswith("_txn_v")
    )
    assert ptrs == ["_txn_v1.json", "_txn_v2.json", "_txn_v3.json"]
    # the group reads consistently at head: t1 has A+B, t2 has A only
    got1 = _rows(txn_read(spark, base, 3, "t1", "m"))
    got2 = _rows(txn_read(spark, base, 3, "t2", "m"))
    assert got1 == [(1, "a", 11), (1, "b", 21)]
    assert got2 == [(1, "a", 5), (1, "b", 2)]


def test_txn_occ_refuses_stale_full_table_update(spark, tmp_path):
    """A parts=None (full-table) update prepared against a stale
    transaction overlaps every partition concurrent work advanced —
    the commit must refuse loudly rather than skip validation."""
    base = str(tmp_path / "g")
    txn_commit(
        base, 1, {"t1": (_df(spark, [(1, "a", 10)]), "m", None)}
    )
    txn_occ_commit(
        base, 1, {"t1": (_df(spark, [(1, "a", 11)]), "m", ["a"])}
    )
    with pytest.raises(ValueError, match="declares no parts"):
        txn_occ_commit(
            base, 1, {"t1": (_df(spark, [(1, "a", 12)]), "m", None)}
        )


def test_txn_occ_refuses_expired_base_as_valueerror(spark, tmp_path):
    """A writer whose base transaction pointer was expired from
    history must get the same ValueError re-read/re-derive contract as
    every other refusal path — a raw FileNotFoundError breaks the
    caller's single except-ValueError retry loop (round-14 advisor)."""
    base = str(tmp_path / "g")
    txn_commit(
        base, 1, {"t1": (_df(spark, [(1, "a", 10)]), "m", None)}
    )
    txn_occ_commit(
        base, 1, {"t1": (_df(spark, [(1, "a", 11)]), "m", ["a"])}
    )
    # expire transaction 1 from history (retention kept only the head)
    os.remove(os.path.join(base, "_txn_v1.json"))
    with pytest.raises(ValueError, match="no longer retained"):
        txn_occ_commit(
            base, 1, {"t1": (_df(spark, [(1, "a", 12)]), "m", ["a"])}
        )
    # the refusal left no trace
    ptrs = sorted(e for e in os.listdir(base) if e.startswith("_txn_v"))
    assert ptrs == ["_txn_v2.json"]


# --- U34: multi-table CDF through the transaction pointer ----------------------


def test_txn_changes_resolves_through_pointer(spark, tmp_path):
    """txn_changes laws: per-table (from, to) versions come from the
    two pointer files (mutual consistency), an untouched table
    short-circuits to an empty feed with the right schema, a changed
    table yields snapshot_changes' row-level diff, and a table in
    neither pointer is a loud error."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        txn_changes,
    )

    base = str(tmp_path / "g")
    txn_commit(
        base, 1,
        {
            "t1": (_df(spark, [(1, "a", 10), (2, "b", 20)]), "m", None),
            "t2": (_df(spark, [(1, "a", 1), (2, "b", 2)]), "m", None),
        },
    )
    # txn 2 touches only t1: update pk 1, insert pk 3 into m=a
    txn_commit(
        base, 2,
        {"t1": (_df(spark, [(1, "a", 11), (3, "a", 30)]), "m", ["a"])},
    )
    spec = {"t1": ("m", "pk", ["val"]), "t2": ("m", "pk", ["val"])}
    feeds = txn_changes(spark, base, 1, 2, spec)
    got = sorted(
        (r["m"], r["pk"], r["change_type"], r["val_before"], r["val_after"])
        for r in feeds["t1"].collect()
    )
    assert got == [
        ("a", 1, "update", 10, 11),
        ("a", 3, "insert", None, 30),
    ]
    # untouched t2: empty via the pointer, schema identical to a real feed
    assert feeds["t2"].count() == 0
    assert feeds["t2"].columns == feeds["t1"].columns
    assert dict(feeds["t2"].dtypes) == dict(feeds["t1"].dtypes)
    # unknown table: loud refusal, not a fabricated "unchanged"
    with pytest.raises(ValueError, match="neither transaction"):
        txn_changes(spark, base, 1, 2, {"nope": ("m", "pk", ["val"])})
    # missing endpoint pointer: loud refusal
    with pytest.raises(ValueError, match="not retained"):
        txn_changes(spark, base, 1, 9, spec)


# --- S19: stats that travel with the snapshot ----------------------------------


def test_snapshot_stats_travel_by_reference(spark, tmp_path):
    """snapshot_commit_stats sweeps ONLY the committed version's dir;
    snapshot_stats_for reassembles a version-exact view through the
    manifest — carried partitions keep the owner's entries (including
    Hive-escaped dir names, matched decoded), rewritten ones swap to
    the rewriter's; a version without a ledger refuses loudly; and
    snapshot_read_pruned answers band reads identically to the full
    scan while keeping fewer files."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        snapshot_commit_stats,
        snapshot_read_pruned,
        snapshot_stats_for,
    )

    base = str(tmp_path / "t")
    snapshot_commit(
        _df(spark, [(1, "a:x", 10), (2, "a:x", 20), (3, "b", 30)]),
        base, 1, "m",
    )
    s1 = snapshot_commit_stats(spark, base, 1, ["pk", "val"])
    assert all(r.startswith("v1/m=") for r in s1) and len(s1) == 2
    # v2 rewrites only b; a:x travels by reference
    snapshot_commit(
        _df(spark, [(3, "b", 31), (4, "b", 40)]), base, 2, "m",
        parts=["b"],
    )
    s2 = snapshot_commit_stats(spark, base, 2, ["pk", "val"])
    assert all(r.startswith("v2/m=b/") for r in s2) and len(s2) == 1
    view1 = snapshot_stats_for(base, 1, "m")
    view2 = snapshot_stats_for(base, 2, "m")
    assert set(view1) == set(s1)
    ax = [r for r in view2 if "m=a%3Ax" in r]
    assert ax and view2[ax[0]] == s1[ax[0]], (
        "escaped partition must carry its v1 stats entry by reference"
    )
    assert [r for r in view2 if r.startswith("v2/")] == list(s2)
    # band read: pk band [3,4] lives only in m=b at v2
    df, kept, total = snapshot_read_pruned(
        spark, base, 2, "m", "pk", 3, 4
    )
    assert (len(kept), total) == (1, 2)
    assert kept[0].startswith("v2/m=b/")
    assert sorted((r["pk"], r["val"]) for r in df.collect()) == [
        (3, 31), (4, 40),
    ]
    # time travel: the SAME band at v1 prunes with v1-era stats
    df1, kept1, total1 = snapshot_read_pruned(
        spark, base, 1, "m", "pk", 3, 4
    )
    assert (len(kept1), total1) == (1, 2)
    assert kept1[0].startswith("v1/m=b/")
    assert sorted((r["pk"], r["val"]) for r in df1.collect()) == [
        (3, 30),
    ]
    # out-of-domain band: zero files, empty result, right schema
    dfe, kept0, _t = snapshot_read_pruned(
        spark, base, 2, "m", "pk", 99, 100
    )
    assert kept0 == [] and dfe.count() == 0
    assert set(dfe.columns) == {"pk", "m", "val"}
    # a version with no ledger refuses loudly
    os.remove(os.path.join(base, "_stats_v1.json"))
    with pytest.raises(ValueError, match="no stats ledger"):
        snapshot_stats_for(base, 2, "m")


def test_commit_with_stats_crash_ordering(spark, tmp_path):
    """snapshot_commit_with_stats' crash contract: the ledger publishes
    strictly AFTER the manifest, so the mid-gap crash state (manifest
    present, ledger absent) leaves the version fully readable while
    stats-routed reads refuse loudly — and recovery is one idempotent
    re-run of snapshot_commit_stats, converging to the same ledger."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        snapshot_commit_stats,
        snapshot_commit_with_stats,
        snapshot_read_pruned,
        snapshot_stats_for,
    )

    base = str(tmp_path / "t")
    s1 = snapshot_commit_with_stats(
        spark, _df(spark, [(1, "a", 10), (5, "b", 50)]), base, 1, "m",
        ["pk", "val"],
    )
    assert set(snapshot_stats_for(base, 1, "m")) == set(s1)
    # the crash gap: v2's manifest published, ledger never written
    snapshot_commit(
        _df(spark, [(5, "b", 51)]), base, 2, "m", parts=["b"]
    )
    assert _rows(snapshot_read(spark, base, 2, "m")) == [
        (1, "a", 10), (5, "b", 51),
    ]  # plain reads never consult stats
    with pytest.raises(ValueError, match="no stats ledger"):
        snapshot_stats_for(base, 2, "m")
    with pytest.raises(ValueError, match="no stats ledger"):
        snapshot_read_pruned(spark, base, 2, "m", "pk", 0, 9)
    # recovery: idempotent stats re-run for the named version
    s2a = snapshot_commit_stats(spark, base, 2, ["pk", "val"])
    s2b = snapshot_commit_stats(spark, base, 2, ["pk", "val"])
    assert s2a == s2b
    df, kept, total = snapshot_read_pruned(
        spark, base, 2, "m", "pk", 5, 9
    )
    assert (len(kept), total) == (1, 2)
    assert _rows(df) == [(5, "b", 51)]


def test_txn_changes_feeds_added_table_as_inserts(spark, tmp_path):
    """A table added to the group mid-history (absent at txn_from,
    present at txn_to) feeds its entire txn_to snapshot as inserts
    with NULL before-images — not a raw manifest-read crash."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        txn_changes,
    )

    base = str(tmp_path / "g")
    txn_commit(
        base, 1, {"t1": (_df(spark, [(1, "a", 10)]), "m", None)}
    )
    txn_commit(
        base, 2,
        {
            "t1": (_df(spark, [(1, "a", 11)]), "m", ["a"]),
            "t2": (_df(spark, [(7, "x", 70), (8, "y", 80)]), "m", None),
        },
    )
    feeds = txn_changes(
        spark, base, 1, 2,
        {"t1": ("m", "pk", ["val"]), "t2": ("m", "pk", ["val"])},
    )
    got = sorted(
        (r["m"], r["pk"], r["change_type"], r["val_before"], r["val_after"])
        for r in feeds["t2"].collect()
    )
    assert got == [
        ("x", 7, "insert", None, 70),
        ("y", 8, "insert", None, 80),
    ]
    assert feeds["t2"].columns == feeds["t1"].columns


# --- U36: stats/layout coherence ------------------------------------------------


def test_stats_resync_heals_a_torn_rewrite(spark, tmp_path):
    """The crash window between a compaction's data swap and its
    ledger republish leaves stats-routed reads failing LOUDLY on dead
    file paths (never silently wrong), and snapshot_stats_resync heals
    it from existence alone — then reports all-empty deltas on the
    immediate re-run (recovery must be idempotent)."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        compact_partitions,
        snapshot_commit_stats,
        snapshot_read_pruned,
        snapshot_stats_resync,
    )

    base = str(tmp_path / "t")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "1")
    try:
        snapshot_commit(
            _df(spark, [(1, "a", 10), (2, "a", 20), (5, "b", 50)]),
            base, 1, "m",
        )
    finally:
        spark.conf.set("spark.sql.files.maxRecordsPerFile", "0")
    s1 = snapshot_commit_stats(spark, base, 1, ["pk", "val"])
    assert sum(1 for k in s1 if "/m=a/" in k) == 2  # born fragmented
    # the torn state: rewrite WITHOUT the republish
    compact_partitions(
        spark, os.path.join(base, "v1"), "m", max_files=1
    )
    with pytest.raises(Exception):
        snapshot_read_pruned(spark, base, 1, "m", "pk", 1, 2)[0].count()
    rep = snapshot_stats_resync(spark, base, 1, "m")
    assert rep["resynced_parts"] == ["m=a"]
    assert rep["dropped"] and rep["added"]
    df, kept, total = snapshot_read_pruned(spark, base, 1, "m", "pk", 1, 2)
    assert (len(kept), total) == (1, 2)
    assert _rows(df) == [(1, "a", 10), (2, "a", 20)]
    assert snapshot_stats_resync(spark, base, 1, "m") == {
        "dropped": [], "added": [], "resynced_parts": [],
    }


def test_compact_stats_scoping_and_refusals(spark, tmp_path):
    """snapshot_compact_stats refuses before touching data when the
    version has no ledger (it would create the incoherence it exists
    to prevent); with a ledger, it rewrites only policy-exceeding
    partitions and leaves healthy partitions' entries byte-identical
    while coverage stays exact."""
    import json

    from update_database_by_wind_spark.operators.update_pipeline import (
        snapshot_commit_stats,
        snapshot_compact_stats,
        snapshot_stats_resync,
    )

    base = str(tmp_path / "t")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "1")
    try:
        snapshot_commit(
            _df(spark, [(1, "a", 10), (2, "a", 20), (5, "b", 50)]),
            base, 1, "m",
        )
    finally:
        spark.conf.set("spark.sql.files.maxRecordsPerFile", "0")
    with pytest.raises(ValueError, match="no stats ledger"):
        snapshot_compact_stats(spark, base, 1, "m", max_files=1)
    with pytest.raises(ValueError, match="no stats ledger"):
        snapshot_stats_resync(spark, base, 1, "m")
    # the refusal happened BEFORE any rewrite: m=a is still fragmented
    s1 = snapshot_commit_stats(spark, base, 1, ["pk", "val"])
    assert sum(1 for k in s1 if "/m=a/" in k) == 2
    rep = snapshot_compact_stats(spark, base, 1, "m", max_files=1)
    assert rep["fragmented"] == ["a"]
    assert rep["stats_dropped"] and rep["stats_added"]
    with open(os.path.join(base, "_stats_v1.json")) as fh:
        led = json.load(fh)
    b_keys = [k for k in s1 if "/m=b/" in k]
    assert b_keys and all(led[k] == s1[k] for k in b_keys)
    assert sum(1 for k in led if "/m=a/" in k) == 1
    on_disk = {
        os.path.relpath(os.path.join(r, f), base)
        for r, ds, fs in os.walk(os.path.join(base, "v1"))
        for f in fs
        if f.endswith(".parquet")
    }
    assert set(led) == on_disk


# --- U37: transaction-group retention -------------------------------------------


def test_txn_expire_guards(spark, tmp_path):
    from update_database_by_wind_spark.operators.update_pipeline import (
        txn_expire,
    )

    base = str(tmp_path / "t")
    _seed(spark, base)
    txn_commit(base, 2, {"a": (_df(spark, [(1, "x", 11)]), "m", ["x"])})
    with pytest.raises(ValueError, match="head transaction"):
        txn_expire(base, [1])
    with pytest.raises(ValueError, match="no pointer"):
        txn_expire(base, [2, 9])
    # a missing pointer leaves unpointed manifests BELOW the pointed
    # head — byte-identical to an expiry that crashed between pointer
    # removal and the per-table expiry loop, so the GC treats it as
    # that crash's residue and finishes the reclaim instead of
    # wedging (round-15 advisor: the old refusal made the crash
    # unrecoverable — txn_expire raised on every re-run and
    # txn_partition_gc refuses until txn_expire succeeds)
    os.remove(os.path.join(base, "_txn_v1.json"))
    pre = _rows(txn_read(spark, base, 2, "a", "m"))
    rep = txn_expire(base, [2])
    assert rep["residue_deferred"] == ["a/v1"]
    assert _rows(txn_read(spark, base, 2, "a", "m")) == pre


def test_txn_expire_shared_dirs_reads_and_stats(spark, tmp_path):
    """The u37 laws on a toy group: expired pointers go away, a fully
    superseded version dir is reclaimed while a shared one survives,
    retained reads are unchanged, orphaned crashed-attempt commits are
    reclaimed, and travelling stats ledgers die exactly with their
    version dirs."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        snapshot_commit_stats,
        snapshot_stats_for,
        txn_expire,
    )

    base = str(tmp_path / "t")
    _seed(spark, base)  # txn1: a(v1), b(v1)
    snapshot_commit_stats(spark, os.path.join(base, "a"), 1, ["pk", "val"])
    # txn2: FULL rewrite of a (v2) — a/v1 becomes reclaimable
    txn_commit(
        base, 2,
        {"a": (_df(spark, [(1, "x", 11), (2, "y", 21)]), "m", None)},
    )
    snapshot_commit_stats(spark, os.path.join(base, "a"), 2, ["pk", "val"])
    # txn3: partial rewrite of b (m=y only) — b/v1 stays shared
    txn_commit(
        base, 3, {"b": (_df(spark, [(2, "y", 201)]), "m", ["y"])}
    )
    # crashed 4th attempt on b: table commit without a pointer
    snapshot_commit(
        _df(spark, [(9, "z", 900)]), os.path.join(base, "b"), 3, "m",
        ["z"],
    )
    pre_a = _rows(txn_read(spark, base, 3, "a", "m"))
    pre_b = _rows(txn_read(spark, base, 3, "b", "m"))
    rep = txn_expire(base, [3])
    assert rep["removed_pointers"] == ["_txn_v1.json", "_txn_v2.json"]
    assert rep["orphans_reclaimed"] == ["b/v3"]
    assert not os.path.isdir(os.path.join(base, "a", "v1"))
    assert os.path.isdir(os.path.join(base, "b", "v1"))
    assert _rows(txn_read(spark, base, 3, "a", "m")) == pre_a
    assert _rows(txn_read(spark, base, 3, "b", "m")) == pre_b
    # the reclaimed a/v1 took its stats ledger with it; the retained
    # version's ledger still serves the stats view at the kept txn
    assert rep["tables"]["a"]["removed_stats"] == ["_stats_v1.json"]
    assert not os.path.exists(
        os.path.join(base, "a", "_stats_v1.json")
    )
    view = snapshot_stats_for(os.path.join(base, "a"), 2, "m")
    assert view and all(k.startswith("v2/") for k in view)
    # idempotent: the immediate re-run finds nothing to do
    rep2 = txn_expire(base, [3])
    assert rep2["removed_pointers"] == []
    assert rep2["orphans_reclaimed"] == []


def test_txn_expire_crash_recovery_is_idempotent(spark, tmp_path):
    """The round-15 advisor's crash interleaving: an expiry that dies
    AFTER removing the expired pointers but BEFORE the per-table
    snapshot_expire loop leaves manifests only the deleted pointers
    referenced.  The re-run must finish the reclaim — defer those
    manifests to the keep-set expiry (which honours version-dir
    sharing), keep retained reads byte-identical, and unwedge
    txn_partition_gc — not raise on the orphan scan."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        txn_expire,
        txn_partition_gc,
    )

    base = str(tmp_path / "t")
    _seed(spark, base)  # txn1: a(v1), b(v1)
    # txn2: FULL rewrite of a (v2) — after expiring txn1, a/v1 is
    # reclaimable; txn3: partial rewrite of b (m=y) — b/v1 stays
    # SHARED by txn3's manifest for partition x
    txn_commit(
        base, 2,
        {"a": (_df(spark, [(1, "x", 11), (2, "y", 21)]), "m", None)},
    )
    txn_commit(
        base, 3, {"b": (_df(spark, [(2, "y", 201)]), "m", ["y"])}
    )
    pre_a = _rows(txn_read(spark, base, 3, "a", "m"))
    pre_b = _rows(txn_read(spark, base, 3, "b", "m"))
    # the crash: step 3 completed (expired pointers gone), step 4
    # never ran — exactly the state txn_expire(base, [3]) leaves if
    # killed between os.remove(pointer) and the expiry loop
    os.remove(os.path.join(base, "_txn_v1.json"))
    os.remove(os.path.join(base, "_txn_v2.json"))
    # before the fix this raised "below its pointed head" forever,
    # and txn_partition_gc refused ("run txn_expire first") — the
    # wedge the advisor named
    with pytest.raises(ValueError, match="run txn_expire first"):
        txn_partition_gc(base)
    rep = txn_expire(base, [3])
    assert rep["removed_pointers"] == []
    # a/v1 and b/v1 are the crash residue (txn3's pointer carries
    # a:2, b:2 forward); the expiry loop — not a blind rmtree —
    # reclaims their manifests, and only the UNSHARED dir goes
    assert rep["residue_deferred"] == ["a/v1", "b/v1"]
    assert rep["tables"]["a"]["removed_manifests"] == [
        "_manifest_v1.json",
    ]
    assert rep["tables"]["b"]["removed_manifests"] == [
        "_manifest_v1.json",
    ]
    assert not os.path.isdir(os.path.join(base, "a", "v1"))
    assert os.path.isdir(os.path.join(base, "b", "v1"))  # shared
    assert _rows(txn_read(spark, base, 3, "a", "m")) == pre_a
    assert _rows(txn_read(spark, base, 3, "b", "m")) == pre_b
    # the group is unwedged: partition GC's invariant holds again
    txn_partition_gc(base)
    # and the recovery converged: the next run finds nothing
    rep2 = txn_expire(base, [3])
    assert rep2["residue_deferred"] == []
    assert rep2["orphans_reclaimed"] == []
    assert rep2["removed_pointers"] == []


def test_txn_expire_min_age_guards_inflight_commit(spark, tmp_path):
    """The concurrent-writer guard (round-15 advisor): an in-flight
    txn_commit publishes table manifests/version dirs BEFORE its
    pointer, so a txn_expire racing it sees them as crashed-attempt
    orphans.  With min_age_s the young orphan (and a young
    brand-new-table ADD) survive the pass; once aged (min_age_s=0
    here) the same shapes are reclaimed."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        txn_expire,
    )

    base = str(tmp_path / "t")
    _seed(spark, base)
    txn_commit(base, 2, {"a": (_df(spark, [(1, "x", 11)]), "m", ["x"])})
    # the "in-flight commit": table a's v3 and brand-new table c's v1
    # published moments ago, pointers not yet written
    snapshot_commit(
        _df(spark, [(9, "z", 900)]), os.path.join(base, "a"), 3, "m",
        ["z"],
    )
    snapshot_commit(
        _df(spark, [(8, "w", 800)]), os.path.join(base, "c"), 1, "m"
    )
    rep = txn_expire(base, [2], min_age_s=3600)
    assert rep["orphans_reclaimed"] == []
    assert os.path.exists(os.path.join(base, "a", "_manifest_v3.json"))
    assert os.path.isdir(os.path.join(base, "c"))
    # aged out (min_age_s=0): the same shapes are crash residue now
    rep2 = txn_expire(base, [2], min_age_s=0.0)
    assert rep2["orphans_reclaimed"] == ["a/v3", "c/v1"]
    assert not os.path.exists(os.path.join(base, "c"))


def test_txn_expire_by_age_policy_laws(spark, tmp_path):
    """u40's policy laws on a toy group and a logical clock: dated-old
    expires, dated-young and tagged-old and undated all survive,
    expired stamps die with their pointers, stamp residue (a stamp
    whose pointer a crashed expiry already removed) is swept, and the
    policy converges on re-run."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        txn_commit_at,
        txn_expire_by_age,
        txn_tag,
    )

    base = str(tmp_path / "t")
    day = 86400.0
    txn_commit_at(
        base, 1,
        {"a": (_df(spark, [(1, "x", 10), (2, "y", 20)]), "m", None)},
        committed_at=0.0,
    )
    txn_commit_at(
        base, 2, {"a": (_df(spark, [(1, "x", 11)]), "m", ["x"])},
        committed_at=5 * day,
    )
    txn_tag(base, "pin", 2)
    txn_commit(base, 3, {"a": (_df(spark, [(2, "y", 22)]), "m", ["y"])})
    txn_commit_at(
        base, 4, {"a": (_df(spark, [(1, "x", 13)]), "m", ["x"])},
        committed_at=29 * day,
    )
    # stamp residue: a crashed expiry removed pointer 0's... simulate
    # with a stamp for a version that never had a pointer here
    import json

    with open(os.path.join(base, "_txn_stamp_v9.json"), "w") as fh:
        json.dump({"committed_at": 1.0}, fh)
    pre = _rows(txn_read(spark, base, 2, "a", "m"))
    rep = txn_expire_by_age(base, max_age_s=10 * day, now=30 * day)
    assert rep["kept_txns"] == [2, 3, 4]
    assert rep["aged_out"] == [1]
    assert rep["undated"] == [3]
    assert rep["stamp_residue"] == ["_txn_stamp_v9.json"]
    assert not os.path.exists(os.path.join(base, "_txn_stamp_v1.json"))
    assert os.path.exists(os.path.join(base, "_txn_stamp_v2.json"))
    assert not os.path.exists(os.path.join(base, "_txn_stamp_v9.json"))
    assert _rows(txn_read(spark, base, 2, "a", "m")) == pre
    rep2 = txn_expire_by_age(base, max_age_s=10 * day, now=30 * day)
    assert rep2["kept_txns"] == [2, 3, 4]
    assert rep2["removed_pointers"] == []
    assert rep2["stamp_residue"] == []


def test_txn_optimize_plan_laws(spark, tmp_path):
    """u42's planner laws on a toy group: the work order is scoped to
    the (version dir, partition) pairs the HEAD manifests route to
    (a stale twin in the censused dir is not scheduled), a partition
    needing clustering is never also listed for compaction, execution
    under the coherence protocol keeps an OLDER transaction's reads
    cell-exact, and the re-plan is empty."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        snapshot_commit_stats,
        txn_optimize_plan,
        txn_optimize_run,
    )

    base = str(tmp_path / "g")
    # rows CREATED interleaved (by residue class) so the writer's
    # sequential file splits each span nearly the whole pk domain —
    # an explicit orderBy would be eliminated by Catalyst below
    # snapshot_commit's repartition, so the arrival order is the knob
    rows = sorted(
        ((i, "x" if i % 2 == 0 else "y", i * 7 % 100) for i in range(40)),
        key=lambda r: (r[0] % 5, r[0]),
    )
    df = spark.createDataFrame(rows, "pk long, m string, val long")
    conf_key = "spark.sql.files.maxRecordsPerFile"
    spark.conf.set(conf_key, "4")  # 40 rows / 2 parts -> ~5 files each
    try:
        txn_commit(base, 1, {"a": (df, "m", None)})
    finally:
        spark.conf.set(conf_key, "0")
    snapshot_commit_stats(spark, os.path.join(base, "a"), 1, ["pk", "val"])
    # txn2 rewrites partition x healthy -> head routes x to v2, y to v1
    txn_commit(
        base, 2,
        {"a": (df.filter(F.col("m") == "x"), "m", ["x"])},
    )
    snapshot_commit_stats(spark, os.path.join(base, "a"), 2, ["pk", "val"])
    spec = {"a": ("m", "pk")}
    plan = txn_optimize_plan(spark, base, spec, max_files=3)
    # y is degraded (hash-shuffled splits span the pk domain) so it
    # clusters and is NOT double-listed for compaction; x's stale twin
    # under v1 is out of head scope; v2's x is a single healthy file
    assert plan == {"a": {1: {"compact": [], "cluster": ["y"]}}}
    pre_v1 = _rows(txn_read(spark, base, 1, "a", "m"))
    txn_optimize_run(spark, base, spec, plan, max_files=3, files_per_part=3)
    assert _rows(txn_read(spark, base, 1, "a", "m")) == pre_v1
    assert txn_optimize_plan(spark, base, spec, max_files=3) == {}
    # unknown table in the spec refuses
    with pytest.raises(ValueError, match="not in the head"):
        txn_optimize_plan(spark, base, {"ghost": ("m", None)})


def test_txn_changes_pruned_refusals_and_short_circuit(spark, tmp_path):
    """u43's edges on a toy group: an expired endpoint refuses with
    the TYPED retention error, a table in neither pointer is a plain
    caller error, and an untouched table short-circuits from the
    pointer with the 'unchanged' receipt and zero rows."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        RetentionExpiredError,
        txn_changes_pruned,
        txn_expire,
    )

    base = str(tmp_path / "g")
    _seed(spark, base)
    txn_commit(base, 2, {"a": (_df(spark, [(1, "x", 11)]), "m", ["x"])})
    spec = {"b": ("m", "pk", ["val"])}
    feeds, rec = txn_changes_pruned(spark, base, 1, 2, spec, {})
    assert rec["b"] == {"mode": "unchanged"}
    assert feeds["b"].count() == 0
    with pytest.raises(ValueError, match="neither"):
        txn_changes_pruned(
            spark, base, 1, 2, {"nope": ("m", "pk", ["val"])}, {}
        )
    txn_expire(base, [2])
    with pytest.raises(RetentionExpiredError):
        txn_changes_pruned(spark, base, 1, 2, spec, {})


def test_txn_restore_laws(spark, tmp_path):
    """u44's restore laws on a toy group: the restored pointer equals
    the target's verbatim and the restored reads match; an expired or
    missing target refuses; restoring the head refuses; and the next
    txn_commit continues the chain past the restore."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        txn_restore,
    )

    base = str(tmp_path / "g")
    _seed(spark, base)
    txn_commit(base, 2, {"a": (_df(spark, [(1, "x", 99)]), "m", ["x"])})
    pre = _rows(txn_read(spark, base, 1, "a", "m"))
    rep = txn_restore(base, 1)
    assert rep["new_txn"] == 3
    assert _rows(txn_read(spark, base, 3, "a", "m")) == pre
    with pytest.raises(ValueError, match="already the head"):
        txn_restore(base, 3)
    with pytest.raises(ValueError, match="nothing to restore"):
        txn_restore(base, 9)
    # the chain continues: a normal commit lands as txn 4 on top of
    # the restored state
    txn_commit(base, 4, {"a": (_df(spark, [(2, "y", 44)]), "m", ["y"])})
    assert _rows(txn_read(spark, base, 4, "a", "m")) == [
        (1, "x", 10), (2, "y", 44),
    ]


# --- U38: transaction tags as GC roots -------------------------------------------


def test_txn_tag_laws(spark, tmp_path):
    """Tag laws at group granularity: unsafe names, unknown targets,
    re-tags, and missing untags all refuse; the ref read path resolves
    through the pointer."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        txn_read_tag,
        txn_tag,
        txn_tags,
        txn_untag,
    )

    base = str(tmp_path / "t")
    _seed(spark, base)
    with pytest.raises(ValueError, match="unsafe ref name"):
        txn_tag(base, "../escape", 1)
    with pytest.raises(ValueError, match="no pointer"):
        txn_tag(base, "ghost", 9)
    txn_tag(base, "release-1", 1)
    with pytest.raises(ValueError, match="immutable"):
        txn_tag(base, "release-1", 1)
    assert txn_tags(base) == {"release-1": 1}
    assert _rows(txn_read_tag(spark, base, "release-1", "a", "m")) == _rows(
        txn_read(spark, base, 1, "a", "m")
    )
    with pytest.raises(ValueError, match="no ref named"):
        txn_untag(base, "nope")
    txn_untag(base, "release-1")
    assert txn_tags(base) == {}


def test_txn_expire_untagged_policy(spark, tmp_path):
    """The policy GC computes its keep set (newest keep_last union the
    tagged txns): a tagged old transaction survives keep_last=1 and
    reads back unchanged, untagged intermediates expire, and
    keep_last < 1 refuses (the head is never expirable)."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        txn_expire_untagged,
        txn_tag,
    )

    base = str(tmp_path / "t")
    _seed(spark, base)  # txn1
    txn_commit(base, 2, {"a": (_df(spark, [(1, "x", 11)]), "m", ["x"])})
    txn_commit(base, 3, {"a": (_df(spark, [(2, "y", 22)]), "m", ["y"])})
    txn_tag(base, "audit", 1)
    with pytest.raises(ValueError, match="keep_last"):
        txn_expire_untagged(base, keep_last=0)
    pre = _rows(txn_read(spark, base, 1, "a", "m"))
    rep = txn_expire_untagged(base, keep_last=1)
    assert rep["kept_txns"] == [1, 3]
    assert rep["removed_pointers"] == ["_txn_v2.json"]
    assert _rows(txn_read(spark, base, 1, "a", "m")) == pre
    assert not os.path.exists(os.path.join(base, "_txn_v2.json"))


def test_txn_expire_reclaims_crashed_table_add(spark, tmp_path):
    """A txn_commit that crashed while ADDING a brand-new table (table
    manifest + data published, pointer never written) leaves a table
    dir no pointer mentions; txn_expire must reclaim it whole rather
    than leak it forever (round-15 review — the all_ref-keyed scan
    never visited it)."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        txn_expire,
    )

    base = str(tmp_path / "t")
    _seed(spark, base)
    txn_commit(base, 2, {"a": (_df(spark, [(1, "x", 11)]), "m", ["x"])})
    # the crashed ADD: table "c" committed at its v1, pointer absent
    snapshot_commit(
        _df(spark, [(9, "z", 900)]), os.path.join(base, "c"), 1, "m"
    )
    assert os.path.isdir(os.path.join(base, "c"))
    rep = txn_expire(base, [2])
    assert rep["orphans_reclaimed"] == ["c/v1"]
    assert not os.path.exists(os.path.join(base, "c"))
    # retained reads untouched
    assert _rows(txn_read(spark, base, 2, "a", "m")) == [
        (1, "x", 11), (2, "y", 20),
    ]


def test_txn_partition_gc_noop_refusal_and_reclaim(spark, tmp_path):
    """txn_partition_gc laws: a fully-retained store is a provable
    no-op, a store whose manifests match no pointer is REFUSED (run
    txn_expire first — it owns manifest lifecycle), and after expiry
    the GC reclaims exactly the unreferenced partition subdirs in
    every table of the group."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        txn_expire,
        txn_partition_gc,
    )

    base = str(tmp_path / "t")
    _seed(spark, base)  # txn1: a, b at v1 (m=x, m=y)
    # txn2 rewrites m=x in BOTH tables atomically
    txn_commit(base, 2, {
        "a": (_df(spark, [(1, "x", 11)]), "m", ["x"]),
        "b": (_df(spark, [(1, "x", 101)]), "m", ["x"]),
    })
    assert txn_partition_gc(base) == {"removed": {"a": [], "b": []}}
    # inconsistent store: expired-pointer manifests still on disk
    os.remove(os.path.join(base, "_txn_v1.json"))
    with pytest.raises(ValueError, match="run txn_expire first"):
        txn_partition_gc(base)
    # restore then expire properly; the old m=x images become
    # reclaimable in both tables, the shared m=y subdirs survive
    with open(os.path.join(base, "_txn_v2.json")) as fh:
        pass  # pointer chain intact for keep=[2]
    import json as _json

    with open(os.path.join(base, "_txn_v1.json"), "w") as fh:
        _json.dump({"a": 1, "b": 1}, fh)
    txn_expire(base, [2])
    rep = txn_partition_gc(base)
    assert rep == {"removed": {"a": ["v1/m=x"], "b": ["v1/m=x"]}}
    for t in ("a", "b"):
        assert os.path.isdir(os.path.join(base, t, "v1", "m=y"))
        assert not os.path.exists(os.path.join(base, t, "v1", "m=x"))
    assert _rows(txn_read(spark, base, 2, "a", "m")) == [
        (1, "x", 11), (2, "y", 20),
    ]


def test_multiband_kept_set_is_the_model_intersection(spark, tmp_path):
    """snapshot_read_pruned_multi's kept set equals a brute-force
    evaluation of the band rule over the merged stats view, for every
    single band and for their conjunction — and the conjunctive read
    still answers exactly on a fixture where one file survives one
    band but not the other."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        snapshot_commit_stats,
        snapshot_read_pruned,
        snapshot_read_pruned_multi,
        snapshot_stats_for,
    )

    base = str(tmp_path / "t")
    # pk correlates with partition; val anti-correlates — so the two
    # bands keep DIFFERENT file subsets
    snapshot_commit(
        _df(spark, [(1, "a", 90), (2, "a", 80), (8, "b", 20), (9, "b", 10)]),
        base, 1, "m",
    )
    snapshot_commit_stats(spark, base, 1, ["pk", "val"])
    merged = snapshot_stats_for(base, 1, "m")

    def brute(bands):
        return sorted(
            rel
            for rel, s in merged.items()
            if all(
                s[f"{c}_min"] <= hi and s[f"{c}_max"] >= lo
                for c, (lo, hi) in bands.items()
            )
        )

    for bands in (
        {"pk": (1, 2)},
        {"val": (0, 30)},
        {"pk": (1, 2), "val": (0, 30)},
        {"pk": (0, 100), "val": (0, 100)},
        {"pk": (50, 60)},
    ):
        df, kept, total = snapshot_read_pruned_multi(
            spark, base, 1, "m", bands
        )
        assert kept == brute(bands), bands
        assert total == len(merged)
        # exactness against the full-data filter
        want = [(1, "a", 90), (2, "a", 80), (8, "b", 20), (9, "b", 10)]
        want = [
            r for r in want
            if all(lo <= {"pk": r[0], "val": r[2]}[c] <= hi
                   for c, (lo, hi) in bands.items())
        ]
        assert _rows(df) == sorted(want), bands
    # single-band reads agree with the single-entry multi form
    _, kept1, _t = snapshot_read_pruned(spark, base, 1, "m", "pk", 1, 2)
    _, kept1m, _t2 = snapshot_read_pruned_multi(
        spark, base, 1, "m", {"pk": (1, 2)}
    )
    assert kept1 == kept1m


def test_view_store_survives_stage_residue(spark, tmp_path):
    """_ViewStore's crash contract: stage/old residue from a crashed
    publish never corrupts reads or the watermark, and the next
    publish clears it and lands atomically."""
    import json

    from update_database_by_wind_spark.streaming.pipelines import (
        _ViewStore,
    )

    root = str(tmp_path)
    store = _ViewStore(spark, root)
    df1 = spark.createDataFrame([("m1", 1)], "o_month string, n long")
    store.publish(df1, 1)
    assert store.watermark() == 1
    # crash mid-publish: a fully-written stage (data + marker) that
    # never reached the rename, plus an _view_old leftover
    os.makedirs(os.path.join(root, "_view_stage"))
    with open(
        os.path.join(root, "_view_stage", "_applied.json"), "w"
    ) as fh:
        json.dump({"txn": 9}, fh)
    os.makedirs(os.path.join(root, "_view_old"))
    assert store.watermark() == 1  # residue is invisible to readers
    assert [tuple(r) for r in store.read().collect()] == [("m1", 1)]
    df2 = spark.createDataFrame([("m1", 2)], "o_month string, n long")
    store.publish(df2, 2)
    assert store.watermark() == 2
    assert [tuple(r) for r in store.read().collect()] == [("m1", 2)]
    assert not os.path.exists(os.path.join(root, "_view_stage"))
    assert not os.path.exists(os.path.join(root, "_view_old"))


def test_view_store_heals_interrupted_swap(spark, tmp_path):
    """The OTHER crash shape (round-15 advisor): a publish that died
    between os.replace(view_dir, old) and os.replace(stage, view_dir)
    leaves the view dir ABSENT with the complete previous view parked
    in _view_old.  Every accessor must rename it back (data +
    watermark move together, so the restored view is consistent at
    its old watermark) instead of raising FileNotFoundError on every
    daemon wake-up with no recovery path."""
    import shutil as _sh

    from update_database_by_wind_spark.streaming.pipelines import (
        _ViewStore,
    )

    root = str(tmp_path)
    store = _ViewStore(spark, root)
    df1 = spark.createDataFrame([("m1", 1)], "o_month string, n long")
    store.publish(df1, 1)
    # the interrupted swap: view moved aside, replacement never landed
    os.replace(store.view_dir, os.path.join(root, "_view_old"))
    assert store.watermark() == 1  # healed on first touch
    assert [tuple(r) for r in store.read().collect()] == [("m1", 1)]
    assert not os.path.exists(os.path.join(root, "_view_old"))
    # same crash, healed by the next PUBLISH instead of a read
    os.replace(store.view_dir, os.path.join(root, "_view_old"))
    df2 = spark.createDataFrame([("m1", 2)], "o_month string, n long")
    store.publish(df2, 2)
    assert store.watermark() == 2
    # an INCOMPLETE _view_old (no watermark marker) is not a view —
    # never "healed" into the view slot; accessors fail loudly
    _sh.rmtree(store.view_dir)
    os.makedirs(os.path.join(root, "_view_old"))
    with pytest.raises(Exception):
        store.watermark()


def test_view_notification_distinguishes_refusal_from_spec_bug(
    spark, tmp_path
):
    """_apply_view_notification's error discrimination (round-15
    advisor): ONLY the typed retention refusal converts to a
    rebaseline; a caller error from txn_changes (table in neither
    pointer — a permanent spec bug) re-raises instead of silently
    recomputing the view on every notification forever."""
    from update_database_by_wind_spark.streaming.pipelines import (
        _ViewStore,
        _apply_view_notification,
    )

    base = str(tmp_path / "g")
    _seed(spark, base)
    txn_commit(base, 2, {"a": (_df(spark, [(1, "x", 11)]), "m", ["x"])})
    store = _ViewStore(spark, str(tmp_path / "v"))
    store.publish(_df(spark, [(0, "seed", 0)]), 1)
    rebaselines = []

    def recompute(t):
        rebaselines.append(t)
        return _df(spark, [(t, "recomputed", t)])

    # spec bug: the table exists in no pointer -> plain ValueError
    # propagates (no rebaseline, no publish)
    with pytest.raises(ValueError, match="neither"):
        _apply_view_notification(
            spark, base, store, {"nope": ("m", "pk", ["val"])}, 2,
            recompute,
        )
    assert rebaselines == []
    assert store.watermark() == 1
    # retention refusal: the watermark's pointer is gone -> exactly
    # one rebaseline at the notified transaction
    os.remove(os.path.join(base, "_txn_v1.json"))
    spec = {"a": ("m", "pk", ["val"]), "b": ("m", "pk", ["val"])}
    assert (
        _apply_view_notification(spark, base, store, spec, 2, recompute)
        == "rebaseline"
    )
    assert rebaselines == [2]
    assert store.watermark() == 2


def test_txn_touched_since_laws(spark, tmp_path):
    """u45's scope helper: untouched tables report empty sets, touched
    tables report exactly the manifest-diff partitions, a table added
    after the anchor is touched in full, and an expired anchor
    refuses with the typed retention error."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        RetentionExpiredError,
        txn_expire,
        txn_touched_since,
    )

    base = str(tmp_path / "g")
    _seed(spark, base)
    txn_commit(base, 2, {"a": (_df(spark, [(1, "x", 11)]), "m", ["x"])})
    txn_commit(base, 3, {"c": (_df(spark, [(9, "z", 90)]), "m", None)})
    touched = txn_touched_since(base, 1)
    assert touched == {"a": {"x"}, "b": set(), "c": {"z"}}
    assert txn_touched_since(base, 3) == {
        "a": set(), "b": set(), "c": set(),
    }
    txn_expire(base, [2, 3])
    with pytest.raises(RetentionExpiredError):
        txn_touched_since(base, 1)


def test_round16_machinery_survives_escaped_partition_values(
    spark, tmp_path
):
    """The partition_orphan_gc lesson (round 14: value 'a:x' rmtree'd a
    live partition) applied to the round-16 surfaces: Hive
    percent-escapes partition values on disk while manifests carry the
    DECODED strings, so every census/prune/plan path must unquote
    before comparing.  One store with an escapable partition value
    drives snapshot_changes_pruned's band folding and the
    txn_optimize planner's scope/work-order algebra."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        snapshot_changes_pruned,
        snapshot_commit_stats,
        txn_optimize_plan,
        txn_optimize_run,
        txn_touched_since,
    )

    base = str(tmp_path / "g")
    # partition values 'a:x' and 'plain' — ':' percent-escapes on disk
    rows = [(i, "a:x" if i % 2 == 0 else "plain", i) for i in range(40)]
    df = spark.createDataFrame(
        sorted(rows, key=lambda r: (r[0] % 5, r[0])),
        "pk long, m string, val long",
    )
    conf_key = "spark.sql.files.maxRecordsPerFile"
    spark.conf.set(conf_key, "4")
    try:
        txn_commit(base, 1, {"t": (df, "m", None)})
    finally:
        spark.conf.set(conf_key, "0")
    snapshot_commit_stats(spark, os.path.join(base, "t"), 1, ["pk", "val"])
    # txn 2 rewrites ONLY the escaped partition (healthy single file)
    upd = df.filter(F.col("m") == "a:x").withColumn(
        "val", F.col("val") + 100
    )
    txn_commit(base, 2, {"t": (upd, "m", ["a:x"])})
    snapshot_commit_stats(spark, os.path.join(base, "t"), 2, ["pk", "val"])
    # the feed scope and the stats-pruned diff both speak DECODED
    assert txn_touched_since(base, 1) == {"t": {"a:x"}}
    feed, scanned, changed = snapshot_changes_pruned(
        spark, os.path.join(base, "t"), 1, 2, "m", "pk", ["val"],
        "val", 100, 200,
    )
    assert changed == ["a:x"] and scanned == ["a:x"]
    assert feed.count() == 20  # every escaped-partition row moved up
    # the planner censuses the escaped dirs and emits DECODED names;
    # v1's 'plain' partition is fragmented, v2's rewrite is healthy
    spec = {"t": ("m", "pk")}
    plan = txn_optimize_plan(spark, base, spec, max_files=3)
    assert plan == {"t": {1: {"compact": [], "cluster": ["plain"]}}}
    pre = _rows(txn_read(spark, base, 2, "t", "m"))
    txn_optimize_run(spark, base, spec, plan, max_files=3,
                     files_per_part=3)
    assert _rows(txn_read(spark, base, 2, "t", "m")) == pre
    assert txn_optimize_plan(spark, base, spec, max_files=3) == {}


def test_txn_restore_crash_residue_is_reclaimable(spark, tmp_path):
    """u44's crash contract: a restore killed between the per-table
    manifest copies and the pointer write leaves unpointed above-head
    manifests — exactly txn_expire's crashed-attempt shape — and the
    retried restore converges on a store the expiry has cleaned."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        snapshot_restore,
        txn_expire,
        txn_restore,
    )

    base = str(tmp_path / "g")
    _seed(spark, base)
    txn_commit(base, 2, {"a": (_df(spark, [(1, "x", 99)]), "m", ["x"])})
    # the crash: the manifest copy for table a published (v3 = v1's
    # content), the pointer never did
    snapshot_restore(os.path.join(base, "a"), 1, 3)
    assert os.path.exists(os.path.join(base, "a", "_manifest_v3.json"))
    # reads at every retained txn are untouched by the residue
    assert _rows(txn_read(spark, base, 2, "a", "m")) == [
        (1, "x", 99), (2, "y", 20),
    ]
    # the expiry reclaims the crashed attempt (manifest above the
    # pointed head, no pointer references it)
    rep = txn_expire(base, [1, 2])
    assert rep["orphans_reclaimed"] == ["a/v3"]
    assert not os.path.exists(os.path.join(base, "a", "_manifest_v3.json"))
    # the retried restore converges
    rep2 = txn_restore(base, 1)
    assert rep2["new_txn"] == 3 and rep2["restored_tables"] == ["a"]
    assert _rows(txn_read(spark, base, 3, "a", "m")) == [
        (1, "x", 10), (2, "y", 20),
    ]


# --- round-16 ADVICE: the removed-table feed + the dropped-table sweep -----------


def test_txn_changes_feeds_removed_table_as_deletes(spark, tmp_path):
    """A table REMOVED from the group between the endpoints — the
    pointer shape txn_restore publishes when rolling back past a
    mid-history table ADD — feeds its entire txn_from snapshot as
    deletes with NULL after-images (round-16 advisor: the old
    fall-through crashed opening _manifest_v0.json), symmetric to the
    added-table insert feed; the pruned variant answers the same shape
    band-pruned at file level with a "removed" mode receipt."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        snapshot_commit_stats,
        txn_changes,
        txn_changes_pruned,
        txn_restore,
    )

    base = str(tmp_path / "g")
    txn_commit(base, 1, {"t1": (_df(spark, [(1, "a", 10)]), "m", None)})
    txn_commit(
        base, 2,
        {
            "t1": (_df(spark, [(1, "a", 11)]), "m", ["a"]),
            "t2": (_df(spark, [(7, "x", 70), (8, "y", 80)]), "m", None),
        },
    )
    snapshot_commit_stats(
        spark, os.path.join(base, "t2"), 1, ["pk", "val"]
    )
    rep = txn_restore(base, 1)
    assert rep["new_txn"] == 3
    # the advisor's reporting ask: the drop is visible to auditors
    assert rep["dropped_tables"] == ["t2"]
    assert rep["restored_tables"] == ["t1"]
    spec = {"t1": ("m", "pk", ["val"]), "t2": ("m", "pk", ["val"])}
    feeds = txn_changes(spark, base, 2, 3, spec)
    got = sorted(
        (r["m"], r["pk"], r["change_type"], r["val_before"], r["val_after"])
        for r in feeds["t2"].collect()
    )
    assert got == [
        ("x", 7, "delete", 70, None),
        ("y", 8, "delete", 80, None),
    ]
    assert feeds["t2"].columns == feeds["t1"].columns
    # the restore's t1 feed is the inverse of the bad diff
    t1 = sorted(
        (r["pk"], r["change_type"], r["val_before"], r["val_after"])
        for r in feeds["t1"].collect()
    )
    assert t1 == [(1, "update", 11, 10)]
    # pruned variant: a shard banded on pk sees only its slice of the
    # delete feed, file-pruned through the travelling stats
    pfeeds, rec = txn_changes_pruned(
        spark, base, 2, 3, {"t2": ("m", "pk", ["val"])},
        {"t2": ("pk", 7, 7)},
    )
    assert rec["t2"]["mode"] == "removed"
    assert (rec["t2"]["kept_files"], rec["t2"]["n_files"]) == (1, 2)
    pgot = sorted(
        (r["pk"], r["change_type"], r["val_before"], r["val_after"])
        for r in pfeeds["t2"].collect()
    )
    assert pgot == [(7, "delete", 70, None)]
    # an unbanded removed table feeds unpruned with the same mode
    ufeeds, urec = txn_changes_pruned(
        spark, base, 2, 3, {"t2": ("m", "pk", ["val"])}, {}
    )
    assert urec["t2"] == {"mode": "removed"}
    assert ufeeds["t2"].count() == 2
    # a span that starts AFTER the drop sees the table in neither
    # pointer: that stays the loud caller error, not an empty feed —
    # a consumer whose spec still names a long-gone table must hear
    # about it rather than silently read "verified unchanged"
    txn_commit(base, 4, {"t1": (_df(spark, [(1, "a", 12)]), "m", ["a"])})
    with pytest.raises(ValueError, match="neither transaction"):
        txn_changes(spark, base, 3, 4, spec)


def test_txn_expire_sweeps_dropped_tables(spark, tmp_path):
    """A table whose LAST retained pointer reference was just removed
    (a restore dropped it from the head, then retention expired every
    pre-restore pointer) is swept whole in step 4b — the round-16
    advisor found the residue_deferred receipt promising a step-4
    cleanup that the kept_ref loop never performed for such tables —
    and the immediate re-run is a no-op."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        txn_expire,
        txn_restore,
    )

    base = str(tmp_path / "g")
    txn_commit(base, 1, {"a": (_df(spark, [(1, "x", 10)]), "m", None)})
    txn_commit(
        base, 2,
        {
            "a": (_df(spark, [(1, "x", 11)]), "m", ["x"]),
            "b": (_df(spark, [(7, "x", 70)]), "m", None),
        },
    )
    txn_restore(base, 1)  # txn 3 drops b from the head
    pre = _rows(txn_read(spark, base, 3, "a", "m"))
    rep = txn_expire(base, [3])
    assert rep["removed_pointers"] == ["_txn_v1.json", "_txn_v2.json"]
    assert rep["dropped_tables_swept"] == ["b"]
    assert rep["dropped_tables_deferred"] == []
    assert not os.path.exists(os.path.join(base, "b"))
    assert _rows(txn_read(spark, base, 3, "a", "m")) == pre
    rep2 = txn_expire(base, [3])
    assert rep2["dropped_tables_swept"] == []
    assert rep2["orphans_reclaimed"] == []
    assert rep2["removed_pointers"] == []


def test_txn_expire_defers_dropped_table_with_young_manifest(
    spark, tmp_path
):
    """The concurrent re-ADD guard on the dropped-table sweep: a
    min_age_s-young unpointed manifest inside a dropped table may be an
    in-flight commit re-adding the table mid-history, so the sweep
    defers (reported, not silent) and the NEXT run's orphan path
    reclaims the table once the residue ages past the gate."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        txn_expire,
        txn_restore,
    )

    base = str(tmp_path / "g")
    txn_commit(base, 1, {"a": (_df(spark, [(1, "x", 10)]), "m", None)})
    txn_commit(
        base, 2,
        {
            "a": (_df(spark, [(1, "x", 11)]), "m", ["x"]),
            "b": (_df(spark, [(7, "x", 70)]), "m", None),
        },
    )
    txn_restore(base, 1)  # txn 3 drops b
    # the in-flight re-ADD: b publishes a fresh (young) v2 above its
    # pointed head, pointer not yet written
    snapshot_commit(
        _df(spark, [(9, "z", 900)]), os.path.join(base, "b"), 2, "m"
    )
    rep = txn_expire(base, [3], min_age_s=3600.0)
    assert rep["dropped_tables_swept"] == []
    assert rep["dropped_tables_deferred"] == ["b"]
    assert os.path.isdir(os.path.join(base, "b"))
    assert _rows(txn_read(spark, base, 3, "a", "m")) == [(1, "x", 10)]
    # next run, residue aged past the gate: the orphan path reclaims
    # the now-pointerless table whole
    rep2 = txn_expire(base, [3])
    assert rep2["orphans_reclaimed"] == ["b/v1", "b/v2"]
    assert not os.path.exists(os.path.join(base, "b"))


def test_txn_expire_sweep_rechecks_age_at_sweep_time(spark, tmp_path):
    """The dropped-table sweep must re-age the dir AT SWEEP TIME, not
    trust step 2's orphan snapshot: a dropped table whose manifests
    were POINTED during the scan (so never age-gated there) but are
    min_age_s-young must defer — the scan-time snapshot would sweep a
    concurrent re-ADD's data out from under its imminent pointer."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        txn_expire,
        txn_restore,
    )

    base = str(tmp_path / "g")
    txn_commit(base, 1, {"a": (_df(spark, [(1, "x", 10)]), "m", None)})
    txn_commit(
        base, 2,
        {
            "a": (_df(spark, [(1, "x", 11)]), "m", ["x"]),
            "b": (_df(spark, [(7, "x", 70)]), "m", None),
        },
    )
    txn_restore(base, 1)  # txn 3 drops b; b's manifests are seconds old
    rep = txn_expire(base, [3], min_age_s=3600.0)
    assert rep["dropped_tables_swept"] == []
    assert rep["dropped_tables_deferred"] == ["b"]
    assert os.path.isdir(os.path.join(base, "b"))
    # the deferral's promise: the NEXT run (guard aged out) reclaims
    # the now-pointerless table through the orphan path
    rep2 = txn_expire(base, [3])
    assert rep2["orphans_reclaimed"] == ["b/v1"]
    assert all(not r.startswith("b/") for r in rep2["residue_deferred"])
    assert not os.path.exists(os.path.join(base, "b"))


def test_sharded_plan_conserves_under_arbitrary_splits(spark, tmp_path):
    """u46's merge law at unit level, for splits the registry query
    doesn't exercise: for ANY partition of the feed scope across N
    shards — including empty shards and a degenerate one-shard split —
    the per-shard plans are scope-contained and partition-disjoint,
    and their merge equals the unsharded feed-scoped plan."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        snapshot_commit_stats,
        txn_optimize_plan,
        txn_touched_since,
    )

    base = str(tmp_path / "g")
    rows = sorted(
        (
            (i, ("x", "y", "z")[i % 3], i * 7 % 100)
            for i in range(60)
        ),
        key=lambda r: (r[0] % 5, r[0]),
    )
    df = spark.createDataFrame(rows, "pk long, m string, val long")
    conf_key = "spark.sql.files.maxRecordsPerFile"
    spark.conf.set(conf_key, "4")
    try:
        txn_commit(base, 1, {"a": (df, "m", None)})
        snapshot_commit_stats(
            spark, os.path.join(base, "a"), 1, ["pk", "val"]
        )
        # the night's commit: x and z rewritten fragmented
        txn_commit(
            base, 2,
            {"a": (df.filter(F.col("m").isin(["x", "z"])), "m",
                   ["x", "z"])},
        )
    finally:
        spark.conf.set(conf_key, "0")
    snapshot_commit_stats(spark, os.path.join(base, "a"), 2, ["pk", "val"])
    spec = {"a": ("m", None)}
    touched = txn_touched_since(base, 1)
    assert touched == {"a": {"x", "z"}}
    full = txn_optimize_plan(spark, base, spec, max_files=3,
                             touched=touched)
    assert full, "the fixture must accrue debt for the law to bite"

    def parts_of(plan):
        out = {}
        for t, vers in plan.items():
            for v, order in vers.items():
                out[(t, v)] = set(order["compact"]) | set(order["cluster"])
        return out

    splits = [
        [{"x"}, {"z"}],
        [{"x", "z"}, set()],
        [{"x"}, {"z"}, set()],
        [{"z"}, {"x"}, {"y"}],  # y is untouched: scope ∩ touched = ∅
        [{"x", "z"}],
    ]
    for split in splits:
        plans = [
            txn_optimize_plan(
                spark, base, spec, max_files=3,
                touched={"a": touched["a"] & shard},
            )
            for shard in split
        ]
        merged: dict = {}
        seen: dict = {}
        for shard, plan in zip(split, plans):
            for key, parts in parts_of(plan).items():
                assert parts <= shard, (split, key, parts)
                assert not (parts & seen.get(key, set())), (split, key)
                seen.setdefault(key, set()).update(parts)
            for t, vers in plan.items():
                for v, order in vers.items():
                    cur = merged.setdefault(t, {}).setdefault(
                        v, {"compact": [], "cluster": []}
                    )
                    cur["compact"] = sorted(
                        set(cur["compact"]) | set(order["compact"])
                    )
                    cur["cluster"] = sorted(
                        set(cur["cluster"]) | set(order["cluster"])
                    )
        assert merged == full, split


def test_txn_expire_rolls_back_a_kept_tables_expired_head(
    spark, tmp_path
):
    """The restore-drop fuzz's catch, pinned deterministically: a
    restore drops table b from the group head while the keep set
    retains a PRE-restore reader of b — b's topmost manifest was
    pointed only by an expired pointer, and snapshot_expire's head
    guard used to crash the whole expiry on the rolled-back chain.
    The expiry now reclaims the superseded head first (reported under
    head_rollbacks), the kept reader stays cell-exact, and the re-run
    converges."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        txn_expire,
        txn_restore,
    )

    base = str(tmp_path / "g")
    txn_commit(base, 1, {"a": (_df(spark, [(1, "x", 10)]), "m", None)})
    txn_commit(
        base, 2,
        {
            "a": (_df(spark, [(1, "x", 11)]), "m", ["x"]),
            "b": (_df(spark, [(7, "x", 70)]), "m", None),
        },
    )
    txn_commit(base, 3, {"b": (_df(spark, [(7, "x", 77)]), "m", ["x"])})
    rep_r = txn_restore(base, 1)  # txn 4 drops b
    assert rep_r["dropped_tables"] == ["b"]
    pre2 = {
        t: _rows(txn_read(spark, base, 2, t, "m")) for t in ("a", "b")
    }
    rep = txn_expire(base, [2, 4])  # txn 3 (b's head v2) expires
    assert rep["head_rollbacks"] == ["b/v2"]
    assert rep["dropped_tables_swept"] == []  # b is still retained
    assert not os.path.exists(os.path.join(base, "b", "_manifest_v2.json"))
    for t in ("a", "b"):
        assert _rows(txn_read(spark, base, 2, t, "m")) == pre2[t]
    rep2 = txn_expire(base, [2, 4])
    assert rep2["head_rollbacks"] == []
    assert rep2["removed_pointers"] == []
    assert rep2["orphans_reclaimed"] == []


def test_view_store_retirement_fence_composes_with_heal(spark, tmp_path):
    """The st30 fence × the crash-heal protocol: a store retired with
    an interrupted swap stranded (_view_old parked, view dir absent)
    still refuses a stale publish TYPED and byte-untouched, while
    reads keep healing — the reshard derives successor views from a
    retired store, so read-side recovery must survive retirement."""
    import pytest

    from update_database_by_wind_spark.streaming.pipelines import (
        ViewStoreRetiredError,
        _ViewStore,
    )

    root = str(tmp_path)
    store = _ViewStore(spark, root)
    df1 = spark.createDataFrame([("m1", 1)], "o_month string, n long")
    store.publish(df1, 1)
    store.retire(["successor_a", "successor_b"])
    # crash shape AFTER retirement: interrupted swap residue
    os.replace(store.view_dir, os.path.join(root, "_view_old"))
    # reads heal through the fence (the reshard's own derivation path)
    assert store.watermark() == 1
    assert [tuple(r) for r in store.read().collect()] == [("m1", 1)]
    # a stale daemon publish refuses typed, store byte-untouched
    listing = store.listing()
    df2 = spark.createDataFrame([("m1", 2)], "o_month string, n long")
    with pytest.raises(ViewStoreRetiredError, match="retired"):
        store.publish(df2, 2)
    assert store.listing() == listing
    assert store.watermark() == 1


def test_schema_gate_composes_with_expiry(spark, tmp_path):
    """The write gate sweeps the EVOLVED schema through the
    predecessor manifest's referenced dirs — which expiry keeps alive
    exactly as long as any retained manifest references them, so the
    gate never reads a reclaimed dir and still remembers a widened
    column after the widening version's own manifest is expired."""
    import pytest

    from update_database_by_wind_spark.operators.update_pipeline import (
        snapshot_commit,
        snapshot_expire,
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
    snapshot_commit(
        spark.createDataFrame(
            [(1, "a", 12, "y")], "pk long, m string, val long, tag string"
        ),
        base, 3, "m", parts=["a"],
    )
    # expire v1/v2 manifests; v1's dir survives (b shared), v2's dir
    # is fully superseded and reclaimed
    out = snapshot_expire(base, keep_versions=[3])
    assert out["removed_dirs"] == ["v2"]
    # the gate still sees {pk, m, val, tag} through v3's manifest
    # (dirs v1 + v3) and refuses the narrowing commit
    with pytest.raises(ValueError, match="missing columns.*tag"):
        snapshot_commit(
            spark.createDataFrame(
                [(1, "a", 13)], "pk long, m string, val long"
            ),
            base, 4, "m", parts=["a"],
        )
    # a conforming commit still lands after the refusal
    snapshot_commit(
        spark.createDataFrame(
            [(1, "a", 13, "z")], "pk long, m string, val long, tag string"
        ),
        base, 4, "m", parts=["a"],
    )
