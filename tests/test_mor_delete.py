"""U18 merge-on-read delete laws (operators/update_pipeline.py):

1. mor_delete writes ONLY deletion vectors — every data file's path,
   size, and mtime is untouched (the defining MOR property);
2. mor_read ≡ cow_delete: reading through the vectors returns exactly
   the table a copy-on-write delete of the same predicate produces;
3. mor_compact folds vectors into files with cow economics — fully-
   dead partitions dropped by unlink, partially-dead ones rewritten
   survivors-only, untouched partitions byte-identical — and a plain
   read afterwards equals the pre-compaction mor_read;
4. NULL-evaluating predicates retain the row (SQL DELETE semantics,
   same as cow_delete);
5. plain spark.read.parquet never sees the _deletes directory.
"""

import os

import pytest

from pyspark.sql import functions as F

from update_database_by_wind_spark.operators.update_pipeline import (
    cow_delete,
    mor_compact,
    mor_delete,
    mor_read,
)

_ROWS = [
    (1, "a", 10),
    (2, "a", 20),
    (3, "b", 30),
    (4, "b", 40),
    (5, "c", 50),
    (6, "c", 60),
]
_SCHEMA = "pk long, m string, val long"


def _write(spark, path):
    df = spark.createDataFrame(_ROWS, _SCHEMA)
    df.repartition(F.col("m")).write.partitionBy("m").parquet(path)


def _file_stats(path):
    stats = {}
    for root, _dirs, files in os.walk(path):
        if "_deletes" in root:
            continue
        for f in files:
            p = os.path.join(root, f)
            stats[p] = (os.path.getsize(p), os.path.getmtime(p))
    return stats


def _rows(df):
    return sorted(map(tuple, df.select("pk", "m", "val").collect()))


def test_mor_delete_touches_no_data_file(spark, tmp_path):
    path = str(tmp_path / "t")
    _write(spark, path)
    before = _file_stats(path)
    n = mor_delete(spark, path, F.col("pk") % 2 == 0, "m", "pk")
    assert n == 3  # pks 2, 4, 6 tombstoned
    assert _file_stats(path) == before, "MOR delete must not touch data"
    # plain readers are oblivious to pending vectors
    assert _rows(spark.read.parquet(path)) == sorted(_ROWS)


def test_mor_read_equals_cow_delete(spark, tmp_path):
    """The verdict's ask: reads-with-tombstones ≡ cow_delete's output
    for the same predicate — partition 'a' fully deleted, 'b'
    partially, 'c' untouched."""
    predicate = (F.col("m") == "a") | (F.col("pk") == 3)
    mor_path, cow_path = str(tmp_path / "mor"), str(tmp_path / "cow")
    _write(spark, mor_path)
    _write(spark, cow_path)
    mor_delete(spark, mor_path, predicate, "m", "pk")
    cow_delete(spark, cow_path, predicate, "m")
    assert _rows(mor_read(spark, mor_path, "m", "pk")) == _rows(
        spark.read.parquet(cow_path)
    )


def test_mor_compact_folds_vectors_with_cow_economics(spark, tmp_path):
    path = str(tmp_path / "t")
    _write(spark, path)
    # two accumulated delete calls: all of 'a', plus pk=3 from 'b'
    mor_delete(spark, path, F.col("m") == "a", "m", "pk")
    mor_delete(spark, path, F.col("pk") == 3, "m", "pk")
    want = _rows(mor_read(spark, path, "m", "pk"))
    untouched_before = {
        p: s for p, s in _file_stats(path).items() if "m=c" in p
    }
    out = mor_compact(spark, path, "m", "pk")
    assert out["dropped"] == ["a"]
    assert out["rewritten"] == ["b"]
    assert not os.path.isdir(os.path.join(path, "_deletes"))
    assert not os.path.isdir(os.path.join(path, "m=a"))
    # untouched partition c: same paths, sizes, mtimes
    untouched_after = {
        p: s for p, s in _file_stats(path).items() if "m=c" in p
    }
    assert untouched_after == untouched_before
    # plain read now equals the pre-compaction vector read
    assert _rows(spark.read.parquet(path)) == want
    # and mor_read with no vectors left is the plain scan
    assert _rows(mor_read(spark, path, "m", "pk")) == want


def test_mor_compact_is_idempotent_after_crash_before_vector_cleanup(
    spark, tmp_path
):
    """Crash story: if compaction rewrites files but dies before
    removing _deletes, the vectors still point at keys that no longer
    exist — mor_read stays correct and a re-run converges."""
    import shutil

    path = str(tmp_path / "t")
    _write(spark, path)
    mor_delete(spark, path, F.col("pk") == 3, "m", "pk")
    want = _rows(mor_read(spark, path, "m", "pk"))
    # preserve the vectors, compact, then restore them = the crash state
    saved = str(tmp_path / "saved")
    shutil.copytree(os.path.join(path, "_deletes"), saved)
    mor_compact(spark, path, "m", "pk")
    shutil.copytree(saved, os.path.join(path, "_deletes"))
    assert _rows(mor_read(spark, path, "m", "pk")) == want
    mor_compact(spark, path, "m", "pk")  # re-run converges
    assert not os.path.isdir(os.path.join(path, "_deletes"))
    assert _rows(spark.read.parquet(path)) == want


def test_mor_delete_null_predicate_retains(spark, tmp_path):
    """A predicate evaluating to NULL means retain — same SQL DELETE
    semantics as cow_delete."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", None), (3, "b", 30)],
        "pk long, m string, val long",
    )
    df.repartition(F.col("m")).write.partitionBy("m").parquet(path)
    mor_delete(spark, path, F.col("val") > 15, "m", "pk")  # NULL on pk=2
    got = sorted(
        (r["pk"], r["m"]) for r in mor_read(spark, path, "m", "pk").collect()
    )
    assert got == [(1, "a"), (2, "a")]


def test_mor_null_partition_and_key_tombstones_apply(spark, tmp_path):
    """Round-8 review finding: tombstones for NULL partition values or
    NULL keys must still apply — plain = never matches NULL, which
    silently retained 'deleted' rows and made compaction discard the
    vectors.  Null-safe joins end to end: delete from the NULL
    partition, read sees it gone, compaction physically drops/rewrites
    it and preserves cow_delete parity."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, None, 10), (2, None, 20), (3, "b", 30), (None, "b", 40)],
        "pk long, m string, val long",
    )
    df.repartition(F.col("m")).write.partitionBy("m").parquet(path)
    # tombstone one row of the NULL partition and the NULL-keyed row
    n = mor_delete(
        spark, path, (F.col("pk") == 1) | F.col("pk").isNull(), "m", "pk"
    )
    assert n == 2
    got = sorted(
        (r["pk"], r["m"], r["val"])
        for r in mor_read(spark, path, "m", "pk").collect()
    )
    assert got == [(2, None, 20), (3, "b", 30)]
    out = mor_compact(spark, path, "m", "pk")
    assert out["dropped"] == []
    assert set(out["rewritten"]) == {None, "b"}
    assert sorted(
        (r["pk"], r["m"], r["val"])
        for r in spark.read.parquet(path).collect()
    ) == [(2, None, 20), (3, "b", 30)]


def test_mor_fully_deleted_null_partition_is_dropped(spark, tmp_path):
    """The drop_null branch must be reachable: a fully-tombstoned NULL
    partition is removed as __HIVE_DEFAULT_PARTITION__."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, None, 10), (2, "b", 20)], "pk long, m string, val long"
    )
    df.repartition(F.col("m")).write.partitionBy("m").parquet(path)
    mor_delete(spark, path, F.col("m").isNull(), "m", "pk")
    out = mor_compact(spark, path, "m", "pk")
    assert out["dropped"] == [None]
    assert not os.path.isdir(
        os.path.join(path, "m=__HIVE_DEFAULT_PARTITION__")
    )
    assert [
        (r["pk"], r["m"]) for r in spark.read.parquet(path).collect()
    ] == [(2, "b")]


def test_mor_crashed_vector_write_residue_reads_as_no_vectors(
    spark, tmp_path
):
    """Round-8 review finding: a crash mid mor_delete leaves _deletes/
    holding only hidden staging files; that residue must read as 'no
    vectors' (the delete never returned success), not break every
    later read with a schema-inference error."""
    path = str(tmp_path / "t")
    _write(spark, path)
    os.makedirs(os.path.join(path, "_deletes", "_temporary", "0"))
    with open(os.path.join(path, "_deletes", "_SUCCESS"), "w"):
        pass
    assert _rows(mor_read(spark, path, "m", "pk")) == sorted(_ROWS)
    assert mor_compact(spark, path, "m", "pk") == {
        "dropped": [],
        "rewritten": [],
    }
    # and a real delete afterwards still works
    mor_delete(spark, path, F.col("pk") == 1, "m", "pk")
    assert len(_rows(mor_read(spark, path, "m", "pk"))) == len(_ROWS) - 1


def test_mor_delete_everything_keeps_table_readable(spark, tmp_path):
    """Round-8 review finding: compacting a table whose every row is
    tombstoned must yield an EMPTY readable table (schema retained via
    a zero-row root file), not an unreadable directory."""
    path = str(tmp_path / "t")
    _write(spark, path)
    mor_delete(spark, path, F.lit(True), "m", "pk")
    out = mor_compact(spark, path, "m", "pk")
    assert sorted(out["dropped"]) == ["a", "b", "c"]
    assert spark.read.parquet(path).count() == 0
    assert spark.read.parquet(path).schema.fieldNames() is not None
    assert mor_read(spark, path, "m", "pk").count() == 0
    assert mor_delete(spark, path, F.lit(True), "m", "pk") == 0


def test_mor_read_shuffle_fallback_equals_broadcast_path(spark, tmp_path):
    """broadcast_vectors=False (the oversized-vectors escape hatch) must
    produce exactly the broadcast plan's rows — only the join strategy
    differs."""
    path = str(tmp_path / "t")
    _write(spark, path)
    mor_delete(spark, path, F.col("pk") % 2 == 0, "m", "pk")
    a = _rows(mor_read(spark, path, "m", "pk"))
    b = _rows(mor_read(spark, path, "m", "pk", broadcast_vectors=False))
    assert a == b == [(1, "a", 10), (3, "b", 30), (5, "c", 50)]


def test_mor_staged_part_file_under_temporary_reads_as_no_vectors(
    spark, tmp_path
):
    """Second review pass, round 8: the REALISTIC crash residue is a
    part file staged under _deletes/_temporary/... (FileOutputCommitter
    layout) — it must not count as a committed vector, because Spark's
    read filters hidden paths and would find zero data files."""
    path = str(tmp_path / "t")
    _write(spark, path)
    staged = os.path.join(
        path, "_deletes", "_temporary", "0", "_temporary", "attempt_1",
        "m=a",
    )
    os.makedirs(staged)
    with open(os.path.join(staged, "part-00000.parquet"), "wb") as fh:
        fh.write(b"not really parquet")
    assert _rows(mor_read(spark, path, "m", "pk")) == sorted(_ROWS)
    assert mor_compact(spark, path, "m", "pk") == {
        "dropped": [],
        "rewritten": [],
    }


def test_mor_delete_everything_crash_mid_drop_is_recoverable(
    spark, tmp_path
):
    """Second review pass, round 8: the zero-row schema reseed must
    land BEFORE the first partition unlink, so a compaction that dies
    halfway through dropping a fully-tombstoned table leaves it
    readable and the retry converges."""
    import shutil

    path = str(tmp_path / "t")
    _write(spark, path)
    mor_delete(spark, path, F.lit(True), "m", "pk")
    # simulate the crash state the old ordering left: run the real
    # compaction, then reconstruct "died after dropping m=a only" by
    # restoring the other partitions and the vectors
    saved = str(tmp_path / "saved")
    shutil.copytree(path, saved)
    mor_compact(spark, path, "m", "pk")
    # crash state: reseed file present (written first), m=a gone,
    # m=b/m=c still on disk, vectors still pending
    for part in ("m=b", "m=c"):
        shutil.copytree(
            os.path.join(saved, part), os.path.join(path, part)
        )
    shutil.copytree(
        os.path.join(saved, "_deletes"), os.path.join(path, "_deletes")
    )
    # mid-crash: table still readable, tombstones still applied
    assert spark.read.parquet(path).count() == 4  # b + c rows remain
    assert mor_read(spark, path, "m", "pk").count() == 0
    # retry converges to the empty-but-readable table
    out = mor_compact(spark, path, "m", "pk")
    assert sorted(out["dropped"]) == ["b", "c"]
    assert spark.read.parquet(path).count() == 0
    assert not os.path.isdir(os.path.join(path, "_deletes"))


from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

_MOR_ROWS = st.lists(
    st.tuples(
        st.integers(0, 9),                       # pk (deduped below)
        st.sampled_from(["a", "b", None]),       # partition, NULL included
        st.integers(0, 99),
    ),
    min_size=1,
    max_size=8,
    unique_by=lambda t: t[0],
)

_MOR_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("delete"), st.sets(st.integers(0, 9), max_size=4)),
        st.tuples(st.just("compact"), st.none()),
    ),
    min_size=1,
    max_size=4,
)


@given(rows=_MOR_ROWS, ops=_MOR_OPS)
# re-deleting an uncompacted key: the predicate matches the still-
# physical row again, but the existing-vector anti-join (round-8
# advisor fix) must report it as zero NEW tombstones and append no
# duplicate vector row
@example(
    rows=[(1, "a", 5)],
    ops=[("delete", {1}), ("delete", {1}), ("compact", None)],
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_mor_family_replays_like_a_dict(spark, tmp_path_factory, rows, ops):
    """U18 law, model-based: for ANY table (NULL partitions included)
    and ANY interleaving of key-set deletes and compactions, mor_read
    equals a plain dict replay after every step, and a final
    compaction converges the physical table to the model — the whole
    family (vectors, null-safe anti-join, compaction economics, empty-
    table reseed) under arbitrary schedules, not just the fixtures."""
    path = str(tmp_path_factory.mktemp("morfuzz") / "t")
    df = spark.createDataFrame(rows, _SCHEMA)
    df.repartition(F.col("m")).write.partitionBy("m").parquet(path)
    model = {pk: (m, val) for pk, m, val in rows}

    def check():
        got = sorted(
            (r["pk"], r["m"], r["val"])
            for r in mor_read(spark, path, "m", "pk").collect()
        )
        want = sorted((pk, m, v) for pk, (m, v) in model.items())
        assert got == want, (got, want)

    for op, arg in ops:
        if op == "delete":
            n = mor_delete(
                spark, path, F.col("pk").isin(sorted(arg)), "m", "pk"
            )
            # the count is NEWLY tombstoned keys — the logical table's
            # matches, regardless of what compaction has folded yet
            assert n == len(set(model) & arg), (n, set(model), arg)
            for pk in arg:
                model.pop(pk, None)
        else:
            mor_compact(spark, path, "m", "pk")
        check()
    mor_compact(spark, path, "m", "pk")
    got_plain = sorted(
        (r["pk"], r["m"], r["val"])
        for r in spark.read.parquet(path).collect()
    )
    assert got_plain == sorted((pk, m, v) for pk, (m, v) in model.items())


def test_overlapping_deletes_count_only_new_keys_and_dont_grow_vectors(
    spark, tmp_path
):
    """Round-8 advisor finding: mor_delete must evaluate against the
    logical (MOR) state, not the raw scan — a second delete whose
    predicate overlaps already-tombstoned rows returns only the NEWLY
    tombstoned count and appends no duplicate vector rows."""
    path = str(tmp_path / "t")
    _write(spark, path)
    assert mor_delete(spark, path, F.col("pk").isin(1, 3), "m", "pk") == 2
    # pk 1 and 3 are already tombstoned; only pk 5 is new
    assert (
        mor_delete(spark, path, F.col("pk").isin(1, 3, 5), "m", "pk") == 1
    )
    vec = spark.read.parquet(os.path.join(path, "_deletes"))
    assert vec.count() == 3  # one physical row per tombstoned key
    # a fully-redundant delete writes nothing and returns zero
    assert mor_delete(spark, path, F.col("pk").isin(1, 5), "m", "pk") == 0
    assert spark.read.parquet(os.path.join(path, "_deletes")).count() == 3
    assert _rows(mor_read(spark, path, "m", "pk")) == [
        (2, "a", 20), (4, "b", 40), (6, "c", 60),
    ]


def test_sequence_vectors_express_upserts_and_resurrection(spark, tmp_path):
    """U18b law: with sequence-aware vectors a batch's new image
    survives its own tombstone (upsert), a LATER delete kills it, and
    a still-later insert resurrects the key — the Iceberg v2
    sequence-number semantics plain vectors cannot express."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        mor_cdc_apply,
        mor_read_seq,
    )

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a", 10, 0), (2, "a", 20, 0)], "pk long, m string, val long, __seq long"
    ).repartition(F.col("m")).write.partitionBy("m").parquet(path)

    def live():
        return sorted(
            (r["pk"], r["m"], r["val"])
            for r in mor_read_seq(spark, path, "m", "pk").collect()
        )

    def batch(rows):
        return spark.createDataFrame(
            rows, "op string, m string, pk long, val long"
        )

    # seq 1: upsert pk 1 -> new image survives its own tombstone
    mor_cdc_apply(spark, path, batch([("U", "a", 1, 11)]), "m", "pk",
                  ["val"], seq=1)
    assert live() == [(1, "a", 11), (2, "a", 20)]
    # seq 2: delete pk 1 -> the seq-1 image dies (strictly-smaller rule)
    mor_cdc_apply(spark, path, batch([("D", "a", 1, None)]), "m", "pk",
                  ["val"], seq=2)
    assert live() == [(2, "a", 20)]
    # seq 3: re-insert pk 1 -> resurrected; the seq-2 tombstone is older
    mor_cdc_apply(spark, path, batch([("I", "a", 1, 12)]), "m", "pk",
                  ["val"], seq=3)
    assert live() == [(1, "a", 12), (2, "a", 20)]


def test_seq_aware_compact_preserves_upserts(spark, tmp_path):
    """The round-9 advisor's corruption scenario, now refused/ fixed:
    after an upsert (new image shares its tombstone's key),
    mor_compact_seq must keep the new image and drop only the old one;
    the post-compaction table must read identically through BOTH a
    plain scan and mor_read_seq, carry no _deletes dir, and stay a
    valid mor_cdc_apply target."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        mor_cdc_apply,
        mor_compact_seq,
        mor_read_seq,
    )

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a", 10, 0), (2, "a", 20, 0), (3, "b", 30, 0)],
        "pk long, m string, val long, __seq long",
    ).repartition(F.col("m")).write.partitionBy("m").parquet(path)

    def batch(rows):
        return spark.createDataFrame(
            rows, "op string, m string, pk long, val long"
        )

    # seq 1: upsert pk 1, delete pk 2; seq 2: delete+reinsert pk 3
    # (resurrection) — the three shapes key-only compaction corrupts.
    mor_cdc_apply(
        spark, path, batch([("U", "a", 1, 11), ("D", "a", 2, None)]),
        "m", "pk", ["val"], seq=1,
    )
    mor_cdc_apply(
        spark, path, batch([("D", "b", 3, None), ("I", "b", 3, 31)]),
        "m", "pk", ["val"], seq=2,
    )
    want = [(1, "a", 11), (3, "b", 31)]

    def live_seq():
        return sorted(
            (r["pk"], r["m"], r["val"])
            for r in mor_read_seq(spark, path, "m", "pk").collect()
        )

    assert live_seq() == want
    res = mor_compact_seq(spark, path, "m", "pk")
    assert set(res["rewritten"]) == {"a", "b"} and not res["dropped"]
    assert not os.path.isdir(os.path.join(path, "_deletes"))
    plain = sorted(
        (r["pk"], r["m"], r["val"])
        for r in spark.read.parquet(path).collect()
    )
    assert plain == want
    assert live_seq() == want  # seq read with no vectors = plain scan
    # the table is still a valid CDC target after compaction
    mor_cdc_apply(
        spark, path, batch([("U", "a", 1, 12)]), "m", "pk", ["val"], seq=3
    )
    assert live_seq() == [(1, "a", 12), (3, "b", 31)]
    # idempotence: a second compact (fresh vectors) also folds cleanly
    mor_compact_seq(spark, path, "m", "pk")
    assert live_seq() == [(1, "a", 12), (3, "b", 31)]


def test_seq_unaware_family_refuses_seq_tables(spark, tmp_path):
    """mor_delete / mor_read / mor_compact on an __seq table must
    refuse (ValueError), never corrupt — and the refusal fires even
    when only the VECTORS carry __seq."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        mor_cdc_apply,
        mor_compact_seq,
        mor_read_seq,
    )

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a", 10, 0)], "pk long, m string, val long, __seq long"
    ).write.partitionBy("m").parquet(path)

    with pytest.raises(ValueError, match="mor_read_seq"):
        mor_read(spark, path, "m", "pk")
    with pytest.raises(ValueError, match="mor_cdc_apply"):
        mor_delete(spark, path, F.col("pk") == 1, "m", "pk")
    with pytest.raises(ValueError, match="mor_compact_seq"):
        mor_compact(spark, path, "m", "pk")
    # and the seq family refuses plain tables / missing seeds
    plain = str(tmp_path / "p")
    spark.createDataFrame([(1, "a", 10)], "pk long, m string, val long")\
        .write.partitionBy("m").parquet(plain)
    with pytest.raises(ValueError, match="mor_read"):
        mor_read_seq(spark, plain, "m", "pk")
    with pytest.raises(ValueError, match="mor_compact"):
        mor_compact_seq(spark, plain, "m", "pk")
    with pytest.raises(ValueError, match="__seq = 0"):
        mor_cdc_apply(
            spark, plain,
            spark.createDataFrame(
                [("U", "a", 1, 11)], "op string, m string, pk long, val long"
            ),
            "m", "pk", ["val"], seq=1,
        )


def test_mor_delete_seq_interleaves_with_cdc(spark, tmp_path):
    """U24 law: a predicate delete stamped with its own sequence
    composes with CDC batches under the one strictly-greater kill
    rule — a later I resurrects an erased key, and compaction folds
    erasure vectors and CDC tombstones alike."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        mor_cdc_apply,
        mor_compact_seq,
        mor_delete_seq,
        mor_read_seq,
    )

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a", 10, 0), (2, "a", 20, 0), (3, "b", 30, 0)],
        "pk long, m string, val long, __seq long",
    ).repartition(F.col("m")).write.partitionBy("m").parquet(path)

    def live():
        return sorted(
            (r["pk"], r["m"], r["val"])
            for r in mor_read_seq(spark, path, "m", "pk").collect()
        )

    # seq 1: CDC upsert of pk 2
    mor_cdc_apply(
        spark, path,
        spark.createDataFrame(
            [("U", "a", 2, 21)], "op string, m string, pk long, val long"
        ),
        "m", "pk", ["val"], seq=1,
    )
    # seq 2: predicate-erase the odd keys (cross-partition)
    assert mor_delete_seq(
        spark, path, F.col("pk") % 2 == 1, "m", "pk", seq=2
    ) == 2
    assert live() == [(2, "a", 21)]
    # repeat call: live view re-evaluation -> nothing matches, no growth
    assert mor_delete_seq(
        spark, path, F.col("pk") % 2 == 1, "m", "pk", seq=2
    ) == 0
    # seq 3: CDC re-insert of erased pk 1 -> outlives the seq-2 vector
    mor_cdc_apply(
        spark, path,
        spark.createDataFrame(
            [("I", "a", 1, 11)], "op string, m string, pk long, val long"
        ),
        "m", "pk", ["val"], seq=3,
    )
    assert live() == [(1, "a", 11), (2, "a", 21)]
    # compaction folds erasure + CDC vectors together
    mor_compact_seq(spark, path, "m", "pk")
    assert not os.path.isdir(os.path.join(path, "_deletes"))
    assert sorted(
        (r["pk"], r["m"], r["val"])
        for r in spark.read.parquet(path).collect()
    ) == [(1, "a", 11), (2, "a", 21)]


def test_mor_delete_seq_refuses_stale_sequence_and_plain_tables(
    spark, tmp_path
):
    """A delete stamp that is not strictly larger than every matched
    live image's __seq would write vectors that kill nothing (the >
    rule) — refusal, not a silent no-op; and the plain/seq family
    boundary holds both ways."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        mor_cdc_apply,
        mor_delete_seq,
        mor_read_seq,
    )

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a", 10, 0)], "pk long, m string, val long, __seq long"
    ).write.partitionBy("m").parquet(path)
    mor_cdc_apply(
        spark, path,
        spark.createDataFrame(
            [("U", "a", 1, 11)], "op string, m string, pk long, val long"
        ),
        "m", "pk", ["val"], seq=5,
    )
    with pytest.raises(ValueError, match="strictly larger"):
        mor_delete_seq(spark, path, F.col("pk") == 1, "m", "pk", seq=5)
    # nothing was written by the refused call
    assert sorted(
        (r["pk"], r["m"], r["val"])
        for r in mor_read_seq(spark, path, "m", "pk").collect()
    ) == [(1, "a", 11)]
    # an adequate stamp succeeds
    assert mor_delete_seq(
        spark, path, F.col("pk") == 1, "m", "pk", seq=6
    ) == 1
    assert mor_read_seq(spark, path, "m", "pk").count() == 0
    # zero-match predicates return 0 regardless of stamp
    assert mor_delete_seq(
        spark, path, F.col("pk") == 99, "m", "pk", seq=0
    ) == 0
    # NULL-evaluating predicates retain the row (SQL DELETE semantics)
    path2 = str(tmp_path / "n")
    spark.createDataFrame(
        [(1, "a", None, 0), (2, "a", 20, 0)],
        "pk long, m string, val long, __seq long",
    ).write.partitionBy("m").parquet(path2)
    assert mor_delete_seq(
        spark, path2, F.col("val") > 5, "m", "pk", seq=1
    ) == 1
    assert sorted(
        r["pk"] for r in mor_read_seq(spark, path2, "m", "pk").collect()
    ) == [1]
    # plain table -> refusal pointing at mor_delete
    plain = str(tmp_path / "p")
    spark.createDataFrame([(1, "a", 10)], "pk long, m string, val long")\
        .write.partitionBy("m").parquet(plain)
    with pytest.raises(ValueError, match="use mor_delete"):
        mor_delete_seq(spark, plain, F.col("pk") == 1, "m", "pk", seq=1)


# --- round-15: census-scoped sequence-aware compaction ------------------------


def _seed_seq(spark, path, rows):
    spark.createDataFrame(
        rows, "pk long, m string, val long, __seq long"
    ).repartition(F.col("m")).write.partitionBy("m").parquet(path)


def _cdc(spark, rows):
    return spark.createDataFrame(
        rows, "op string, m string, pk long, val long"
    )


def test_scoped_compact_folds_only_named_partitions(spark, tmp_path):
    """mor_compact_seq(parts=[...]) is the census-gated scheduler's
    targeting contract: the named partitions are folded (survivors
    rewritten, their vector subdirs removed) while every OTHER
    partition keeps both its data files (byte-identical) and its
    tombstones — so the half-compacted table still reads exactly
    through mor_read_seq, and a later full fold finishes the job."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        mor_cdc_apply,
        mor_compact_seq,
        mor_read_seq,
    )

    path = str(tmp_path / "t")
    _seed_seq(
        spark, path,
        [(1, "a", 10, 0), (2, "a", 20, 0),
         (3, "b", 30, 0), (4, "b", 40, 0),
         (5, "c", 50, 0)],
    )
    mor_cdc_apply(
        spark, path,
        _cdc(spark, [("U", "a", 1, 11), ("D", "b", 3, None),
                     ("U", "c", 5, 51)]),
        "m", "pk", ["val"], seq=1,
    )
    want = [(1, "a", 11), (2, "a", 20), (4, "b", 40), (5, "c", 51)]

    def live():
        return sorted(
            (r["pk"], r["m"], r["val"])
            for r in mor_read_seq(spark, path, "m", "pk").collect()
        )

    assert live() == want
    before = {
        p: s
        for p, s in _file_stats(path).items()
        if "/m=b/" in p or "/m=c/" in p
    }
    res = mor_compact_seq(spark, path, "m", "pk", parts=["a"])
    assert res == {"dropped": [], "rewritten": ["a"], "merged": []}
    # scope receipts: a's vectors folded and removed, b/c untouched
    dels = os.path.join(path, "_deletes")
    assert not os.path.isdir(os.path.join(dels, "m=a"))
    assert os.path.isdir(os.path.join(dels, "m=b"))
    assert os.path.isdir(os.path.join(dels, "m=c"))
    after = {
        p: s
        for p, s in _file_stats(path).items()
        if "/m=b/" in p or "/m=c/" in p
    }
    assert after == before
    # a's dir now holds ONLY live images (plain scan of the partition)
    got_a = sorted(
        (r["pk"], r["val"])
        for r in spark.read.parquet(os.path.join(path, "m=a")).collect()
    )
    assert got_a == [(1, 11), (2, 20)]
    # the half-compacted table still reads exactly
    assert live() == want
    # and stays a valid CDC target across the scope boundary
    mor_cdc_apply(
        spark, path, _cdc(spark, [("U", "a", 2, 21)]),
        "m", "pk", ["val"], seq=2,
    )
    want2 = [(1, "a", 11), (2, "a", 21), (4, "b", 40), (5, "c", 51)]
    assert live() == want2
    # the later FULL fold removes the whole vector store
    mor_compact_seq(spark, path, "m", "pk")
    assert not os.path.isdir(dels)
    plain = sorted(
        (r["pk"], r["m"], r["val"])
        for r in spark.read.parquet(path).collect()
    )
    assert plain == want2


def test_scoped_compact_empty_parts_is_noop(spark, tmp_path):
    """parts=[] is the policy's 'nothing due' branch: an explicit
    no-op — no file read, written, or removed."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        mor_cdc_apply,
        mor_compact_seq,
    )

    path = str(tmp_path / "t")
    _seed_seq(spark, path, [(1, "a", 10, 0), (2, "b", 20, 0)])
    mor_cdc_apply(
        spark, path, _cdc(spark, [("U", "a", 1, 11)]),
        "m", "pk", ["val"], seq=1,
    )
    before = _file_stats(path)
    dels = os.path.join(path, "_deletes")
    vec_before = sorted(
        os.path.join(r, f)
        for r, _d, fs in os.walk(dels)
        for f in fs
    )
    assert mor_compact_seq(spark, path, "m", "pk", parts=[]) == {
        "dropped": [],
        "rewritten": [],
        "merged": [],
    }
    assert _file_stats(path) == before
    assert sorted(
        os.path.join(r, f)
        for r, _d, fs in os.walk(dels)
        for f in fs
    ) == vec_before


def test_scoped_compact_decodes_escaped_partition_dirs(spark, tmp_path):
    """The partition_orphan_gc lesson applied to the scope's vector
    removal: dir names are Hive percent-escaped, scope values are
    decoded — a scoped fold of partition 'a:x' must remove the
    m=a%3Ax vector subdir, not skip it (leaving a folded partition's
    tombstones behind would re-kill its rewritten survivors)."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        mor_cdc_apply,
        mor_compact_seq,
        mor_read_seq,
    )

    path = str(tmp_path / "t")
    _seed_seq(
        spark, path, [(1, "a:x", 10, 0), (2, "b", 20, 0)]
    )
    mor_cdc_apply(
        spark, path,
        _cdc(spark, [("U", "a:x", 1, 11), ("U", "b", 2, 21)]),
        "m", "pk", ["val"], seq=1,
    )
    res = mor_compact_seq(spark, path, "m", "pk", parts=["a:x"])
    assert res == {"dropped": [], "rewritten": ["a:x"], "merged": []}
    dels = os.path.join(path, "_deletes")
    assert not os.path.isdir(os.path.join(dels, "m=a%3Ax"))
    assert os.path.isdir(os.path.join(dels, "m=b"))
    got = sorted(
        (r["pk"], r["m"], r["val"])
        for r in mor_read_seq(spark, path, "m", "pk").collect()
    )
    assert got == [(1, "a:x", 11), (2, "b", 21)]


_SEQ_BATCH = st.lists(
    st.tuples(
        st.sampled_from(["up", "del"]),
        st.integers(0, 9),
        st.integers(0, 99),
    ),
    min_size=1,
    max_size=5,
)

_SEQ_SCHED = st.lists(
    st.one_of(
        st.tuples(st.just("batch"), _SEQ_BATCH),
        st.tuples(
            st.just("fold"),
            st.sets(st.sampled_from(["a", "b"]), max_size=2),
        ),
    ),
    min_size=1,
    max_size=6,
)


@given(sched=_SEQ_SCHED)
# the scope-boundary hazard the fixtures can't vary: fold one
# partition mid-stream, then delete a key whose image the fold just
# rewrote, then fold everything — the rewritten survivor must still
# die to the later tombstone
@example(
    sched=[
        ("batch", [("up", 1, 50)]),
        ("fold", {"a"}),
        ("batch", [("del", 1, 0)]),
        ("fold", {"a", "b"}),
    ]
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_scoped_fold_replays_like_a_dict(spark, tmp_path_factory, sched):
    """Round-15 law, model-based: for ANY interleaving of CDC batches
    (upserts/inserts/deletes with strictly increasing sequence) and
    SCOPED folds of arbitrary partition subsets, mor_read_seq equals
    a plain dict replay after every step — the scoped fold is
    invisible to the CDC algebra no matter where the scope boundary
    falls — and a final full fold converges the physical table to the
    model."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        mor_cdc_apply,
        mor_compact_seq,
        mor_read_seq,
    )

    path = str(tmp_path_factory.mktemp("scopefuzz") / "t")
    seed = [(0, "a", 10), (1, "a", 11), (5, "b", 15), (6, "b", 16)]
    spark.createDataFrame(
        [(pk, m, v, 0) for pk, m, v in seed],
        "pk long, m string, val long, __seq long",
    ).repartition(F.col("m")).write.partitionBy("m").parquet(path)
    model = {pk: (m, v) for pk, m, v in seed}
    seq = 0

    def check():
        got = sorted(
            (r["pk"], r["m"], r["val"])
            for r in mor_read_seq(spark, path, "m", "pk").collect()
        )
        want = sorted((pk, m, v) for pk, (m, v) in model.items())
        assert got == want, (got, want)

    for op, arg in sched:
        if op == "batch":
            seq += 1
            rows, seen = [], set()
            for kind, key, val in arg:
                if key in seen:
                    continue  # one op per key per micro-batch
                seen.add(key)
                part = "a" if key < 5 else "b"
                if kind == "up":
                    rows.append(
                        ("U" if key in model else "I", part, key, val)
                    )
                    model[key] = (part, val)
                else:
                    rows.append(("D", part, key, None))
                    model.pop(key, None)
            mor_cdc_apply(
                spark, path,
                spark.createDataFrame(
                    rows, "op string, m string, pk long, val long"
                ),
                "m", "pk", ["val"], seq=seq,
            )
        else:
            parts = sorted(arg)
            mor_compact_seq(spark, path, "m", "pk", parts=parts)
            for p in parts:
                assert not os.path.isdir(
                    os.path.join(path, "_deletes", f"m={p}")
                )
        check()
    mor_compact_seq(spark, path, "m", "pk")
    got_plain = sorted(
        (r["pk"], r["m"], r["val"])
        for r in spark.read.parquet(path).collect()
    )
    assert got_plain == sorted(
        (pk, m, v) for pk, (m, v) in model.items()
    )
    assert not os.path.isdir(os.path.join(path, "_deletes"))


def test_scoped_fold_merges_insert_fragmented_partitions(spark, tmp_path):
    """Round-15 reviewer scenario: a partition named by the census for
    INSERT-only fragmentation carries no delete vectors, so the vector
    fold has nothing to do — the scoped work order must merge its
    files anyway (reported under 'merged'), or the scheduler names it
    again on every trigger forever."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        mor_cdc_apply,
        mor_compact_seq,
        mor_read_seq,
        small_file_census,
    )

    path = str(tmp_path / "t")
    _seed_seq(spark, path, [(1, "a", 10, 0), (5, "b", 50, 0)])
    # three insert-only batches fragment ONLY partition a
    for seq, (pk, val) in enumerate([(2, 20), (3, 30), (4, 40)], start=1):
        mor_cdc_apply(
            spark, path, _cdc(spark, [("I", "a", pk, val)]),
            "m", "pk", ["val"], seq=seq,
        )
    census = {c["partition"]: c["n_files"]
              for c in small_file_census(path, "m")}
    assert census == {"a": 4, "b": 1}
    want = sorted(
        (r["pk"], r["m"], r["val"])
        for r in mor_read_seq(spark, path, "m", "pk").collect()
    )
    res = mor_compact_seq(spark, path, "m", "pk", parts=["a"])
    assert res == {"dropped": [], "rewritten": [], "merged": ["a"]}
    census2 = {c["partition"]: c["n_files"]
               for c in small_file_census(path, "m")}
    assert census2 == {"a": 1, "b": 1}
    got = sorted(
        (r["pk"], r["m"], r["val"])
        for r in mor_read_seq(spark, path, "m", "pk").collect()
    )
    assert got == want
    # a single-file named partition has nothing to merge: honest no-op
    assert mor_compact_seq(spark, path, "m", "pk", parts=["b"]) == {
        "dropped": [], "rewritten": [], "merged": [],
    }
