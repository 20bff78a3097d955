"""Generative differential testing for transaction-group retention:
hypothesis drives the REAL txn_commit / txn_expire machinery against a
pure-Python dict model under arbitrary multi-table histories and
arbitrary keep sets — the occ-fuzz pattern (round 11) applied to the
round-15 GC surface.  The law under test is txn_expire's contract:
after any legal expiry, every RETAINED transaction reads back exactly
the state the model says it published, expired pointers are gone, and
the immediate re-run is a no-op.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
        HealthCheck.data_too_large,
    ],
)

_TABLES = ["a", "b"]
_PARTS = ["x", "y"]

# one history step: for each table, either untouched (mask bit 0) or
# committed with a fresh value over a non-empty partition subset.
# (table_mask 1..3 picks the touched tables; per-table part_mask 1..3
# picks the partitions that commit rewrites.)
_STEPS = st.lists(
    st.tuples(st.integers(1, 3), st.integers(1, 3), st.integers(1, 3)),
    min_size=2,
    max_size=5,
)


@given(steps=_STEPS, keep_mask=st.integers(1, 31))
@settings(**_SETTINGS)
def test_txn_expire_matches_model_on_random_histories(spark, steps, keep_mask):
    """Arbitrary histories (each txn touches a random table subset,
    each touched table rewrites a random partition subset) and an
    arbitrary keep set (head forced in): the real txn_expire must
    leave every retained transaction's reads equal to the dict-model
    replay, remove exactly the expired pointers, and converge — the
    immediate re-run removes nothing further."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        txn_commit,
        txn_expire,
        txn_read,
    )

    root = tempfile.mkdtemp(prefix="txn_expire_fuzz_")
    base = f"{root}/g"
    try:
        # model: per txn, per table, per partition -> committed value
        model: dict[int, dict[str, dict[str, int]]] = {}
        state: dict[str, dict[str, int]] = {
            t: {p: 0 for p in _PARTS} for t in _TABLES
        }
        # txn 1 seeds both tables in full (txn_commit requires each
        # table's first commit to exist before partial updates)
        txn_commit(
            base,
            1,
            {
                t: (
                    spark.createDataFrame(
                        [(p, 0) for p in _PARTS], "m string, v long"
                    ),
                    "m",
                    None,
                )
                for t in _TABLES
            },
        )
        model[1] = {t: dict(state[t]) for t in _TABLES}
        val = 0
        for i, (table_mask, pm_a, pm_b) in enumerate(steps):
            updates = {}
            for bit, (t, pm) in enumerate(
                zip(_TABLES, (pm_a, pm_b))
            ):
                if not table_mask & (1 << bit):
                    continue
                parts = [
                    p
                    for j, p in enumerate(_PARTS)
                    if pm & (1 << j)
                ]
                val += 1
                rows = [(p, val) for p in parts]
                for p in parts:
                    state[t][p] = val
                updates[t] = (
                    spark.createDataFrame(rows, "m string, v long"),
                    "m",
                    parts,
                )
            if not updates:  # mask 0 impossible by strategy, guard anyway
                continue
            txn_commit(base, 2 + i, updates)
            model[2 + i] = {t: dict(state[t]) for t in _TABLES}
        head = max(model)
        keep = sorted(
            {head}
            | {v for v in model if keep_mask & (1 << (v - 1))}
        )
        pre = {
            v: {
                t: sorted(
                    map(
                        tuple,
                        txn_read(spark, base, v, t, "m")
                        .select("m", "v")
                        .collect(),
                    )
                )
                for t in _TABLES
            }
            for v in keep
        }
        rep = txn_expire(base, keep)
        expired = sorted(set(model) - set(keep))
        assert rep["removed_pointers"] == [
            f"_txn_v{v}.json" for v in expired
        ]
        for v in expired:
            assert not os.path.exists(
                os.path.join(base, f"_txn_v{v}.json")
            )
        for v in keep:
            for t in _TABLES:
                got = sorted(
                    map(
                        tuple,
                        txn_read(spark, base, v, t, "m")
                        .select("m", "v")
                        .collect(),
                    )
                )
                assert got == pre[v][t], (v, t, got, pre[v][t])
                want = sorted(
                    (p, model[v][t][p]) for p in _PARTS
                )
                assert got == want, (v, t, got, want)
        rep2 = txn_expire(base, keep)
        assert rep2["removed_pointers"] == []
        assert rep2["orphans_reclaimed"] == []
        for t in _TABLES:
            assert rep2["tables"][t]["removed_dirs"] == []
            assert rep2["tables"][t]["removed_manifests"] == []
    finally:
        shutil.rmtree(root, ignore_errors=True)


_CHURN = st.lists(
    # one churn op per partition index: 0 = leave alone, 1 = compact
    # (rewrite files), 2 = delete the partition dir outright
    st.integers(0, 2), min_size=3, max_size=3,
)


@given(churn=_CHURN)
@settings(max_examples=5, deadline=None, suppress_health_check=[
    HealthCheck.too_slow,
    HealthCheck.function_scoped_fixture,
    HealthCheck.data_too_large,
])
def test_stats_resync_heals_arbitrary_churn(spark, churn):
    """snapshot_stats_resync's existence-driven law under arbitrary
    interleavings of the rewriters it serves: any mix of per-partition
    compaction and outright deletion inside a version dir is healed in
    ONE resync — the ledger afterwards covers exactly the files on
    disk, surviving partitions' band reads answer exactly, and the
    immediate re-run reports zero deltas."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        compact_partitions,
        snapshot_commit_with_stats,
        snapshot_stats_resync,
    )

    parts = ["p0", "p1", "p2"]
    root = tempfile.mkdtemp(prefix="resync_fuzz_")
    base = f"{root}/t"
    try:
        rows = [(p, i, 10 * i) for i, p in enumerate(parts)] + [
            (p, i + 10, 10 * (i + 10)) for i, p in enumerate(parts)
        ]
        spark.conf.set("spark.sql.files.maxRecordsPerFile", "1")
        try:
            snapshot_commit_with_stats(
                spark,
                spark.createDataFrame(rows, "m string, pk long, val long"),
                base, 1, "m", ["pk", "val"],
            )
        finally:
            spark.conf.set("spark.sql.files.maxRecordsPerFile", "0")
        survivors = []
        for p, op in zip(parts, churn):
            pdir = os.path.join(base, "v1", f"m={p}")
            if op == 1:
                compact_partitions(
                    spark, os.path.join(base, "v1"), "m",
                    max_files=1, only=[p],
                )
                survivors.append(p)
            elif op == 2:
                shutil.rmtree(pdir)
            else:
                survivors.append(p)
        import json

        snapshot_stats_resync(spark, base, 1, "m")
        with open(os.path.join(base, "_stats_v1.json")) as fh:
            led = json.load(fh)
        on_disk = {
            os.path.relpath(os.path.join(r_, f), base)
            for r_, ds, fs in os.walk(os.path.join(base, "v1"))
            for f in fs
            if f.endswith(".parquet")
        }
        assert set(led) == on_disk
        assert snapshot_stats_resync(spark, base, 1, "m") == {
            "dropped": [], "added": [], "resynced_parts": [],
        }
        # surviving partitions still answer band reads exactly through
        # the healed ledger (deleted partitions are gone from the
        # manifest's perspective only via cow paths — here we just
        # check the stats view agrees with disk, which set-equality
        # above already proves file-for-file)
        for p in survivors:
            files = [k for k in led if f"/m={p}/" in k]
            assert files, (p, led)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@given(steps=_STEPS, keep_mask=st.integers(1, 31), crash_after=st.integers(0, 6))
@settings(**_SETTINGS)
def test_txn_expire_crash_interleaving_recovers(
    spark, steps, keep_mask, crash_after
):
    """The round-15 advisor's kill point, fuzzed: an expiry that dies
    after removing the first ``crash_after`` expired pointers (and
    before any per-table expiry ran) must be finished by the re-run —
    retained reads equal the dict-model replay, the deferred residue
    is reclaimed through the keep-set expiry, and the run after THAT
    is a provable no-op.  Before the fix the re-run raised
    'below its pointed head' on every schedule with crash_after > 0."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        txn_commit,
        txn_expire,
        txn_read,
    )

    root = tempfile.mkdtemp(prefix="txn_expire_crash_fuzz_")
    base = f"{root}/g"
    try:
        model: dict[int, dict[str, dict[str, int]]] = {}
        state: dict[str, dict[str, int]] = {
            t: {p: 0 for p in _PARTS} for t in _TABLES
        }
        txn_commit(
            base,
            1,
            {
                t: (
                    spark.createDataFrame(
                        [(p, 0) for p in _PARTS], "m string, v long"
                    ),
                    "m",
                    None,
                )
                for t in _TABLES
            },
        )
        model[1] = {t: dict(state[t]) for t in _TABLES}
        val = 0
        for i, (table_mask, pm_a, pm_b) in enumerate(steps):
            updates = {}
            for bit, (t, pm) in enumerate(zip(_TABLES, (pm_a, pm_b))):
                if not table_mask & (1 << bit):
                    continue
                parts = [
                    p for j, p in enumerate(_PARTS) if pm & (1 << j)
                ]
                val += 1
                for p in parts:
                    state[t][p] = val
                updates[t] = (
                    spark.createDataFrame(
                        [(p, val) for p in parts], "m string, v long"
                    ),
                    "m",
                    parts,
                )
            if not updates:
                continue
            txn_commit(base, 2 + i, updates)
            model[2 + i] = {t: dict(state[t]) for t in _TABLES}
        head = max(model)
        keep = sorted(
            {head} | {v for v in model if keep_mask & (1 << (v - 1))}
        )
        expired = sorted(set(model) - set(keep))
        # the crash: step 3 got through the first crash_after pointer
        # removals, step 4 never ran
        for v in expired[:crash_after]:
            os.remove(os.path.join(base, f"_txn_v{v}.json"))
        rep = txn_expire(base, keep)
        assert rep["removed_pointers"] == [
            f"_txn_v{v}.json" for v in expired[crash_after:]
        ]
        for v in keep:
            for t in _TABLES:
                got = sorted(
                    map(
                        tuple,
                        txn_read(spark, base, v, t, "m")
                        .select("m", "v")
                        .collect(),
                    )
                )
                want = sorted((p, model[v][t][p]) for p in _PARTS)
                assert got == want, (v, t, got, want)
        rep2 = txn_expire(base, keep)
        assert rep2["removed_pointers"] == []
        assert rep2["orphans_reclaimed"] == []
        assert rep2["residue_deferred"] == []
        for t in _TABLES:
            assert rep2["tables"][t]["removed_dirs"] == []
            assert rep2["tables"][t]["removed_manifests"] == []
    finally:
        shutil.rmtree(root, ignore_errors=True)


@given(
    steps=_STEPS,
    stamp_mask=st.integers(0, 63),
    tag_mask=st.integers(0, 63),
    max_age_days=st.integers(1, 40),
)
@settings(**_SETTINGS)
def test_txn_expire_by_age_matches_model(
    spark, steps, stamp_mask, tag_mask, max_age_days
):
    """u40's policy against a dict model under random histories,
    random stamping (stamp_mask bit v-1 = txn v is dated at day
    10*(v-1)), random tag subsets and a random age horizon: the
    machinery's keep set must equal newest ∪ tagged ∪ undated ∪
    young, every retained read must equal the model replay, and the
    policy must converge."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        txn_commit,
        txn_commit_at,
        txn_expire_by_age,
        txn_read,
        txn_tag,
    )

    day = 86400.0
    root = tempfile.mkdtemp(prefix="txn_age_fuzz_")
    base = f"{root}/g"
    try:
        model: dict[int, dict[str, dict[str, int]]] = {}
        state = {t: {p: 0 for p in _PARTS} for t in _TABLES}

        def commit(v, updates):
            if stamp_mask & (1 << (v - 1)):
                txn_commit_at(
                    base, v, updates, committed_at=10 * (v - 1) * day
                )
            else:
                txn_commit(base, v, updates)

        commit(
            1,
            {
                t: (
                    spark.createDataFrame(
                        [(p, 0) for p in _PARTS], "m string, v long"
                    ),
                    "m",
                    None,
                )
                for t in _TABLES
            },
        )
        model[1] = {t: dict(state[t]) for t in _TABLES}
        val = 0
        for i, (table_mask, pm_a, pm_b) in enumerate(steps):
            updates = {}
            for bit, (t, pm) in enumerate(zip(_TABLES, (pm_a, pm_b))):
                if not table_mask & (1 << bit):
                    continue
                parts = [
                    p for j, p in enumerate(_PARTS) if pm & (1 << j)
                ]
                val += 1
                for p in parts:
                    state[t][p] = val
                updates[t] = (
                    spark.createDataFrame(
                        [(p, val) for p in parts], "m string, v long"
                    ),
                    "m",
                    parts,
                )
            if not updates:
                continue
            commit(2 + i, updates)
            model[2 + i] = {t: dict(state[t]) for t in _TABLES}
        head = max(model)
        tagged = sorted(
            v for v in model if tag_mask & (1 << (v - 1))
        )
        for v in tagged:
            txn_tag(base, f"pin-{v}", v)
        now = 10 * head * day
        dated = {
            v: 10 * (v - 1) * day
            for v in model
            if stamp_mask & (1 << (v - 1))
        }
        young = {
            v for v, ts in dated.items()
            if now - ts <= max_age_days * day
        }
        undated = {v for v in model if v not in dated}
        want_keep = sorted({head} | set(tagged) | undated | young)
        rep = txn_expire_by_age(
            base, max_age_s=max_age_days * day, now=now
        )
        assert rep["kept_txns"] == want_keep
        assert rep["undated"] == sorted(undated)
        assert rep["aged_out"] == sorted(set(model) - set(want_keep))
        for v in want_keep:
            for t in _TABLES:
                got = sorted(
                    map(
                        tuple,
                        txn_read(spark, base, v, t, "m")
                        .select("m", "v")
                        .collect(),
                    )
                )
                want = sorted((p, model[v][t][p]) for p in _PARTS)
                assert got == want, (v, t, got, want)
        rep2 = txn_expire_by_age(
            base, max_age_s=max_age_days * day, now=now
        )
        assert rep2["kept_txns"] == want_keep
        assert rep2["removed_pointers"] == []
    finally:
        shutil.rmtree(root, ignore_errors=True)


@given(
    steps=_STEPS,
    restore_pick=st.integers(0, 1000),
    post_mask=st.integers(1, 3),
    post_parts=st.integers(1, 3),
    keep_mask=st.integers(0, 255),
)
@settings(**_SETTINGS)
def test_txn_restore_composes_with_commit_and_expiry(
    spark, steps, restore_pick, post_mask, post_parts, keep_mask
):
    """u44 under the dict model: after a random history, restore to a
    random earlier transaction, land ONE more random commit on top of
    the restored state (the chain-continues law — the partial commit
    must carry the RESTORED partition map, not the superseded head's),
    then expire a random keep set (head forced in).  Every retained
    transaction must read back exactly what the model says, including
    the restore (= the target's state) and the post-restore commit
    (= restored state + the update)."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        txn_commit,
        txn_expire,
        txn_read,
        txn_restore,
    )

    root = tempfile.mkdtemp(prefix="txn_restore_fuzz_")
    base = f"{root}/g"
    try:
        model: dict[int, dict[str, dict[str, int]]] = {}
        state = {t: {p: 0 for p in _PARTS} for t in _TABLES}
        txn_commit(
            base,
            1,
            {
                t: (
                    spark.createDataFrame(
                        [(p, 0) for p in _PARTS], "m string, v long"
                    ),
                    "m",
                    None,
                )
                for t in _TABLES
            },
        )
        model[1] = {t: dict(state[t]) for t in _TABLES}
        val = 0
        for i, (table_mask, pm_a, pm_b) in enumerate(steps):
            updates = {}
            for bit, (t, pm) in enumerate(zip(_TABLES, (pm_a, pm_b))):
                if not table_mask & (1 << bit):
                    continue
                parts = [
                    p for j, p in enumerate(_PARTS) if pm & (1 << j)
                ]
                val += 1
                for p in parts:
                    state[t][p] = val
                updates[t] = (
                    spark.createDataFrame(
                        [(p, val) for p in parts], "m string, v long"
                    ),
                    "m",
                    parts,
                )
            if not updates:
                continue
            txn_commit(base, 2 + i, updates)
            model[2 + i] = {t: dict(state[t]) for t in _TABLES}
        head = max(model)
        if head == 1:
            return  # nothing earlier to restore to
        target = sorted(model)[restore_pick % (len(model) - 1)]
        rep = txn_restore(base, target)
        restore_txn = rep["new_txn"]
        assert restore_txn == head + 1
        model[restore_txn] = {
            t: dict(model[target][t]) for t in _TABLES
        }
        state = {t: dict(model[target][t]) for t in _TABLES}
        # one more commit on top of the restored state
        updates = {}
        for bit, t in enumerate(_TABLES):
            if not post_mask & (1 << bit):
                continue
            parts = [
                p for j, p in enumerate(_PARTS) if post_parts & (1 << j)
            ]
            val += 1
            for p in parts:
                state[t][p] = val
            updates[t] = (
                spark.createDataFrame(
                    [(p, val) for p in parts], "m string, v long"
                ),
                "m",
                parts,
            )
        post_txn = restore_txn + 1
        txn_commit(base, post_txn, updates)
        model[post_txn] = {t: dict(state[t]) for t in _TABLES}
        head = post_txn
        keep = sorted(
            {head}
            | {v for v in model if keep_mask & (1 << ((v - 1) % 8))}
        )
        txn_expire(base, keep)
        for v in keep:
            for t in _TABLES:
                got = sorted(
                    map(
                        tuple,
                        txn_read(spark, base, v, t, "m")
                        .select("m", "v")
                        .collect(),
                    )
                )
                want = sorted((p, model[v][t][p]) for p in _PARTS)
                assert got == want, (v, t, got, want)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@given(
    steps=_STEPS,
    stamp_mask=st.integers(0, 63),
    max_age_days=st.integers(1, 40),
    wm_pick=st.integers(0, 1000),
)
@settings(**_SETTINGS)
def test_age_policy_vs_consumer_watermark_matches_model(
    spark, steps, stamp_mask, max_age_days, wm_pick
):
    """u47's race, fuzzed: an age-policy daemon fires between a
    consumer's wake-ups under a random history, random stamping, and a
    random horizon, with the consumer's watermark pinned at a random
    transaction.  Laws, against the dict model: undated transactions
    NEVER age out; after the policy runs, the consumer's span feed
    (watermark → head) either refuses with the TYPED retention error
    (exactly when the watermark aged out — the rebaseline trigger) or
    yields per-table changelogs equal to the model's state diff,
    cell-for-cell; and the policy re-run keeps the same set."""
    import pytest as _pytest

    from update_database_by_wind_spark.operators.update_pipeline import (
        RetentionExpiredError,
        txn_changes,
        txn_commit,
        txn_commit_at,
        txn_expire_by_age,
    )

    day = 86400.0
    root = tempfile.mkdtemp(prefix="txn_age_consumer_fuzz_")
    base = f"{root}/g"
    try:
        model: dict[int, dict[str, dict[str, int]]] = {}
        state = {t: {p: 0 for p in _PARTS} for t in _TABLES}

        def commit(v, updates):
            if stamp_mask & (1 << (v - 1)):
                txn_commit_at(
                    base, v, updates, committed_at=10 * (v - 1) * day
                )
            else:
                txn_commit(base, v, updates)

        commit(
            1,
            {
                t: (
                    spark.createDataFrame(
                        [(p, 0) for p in _PARTS], "m string, v long"
                    ),
                    "m",
                    None,
                )
                for t in _TABLES
            },
        )
        model[1] = {t: dict(state[t]) for t in _TABLES}
        val = 0
        for i, (table_mask, pm_a, pm_b) in enumerate(steps):
            updates = {}
            for bit, (t, pm) in enumerate(zip(_TABLES, (pm_a, pm_b))):
                if not table_mask & (1 << bit):
                    continue
                parts = [
                    p for j, p in enumerate(_PARTS) if pm & (1 << j)
                ]
                val += 1
                for p in parts:
                    state[t][p] = val
                updates[t] = (
                    spark.createDataFrame(
                        [(p, val) for p in parts], "m string, v long"
                    ),
                    "m",
                    parts,
                )
            if not updates:
                continue
            commit(2 + i, updates)
            model[2 + i] = {t: dict(state[t]) for t in _TABLES}
        head = max(model)
        wm = sorted(model)[wm_pick % len(model)]  # the consumer slept here
        now = 10 * head * day
        rep = txn_expire_by_age(
            base, max_age_s=max_age_days * day, now=now
        )
        kept = rep["kept_txns"]
        # law 1: the undated hold — a transaction the policy cannot
        # date is never aged out
        assert set(rep["undated"]) <= set(kept)
        for v in model:
            if not stamp_mask & (1 << (v - 1)):
                assert v in kept, (v, rep)
        # law 2: the consumer's span feed after the policy ran
        spec = {t: ("m", "m", ["v"]) for t in _TABLES}
        if wm not in kept:
            with _pytest.raises(RetentionExpiredError):
                txn_changes(spark, base, wm, head, spec)
        elif wm != head:
            feeds = txn_changes(spark, base, wm, head, spec)
            for t in _TABLES:
                got = sorted(
                    (r["m"], r["change_type"], r["v_before"], r["v_after"])
                    for r in feeds[t].collect()
                )
                want = sorted(
                    (p, "update", model[wm][t][p], model[head][t][p])
                    for p in _PARTS
                    if model[wm][t][p] != model[head][t][p]
                )
                assert got == want, (t, wm, head, got, want)
        # law 3: the policy converges on re-run
        rep2 = txn_expire_by_age(
            base, max_age_s=max_age_days * day, now=now
        )
        assert rep2["kept_txns"] == kept
        assert rep2["removed_pointers"] == []
    finally:
        shutil.rmtree(root, ignore_errors=True)


@given(
    steps=_STEPS,
    add_pick=st.integers(0, 1000),
    restore_pick=st.integers(0, 1000),
    keep_mask=st.integers(0, 255),
)
@settings(**_SETTINGS)
def test_restore_dropped_table_composes_with_feed_and_expiry(
    spark, steps, add_pick, restore_pick, keep_mask
):
    """The round-17 machinery fuzzed end-to-end: table b is ADDED
    mid-history at a random transaction, the group restores to a
    random earlier target, and a random keep set expires.  Laws,
    against the dict model: the restore reports dropped_tables exactly
    when the target predates b's ADD; a feed spanning the drop yields
    b's full txn_from snapshot as deletes; after expiry every retained
    transaction still reads every table ITS pointer carries per the
    model; and when no retained pointer references b, its directory is
    gone (swept this run or reported deferred and reclaimed by the
    orphan path on the re-run)."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        txn_changes,
        txn_commit,
        txn_expire,
        txn_read,
        txn_restore,
    )

    root = tempfile.mkdtemp(prefix="txn_drop_fuzz_")
    base = f"{root}/g"
    try:
        # model[txn] = {table: {part: val}}; b exists only from
        # add_txn onward
        model: dict[int, dict[str, dict[str, int]]] = {}
        a_state = {p: 0 for p in _PARTS}
        txn_commit(
            base, 1,
            {"a": (
                spark.createDataFrame(
                    [(p, 0) for p in _PARTS], "m string, v long"
                ), "m", None,
            )},
        )
        model[1] = {"a": dict(a_state)}
        val = 0
        n_steps = len(steps)
        add_at = 2 + (add_pick % n_steps)  # txn that ADDs b
        b_state: dict[str, int] = {}
        for i, (table_mask, pm_a, _pm_b) in enumerate(steps):
            txn = 2 + i
            updates = {}
            parts = [
                p for j, p in enumerate(_PARTS) if pm_a & (1 << j)
            ] or [_PARTS[0]]
            val += 1
            for p in parts:
                a_state[p] = val
            updates["a"] = (
                spark.createDataFrame(
                    [(p, val) for p in parts], "m string, v long"
                ), "m", parts,
            )
            if txn == add_at:
                val += 1
                b_state = {p: val for p in _PARTS}
                updates["b"] = (
                    spark.createDataFrame(
                        [(p, val) for p in _PARTS], "m string, v long"
                    ), "m", None,
                )
            elif txn > add_at and table_mask & 2:
                val += 1
                for p in parts:
                    b_state[p] = val
                updates["b"] = (
                    spark.createDataFrame(
                        [(p, val) for p in parts], "m string, v long"
                    ), "m", parts,
                )
            txn_commit(base, txn, updates)
            model[txn] = {"a": dict(a_state)}
            if txn >= add_at:
                model[txn]["b"] = dict(b_state)
        head = max(model)
        target = sorted(model)[restore_pick % (len(model) - 1)]
        rep = txn_restore(base, target)
        restore_txn = rep["new_txn"]
        drops_b = "b" not in model[target] and any(
            "b" in model[v] for v in model
        )
        assert rep["dropped_tables"] == (["b"] if drops_b else []), rep
        model[restore_txn] = {
            t: dict(vs) for t, vs in model[target].items()
        }
        if drops_b:
            # the feed across the drop: b's pre-restore snapshot as
            # deletes (head still carries b, the restore does not)
            feeds = txn_changes(
                spark, base, head, restore_txn,
                {"a": ("m", "m", ["v"]), "b": ("m", "m", ["v"])},
            )
            got = sorted(
                (r["m"], r["change_type"], r["v_before"], r["v_after"])
                for r in feeds["b"].collect()
            )
            want = sorted(
                (p, "delete", model[head]["b"][p], None) for p in _PARTS
            )
            assert got == want, (got, want)
        keep = sorted(
            {restore_txn}
            | {v for v in model if keep_mask & (1 << ((v - 1) % 8))}
        )
        rep_e = txn_expire(base, keep)
        for v in keep:
            for t, vs in model[v].items():
                got = sorted(
                    map(
                        tuple,
                        txn_read(spark, base, v, t, "m")
                        .select("m", "v")
                        .collect(),
                    )
                )
                want = sorted(vs.items())
                assert got == want, (v, t, got, want)
        b_retained = any("b" in model[v] for v in keep)
        bdir = os.path.join(base, "b")
        if any("b" in model[v] for v in model) and not b_retained:
            # the last b-referencing pointer expired: swept this run
            # (fresh fixtures may defer only when min_age_s > 0, which
            # this run does not pass), gone from disk
            assert rep_e["dropped_tables_swept"] == ["b"], rep_e
            assert not os.path.exists(bdir)
        elif b_retained:
            assert os.path.isdir(bdir)
        # convergence: the re-run removes nothing further
        rep2 = txn_expire(base, keep)
        assert rep2["removed_pointers"] == []
        assert rep2["orphans_reclaimed"] == []
        assert rep2["dropped_tables_swept"] == []
        assert rep2["head_rollbacks"] == []
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_crashed_expiry_residue_above_rolled_back_head_single_run(spark):
    """The round-17 advisor's medium repro, pinned deterministically:
    a PREVIOUS expiry crashed after removing a pointer (txn 3) but
    before the per-table pass, leaving table b's v2 manifest as
    unpointed residue BETWEEN the keep set's head root (v1, via txn 2)
    and an expired pointed head (v3, via txn 4).  The head-rollback
    loop used to skip unpointed manifests, so after it removed v3 the
    residue became the on-disk head and snapshot_expire's head guard
    aborted the run mid-way ('keep_versions [1] omits the head
    snapshot v2') with the pointers already gone.  The fix reclaims
    aged unpointed residue in the same rollback pass, so ONE run
    completes, the deferral receipt does not claim what the rollback
    handled, and the re-run is a no-op."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        txn_commit,
        txn_expire,
        txn_read,
        txn_restore,
    )

    root = tempfile.mkdtemp(prefix="txn_residue_rollback_")
    base = f"{root}/g"
    try:
        def df(val):
            return spark.createDataFrame(
                [(p, val) for p in _PARTS], "m string, v long"
            )

        txn_commit(base, 1, {"a": (df(0), "m", None)})
        txn_commit(
            base, 2, {"a": (df(1), "m", None), "b": (df(1), "m", None)}
        )
        txn_commit(
            base, 3, {"a": (df(2), "m", None), "b": (df(2), "m", None)}
        )
        txn_commit(
            base, 4, {"a": (df(3), "m", None), "b": (df(3), "m", None)}
        )
        rep_r = txn_restore(base, 1)  # txn 5: drops b
        assert rep_r["dropped_tables"] == ["b"], rep_r
        # the crash: a previous expiry died right after removing txn
        # 3's pointer — b's v2 manifest is now unpointed residue below
        # b's pointed head v3
        os.remove(os.path.join(base, "_txn_v3.json"))
        rep = txn_expire(base, [2, 5])  # used to raise mid-run here
        assert "b/v2" in rep["head_rollbacks"], rep
        assert "b/v3" in rep["head_rollbacks"], rep
        assert "b/v2" not in rep["residue_deferred"], rep
        for t in ("a", "b"):
            got = sorted(
                map(
                    tuple,
                    txn_read(spark, base, 2, t, "m")
                    .select("m", "v")
                    .collect(),
                )
            )
            assert got == sorted((p, 1) for p in _PARTS), (t, got)
        bdir = os.path.join(base, "b")
        on_disk = sorted(
            e for e in os.listdir(bdir) if e.startswith("_manifest_")
        )
        assert on_disk == ["_manifest_v1.json"], on_disk
        rep2 = txn_expire(base, [2, 5])
        assert rep2["removed_pointers"] == []
        assert rep2["orphans_reclaimed"] == []
        assert rep2["residue_deferred"] == []
        assert rep2["head_rollbacks"] == []
    finally:
        shutil.rmtree(root, ignore_errors=True)


@given(
    steps=_STEPS,
    add_pick=st.integers(0, 7),
    restore_pick=st.integers(0, 7),
    keep_mask=st.integers(1, 255),
    crash_mask=st.integers(1, 255),
)
@settings(**_SETTINGS)
def test_crashed_expiry_composes_with_restore_drop(
    spark, steps, add_pick, restore_pick, keep_mask, crash_mask
):
    """The round-17 advisor's kill point added to the matrix: the
    restore-drop fuzz above, with a PREVIOUS crashed expiry simulated
    by deleting a random subset of the expired pointers before the
    run (crash order: pointers first, per-table pass never reached —
    their manifests become unpointed residue at arbitrary depths).
    Laws: ONE txn_expire run completes (the head guard never wedges),
    every retained transaction reads the model state, the deferral
    receipt never claims a manifest the rollback reclaimed, and the
    re-run is a no-op."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        txn_commit,
        txn_expire,
        txn_read,
        txn_restore,
    )

    root = tempfile.mkdtemp(prefix="txn_crash_drop_fuzz_")
    base = f"{root}/g"
    try:
        model: dict[int, dict[str, dict[str, int]]] = {}
        a_state = {p: 0 for p in _PARTS}
        txn_commit(
            base, 1,
            {"a": (
                spark.createDataFrame(
                    [(p, 0) for p in _PARTS], "m string, v long"
                ), "m", None,
            )},
        )
        model[1] = {"a": dict(a_state)}
        val = 0
        n_steps = len(steps)
        add_at = 2 + (add_pick % n_steps)
        b_state: dict[str, int] = {}
        for i, (table_mask, pm_a, _pm_b) in enumerate(steps):
            txn = 2 + i
            updates = {}
            parts = [
                p for j, p in enumerate(_PARTS) if pm_a & (1 << j)
            ] or [_PARTS[0]]
            val += 1
            for p in parts:
                a_state[p] = val
            updates["a"] = (
                spark.createDataFrame(
                    [(p, val) for p in parts], "m string, v long"
                ), "m", parts,
            )
            if txn == add_at:
                val += 1
                b_state = {p: val for p in _PARTS}
                updates["b"] = (
                    spark.createDataFrame(
                        [(p, val) for p in _PARTS], "m string, v long"
                    ), "m", None,
                )
            elif txn > add_at and table_mask & 2:
                val += 1
                for p in parts:
                    b_state[p] = val
                updates["b"] = (
                    spark.createDataFrame(
                        [(p, val) for p in parts], "m string, v long"
                    ), "m", parts,
                )
            txn_commit(base, txn, updates)
            model[txn] = {"a": dict(a_state)}
            if txn >= add_at:
                model[txn]["b"] = dict(b_state)
        head = max(model)
        target = sorted(model)[restore_pick % (len(model) - 1)]
        restore_txn = txn_restore(base, target)["new_txn"]
        model[restore_txn] = {
            t: dict(vs) for t, vs in model[target].items()
        }
        keep = sorted(
            {restore_txn}
            | {v for v in model if keep_mask & (1 << ((v - 1) % 8))}
        )
        expired = sorted(set(model) - set(keep))
        crashed = [
            v for j, v in enumerate(expired) if crash_mask & (1 << (j % 8))
        ]
        for v in crashed:
            os.remove(os.path.join(base, f"_txn_v{v}.json"))
        rep = txn_expire(base, keep)  # must complete in one run
        assert not (
            set(rep["residue_deferred"]) & set(rep["head_rollbacks"])
        ), rep
        for v in keep:
            for t, vs in model[v].items():
                got = sorted(
                    map(
                        tuple,
                        txn_read(spark, base, v, t, "m")
                        .select("m", "v")
                        .collect(),
                    )
                )
                assert got == sorted(vs.items()), (v, t, got)
        rep2 = txn_expire(base, keep)
        assert rep2["removed_pointers"] == []
        assert rep2["orphans_reclaimed"] == []
        assert rep2["residue_deferred"] == []
        assert rep2["head_rollbacks"] == []
    finally:
        shutil.rmtree(root, ignore_errors=True)


@given(
    steps=_STEPS,
    keep_mask=st.integers(1, 255),
    frag_mask=st.integers(0, 255),
)
@settings(**_SETTINGS)
def test_guarded_maintenance_races_retention(
    spark, steps, keep_mask, frag_mask
):
    """The round-17 verdict's ask #4, fuzzed: a MAINTENANCE actor
    (txn_optimize_plan + txn_optimize_run_guarded) joins the dict
    model's actors.  A work order is planned against the full history
    head, a random keep set expires AFTER the plan, and the stale
    order then executes.  Laws: the guarded
    run never raises; its receipt partitions the plan exactly
    (rewritten ∪ skipped = every planned entry, nothing else); a
    skipped entry's version dir was genuinely unrouted at run time;
    and every RETAINED transaction still reads the model state after
    the interleaving — maintenance under racing retention never tears
    a read."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        snapshot_commit_stats,
        txn_commit,
        txn_expire,
        txn_optimize_plan,
        txn_optimize_run_guarded,
        txn_read,
    )

    root = tempfile.mkdtemp(prefix="txn_maint_race_fuzz_")
    base = f"{root}/g"
    conf_key = "spark.sql.files.maxRecordsPerFile"
    prev_conf = spark.conf.get(conf_key, "0")
    try:
        model: dict[int, dict[str, int]] = {}
        state = {p: 0 for p in _PARTS}
        val = 0
        spec = {"a": ("m", None)}
        tv = 0
        for i, (table_mask, pm_a, _pm_b) in enumerate(steps):
            txn = 1 + i
            parts = (
                [p for j, p in enumerate(_PARTS) if pm_a & (1 << j)]
                or [_PARTS[0]]
            )
            if txn == 1:
                parts = list(_PARTS)
            val += 1
            for p in parts:
                state[p] = val
            # a fragmented commit (several files per partition) when
            # the step's frag bit is set, so plans have real targets
            frag = bool(frag_mask & (1 << (i % 8)))
            rows = [
                (p, state[p] * 10 + j)
                for p in parts
                for j in range(6 if frag else 1)
            ]
            spark.conf.set(conf_key, "1" if frag else "0")
            try:
                txn_commit(
                    base, txn,
                    {"a": (
                        spark.createDataFrame(rows, "m string, v long"),
                        "m", None if txn == 1 else parts,
                    )},
                )
            finally:
                spark.conf.set(conf_key, prev_conf)
            tv += 1
            snapshot_commit_stats(
                spark, os.path.join(base, "a"), tv, ["v"]
            )
            model[txn] = dict(state)

        def reads_match(keep) -> None:
            for v in keep:
                got = sorted(
                    {
                        (r["m"], r["v"] // 10)
                        for r in txn_read(spark, base, v, "a", "m")
                        .collect()
                    }
                )
                want = sorted(set(model[v].items()))
                assert got == want, (v, got, want)

        head = max(model)
        plan = txn_optimize_plan(spark, base, spec, max_files=4)
        keep = sorted(
            {head} | {v for v in model if keep_mask & (1 << ((v - 1) % 8))}
        )
        txn_expire(base, keep)
        rep = txn_optimize_run_guarded(
            spark, base, spec, plan, max_files=4
        )
        planned = {
            f"a/v{ver}" for ver in plan.get("a", {})
        }
        got = set(rep["rewritten"]) | set(rep["skipped"])
        assert got == planned, (got, planned)
        assert rep["validated"] == len(planned)
        # a skipped-expired entry is genuinely unrouted by any
        # retained pointer's manifest
        import json as _json
        import re as _re

        routed: set = set()
        for entry in os.listdir(base):
            if not _re.fullmatch(r"_txn_v(\d+)\.json", entry):
                continue
            with open(os.path.join(base, entry)) as fh:
                mv = _json.load(fh)["a"]
            with open(
                os.path.join(base, "a", f"_manifest_v{mv}.json")
            ) as fh:
                routed |= {int(x) for x in _json.load(fh).values()}
        for key, why in rep["skipped"].items():
            ver = int(key.rsplit("v", 1)[1])
            if why == "expired":
                assert ver not in routed, (key, sorted(routed))
        reads_match(keep)
        # convergence: a fresh plan executes clean and re-plans empty
        plan2 = txn_optimize_plan(spark, base, spec, max_files=4)
        rep2 = txn_optimize_run_guarded(
            spark, base, spec, plan2, max_files=4
        )
        assert not rep2["skipped"], rep2
        assert not txn_optimize_plan(spark, base, spec, max_files=4)
        reads_match(keep)
    finally:
        spark.conf.set(conf_key, prev_conf)
        shutil.rmtree(root, ignore_errors=True)
