"""Structural/model tests for the round-11 continuation operators
(u26 vacuum, g4 BFS, l3m containment, mm_feature_extract, e4
transition matrix, st18 streaming CMS) — the sibling-parity receipts
beyond each one's oracle match: pure-Python models for the iterative
and kernel paths, law checks for the metric definitions, and the
refusal/edge cases that only show up off the fixture's happy path.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F


# --- g4: bfs_hops vs a dict-based BFS model --------------------------------


def _model_bfs(edges: list[tuple[int, int]], source: int) -> dict[int, int]:
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    dist = {source: 0}
    frontier = [source]
    d = 0
    while frontier:
        d += 1
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = d
                    nxt.append(v)
        frontier = nxt
    return dist


def _spark_bfs(spark, edges: list[tuple[int, int]], source: int, **kw):
    from update_database_by_wind_spark.operators.graph import bfs_hops

    df = spark.createDataFrame(edges, "u long, v long")
    return {
        r.id: r.dist for r in bfs_hops(df, source, **kw).collect()
    }


def test_bfs_matches_model_on_branchy_graph(spark):
    # two lobes joined by a bridge + an unreachable triangle
    edges = [
        (1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4),
        (6, 7), (7, 8),
        (100, 101), (101, 102), (102, 100),
    ]
    got = _spark_bfs(spark, edges, 1)
    want = _model_bfs(edges, 1)
    assert got == want
    assert 100 not in got  # unreachable component absent, not dist=None


def test_bfs_chain_needs_length_rounds_and_raises_past_cap(spark):
    chain = [(i, i + 1) for i in range(1, 8)]  # path 1..8, diameter 7
    assert _spark_bfs(spark, chain, 1) == {i: i - 1 for i in range(1, 9)}
    with pytest.raises(RuntimeError, match="frontier still growing"):
        _spark_bfs(spark, chain, 1, max_rounds=3)


def test_bfs_single_vertex_component(spark):
    # source with no edges of its own in the symmetric closure still
    # terminates round 1 with just itself
    got = _spark_bfs(spark, [(5, 5)], 5)
    assert got == {5: 0}


# --- l3m: containment laws on a constructed subset duplicate ----------------


def test_containment_flags_subset_that_jaccard_misses(spark):
    from update_database_by_wind_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    words = [f"w{i}" for i in range(40)]
    short = " ".join(words[:8])           # 6 trigrams, all inside long
    long = " ".join(words)                # 38 trigrams
    other = " ".join(f"x{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, short), (2, long), (3, other)], "doc_id long, text string"
    )
    raw = ngram_jaccard_pairs(docs, raw=True).collect()
    assert len(raw) == 1
    r = raw[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    na, nb, shared = r.na, r.nb, r.n_shared
    assert (na, nb, shared) == (6, 38, 6)
    containment = shared / min(na, nb)
    jaccard = shared / (na + nb - shared)
    assert containment == 1.0  # fully embedded
    assert jaccard < 0.2  # below l3e's near-dup bar — invisible to it
    # the l3m filter (exact integer form) keeps it
    assert shared * 10 >= 6 * min(na, nb)


def test_containment_never_below_jaccard(spark, sf_smoke):
    # C = s/min >= J = s/(na+nb-s) because min <= union, for every pair
    from update_database_by_wind_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    from update_database_by_wind_spark.sources import load

    docs = load(spark, sf_smoke, "documents")
    bad = (
        ngram_jaccard_pairs(docs, raw=True)
        .filter(
            F.expr("n_shared * 1000000 DIV least(na, nb)")
            < F.expr("n_shared * 1000000 DIV (na + nb - n_shared)")
        )
        .count()
    )
    assert bad == 0


# --- mm_feature_extract: kernel vs a scalar recompute ------------------------


def test_feature_kernel_matches_scalar_recompute():
    import hashlib

    from update_database_by_wind_spark.operators.multimodal import (
        _MM_FEAT_BINS,
        _feature_batches,
    )

    texts = ["hello world", "", "aaaa", "éé çà é"]  # incl. multibyte
    pdf = pd.DataFrame(
        {
            "doc_id": pd.array(range(len(texts)), "int64"),
            "payload": [t.encode("utf-8") for t in texts],
        }
    )
    (out,) = list(_feature_batches(iter([pdf])))
    for i, t in enumerate(texts):
        codes = [ord(c) % _MM_FEAT_BINS for c in t]
        hist = [codes.count(b) for b in range(_MM_FEAT_BINS)]
        row = out[out["doc_id"] == i].iloc[0]
        assert row["n_samples"] == len(t.replace("", ""))  # code points
        assert row["n_samples"] == len(t)
        sig = hashlib.md5(
            ":".join(str(c) for c in hist).encode()
        ).hexdigest()
        assert row["hist_sig"] == sig
        assert row["top_count"] == max(hist)
        assert row["top_bin"] == hist.index(max(hist))  # first-max tie rule
        assert row["nonzero_bins"] == sum(1 for c in hist if c > 0)


# --- e4: transition matrix vs a dict model + stochastic-row law --------------


def test_transition_matrix_matches_model(spark, tmp_path):
    import shutil

    rows = [
        # (event_id, ts, user_id, event_type) — user 1 has a ts tie
        (1, "2024-01-01 00:00:00", 1, "a"),
        (2, "2024-01-01 00:00:01", 1, "b"),
        (3, "2024-01-01 00:00:01", 1, "c"),  # tie with event 2 -> id order
        (4, "2024-01-01 00:00:00", 2, "a"),
        (5, "2024-01-01 00:00:02", 2, "a"),
        (6, "2024-01-01 00:00:03", 2, "b"),
        (7, "2024-01-01 00:00:00", 3, "c"),  # single event: no transition
    ]
    from datetime import datetime

    ev = spark.createDataFrame(
        [
            (i, datetime.fromisoformat(ts), u, t, 0.0, "{}")
            for i, ts, u, t in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    sf = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    ev.write.parquet(f"{sf}/events.parquet")
    try:
        from update_database_by_wind_spark.operators.analytics_extra import (
            e4_transition_matrix,
        )

        got = {
            (r.from_type, r.to_type): (r.n_trans, r.from_total, r.p_micro)
            for r in e4_transition_matrix(spark, sf).collect()
        }
        # model: user1 a->b->c, user2 a->a->b
        want_counts = {("a", "b"): 2, ("b", "c"): 1, ("a", "a"): 1}
        tot = {"a": 3, "b": 1}
        want = {
            k: (n, tot[k[0]], n * 1_000_000 // tot[k[0]])
            for k, n in want_counts.items()
        }
        assert got == want
    finally:
        shutil.rmtree(sf, ignore_errors=True)


def test_transition_rows_sum_to_from_total(spark, sf_smoke):
    from update_database_by_wind_spark.operators.analytics_extra import (
        e4_transition_matrix,
    )

    out = e4_transition_matrix(spark, sf_smoke)
    bad = (
        out.groupBy("from_type", "from_total")
        .agg(F.sum("n_trans").alias("s"))
        .filter(F.col("s") != F.col("from_total"))
        .count()
    )
    assert bad == 0


# --- u26: the vacuum receipts that need a non-fixture layout ----------------


def test_vacuum_retains_partially_shared_old_dir(spark, tmp_path):
    """u26's in-query receipt covers the fixture layout (v3 rewrites
    all of v2); this covers the OTHER sharing case — v3 rewrites only
    part of v2's months, so BOTH v1 and v2 directories must survive an
    expire-to-head."""
    import os

    from update_database_by_wind_spark.operators.update_pipeline import (
        snapshot_commit,
        snapshot_expire,
        snapshot_read,
    )

    base = str(tmp_path / "ledger")
    df = spark.createDataFrame(
        [("m1", 1, 10), ("m2", 2, 20), ("m3", 3, 30)],
        "p string, k long, c long",
    )
    snapshot_commit(df, base, 1, "p")
    snapshot_commit(df.filter("p >= 'm2'"), base, 2, "p", parts=["m2", "m3"])
    snapshot_commit(df.filter("p = 'm3'"), base, 3, "p", parts=["m3"])
    receipt = snapshot_expire(base, keep_versions=[3])
    assert receipt["removed_dirs"] == []  # v1 owns m1, v2 owns m2 — shared
    assert receipt["removed_manifests"] == [
        "_manifest_v1.json",
        "_manifest_v2.json",
    ]
    assert os.path.isdir(os.path.join(base, "v1"))
    assert os.path.isdir(os.path.join(base, "v2"))
    assert snapshot_read(spark, base, 3, "p").count() == 3


# --- st18: the portable CMS bucket hash is not a low-bits no-op --------------


def test_st18_bucket_rows_are_independent(spark):
    """Consecutive keys must land in genuinely different buckets per
    row (the round-6 low-bits lesson): with the middle mod-P
    reduction, the three rows disagree on bucket assignment for most
    keys; without it they'd be bijections of k's low 6 bits and
    collapse into one row."""
    from update_database_by_wind_spark.streaming.pipelines import (
        _STC_W,
        _stc_bucket_sql,
    )

    df = spark.range(0, 4096).select(
        *[
            F.expr(_stc_bucket_sql(j, "id")).alias(f"b{j}")
            for j in range(3)
        ]
    )
    agree = df.filter(
        (F.col("b0") == F.col("b1")) & (F.col("b1") == F.col("b2"))
    ).count()
    # independent rows agree on all three with P ~ 1/W^2
    assert agree < 4096 * 3 / (_STC_W * _STC_W) + 10
    # and each row covers the full bucket range
    for j in range(3):
        assert df.select(f"b{j}").distinct().count() == _STC_W


# --- u27: the age guard the in-query receipt never exercises ----------------


def test_orphan_gc_age_guard_skips_young_dirs(spark, tmp_path):
    import os

    from update_database_by_wind_spark.operators.update_pipeline import (
        orphan_gc,
        snapshot_commit,
    )

    base = str(tmp_path / "ledger")
    df = spark.createDataFrame([("m1", 1, 10)], "p string, k long, c long")
    snapshot_commit(df, base, 1, "p")
    os.makedirs(os.path.join(base, "_tmp_v2"))  # "in-flight" staging dir
    # with a generous age threshold the young orphan is skipped...
    assert orphan_gc(base, min_age_s=3600)["removed"] == []
    assert os.path.isdir(os.path.join(base, "_tmp_v2"))
    # ...and with none it is reclaimed; the live commit is untouched
    assert orphan_gc(base)["removed"] == ["_tmp_v2"]
    assert os.path.isdir(os.path.join(base, "v1"))


# --- u28: ref-layer refusals the in-query receipts don't cover ---------------


def test_snapshot_tag_refusals_and_roots(spark, tmp_path):
    import pytest as _pytest

    from update_database_by_wind_spark.operators.update_pipeline import (
        expire_untagged,
        snapshot_commit,
        snapshot_read_tag,
        snapshot_tag,
        snapshot_tags,
    )

    base = str(tmp_path / "ledger")
    df = spark.createDataFrame(
        [("m1", 1, 10), ("m2", 2, 20)], "p string, k long, c long"
    )
    snapshot_commit(df, base, 1, "p")
    snapshot_commit(df.filter("p = 'm2'"), base, 2, "p", parts=["m2"])
    with _pytest.raises(ValueError, match="unsafe ref name"):
        snapshot_tag(base, "../escape", 1)
    with _pytest.raises(ValueError, match="no manifest"):
        snapshot_tag(base, "ghost", 9)
    with _pytest.raises(ValueError, match="no ref named"):
        snapshot_read_tag(spark, base, "nope", "p")
    snapshot_tag(base, "keep-me", 1)
    assert snapshot_tags(base) == {"keep-me": 1}
    # head is v2, tag roots v1 -> nothing expirable
    receipt = expire_untagged(base)
    assert receipt["kept_versions"] == [1, 2]
    assert receipt["removed_manifests"] == []
    assert snapshot_read_tag(spark, base, "keep-me", "p").count() == 2


# --- u29: the OCC paths the in-query receipts don't cover --------------------


def test_occ_commit_fast_path_and_empty_store(spark, tmp_path):
    import os

    import pytest as _pytest

    from update_database_by_wind_spark.operators.update_pipeline import (
        occ_commit,
        snapshot_commit,
        snapshot_read,
    )

    base = str(tmp_path / "ledger")
    with _pytest.raises(ValueError, match="no committed snapshot"):
        os.makedirs(base)
        occ_commit(
            spark.createDataFrame([("m1", 1, 10)], "p string, k long, c long"),
            base, 0, "p", parts=["m1"],
        )
    df = spark.createDataFrame(
        [("m1", 1, 10), ("m2", 2, 20)], "p string, k long, c long"
    )
    snapshot_commit(df, base, 1, "p")
    # head == expected base: fast path, no rebase
    r = occ_commit(
        df.filter("p = 'm2'").withColumn("c", F.col("c") + 1),
        base, 1, "p", parts=["m2"],
    )
    assert r == {"version": 2, "rebased": False}
    got = {
        (x.p, x.k): x.c for x in snapshot_read(spark, base, 2, "p").collect()
    }
    assert got == {("m1", 1): 10, ("m2", 2): 21}
    # a NEW partition never conflicts, even across a concurrent commit
    r2 = occ_commit(
        spark.createDataFrame([("m3", 3, 30)], "p string, k long, c long"),
        base, 1, "p", parts=["m3"],
    )
    assert r2 == {"version": 3, "rebased": True}
    assert snapshot_read(spark, base, 3, "p").count() == 3
