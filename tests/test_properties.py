"""Property-based invariants (SURVEY.md §5.4) via hypothesis.

Spark round trips are expensive, so examples are few but adversarial
(hypothesis shrinks failures); each property is an algebraic law the
operators must satisfy on ANY input, not just the fixtures.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from pyspark.sql import Window
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (key, value) rows with deliberate key collisions
_ROWS = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 3), st.floats(0, 100, width=32)),
    min_size=0,
    max_size=30,
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(int(k), int(b), float(v)) for k, b, v in rows],
        "pk long, batch long, val double",
    )


@given(rows=_ROWS)
@settings(**_SETTINGS)
def test_dedup_idempotent(spark, rows):
    """L1 law: dedup(dedup(x)) == dedup(x)."""
    df = _df(spark, rows)
    once = df.dropDuplicates(["pk"])
    twice = once.dropDuplicates(["pk"])
    assert once.count() == twice.count()
    assert once.select("pk").distinct().count() == once.count()


@given(rows=_ROWS, extra=_ROWS)
@settings(**_SETTINGS)
def test_semi_plus_anti_partition_left_side(spark, rows, extra):
    """J3/J4 law: semi(L,R) ⊎ anti(L,R) == L (a partition of L)."""
    left, right = _df(spark, rows), _df(spark, extra)
    semi = left.join(right, "pk", "left_semi")
    anti = left.join(right, "pk", "left_anti")
    assert semi.count() + anti.count() == left.count()
    assert semi.join(anti, "pk", "inner").count() == 0


@given(rows=_ROWS, extra=_ROWS)
@settings(**_SETTINGS)
def test_upsert_merge_laws(spark, rows, extra):
    """U2 laws: keys(merge) = keys(target) ∪ keys(source); source rows
    win; merging the same source twice equals merging it once."""
    target = _df(spark, rows).dropDuplicates(["pk"])
    source = _df(spark, extra).dropDuplicates(["pk"])

    def merge(t, s):
        return t.join(s, "pk", "left_anti").unionByName(s)

    merged = merge(target, source)
    n_keys = target.select("pk").union(source.select("pk")).distinct().count()
    assert merged.count() == n_keys
    # source wins: every source row appears unchanged
    src = {(r["pk"], r["val"]) for r in source.collect()}
    out = {(r["pk"], r["val"]) for r in merged.collect()}
    assert src <= out
    # idempotence
    again = merge(merged, source)
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, merged.collect()))


_EVENTS = st.lists(
    st.tuples(
        st.integers(0, 3),  # key
        st.integers(0, 50),  # ts
        st.booleans(),  # is_probe
        st.floats(1, 9, width=16),
    ),
    min_size=1,
    max_size=25,
)


@given(events=_EVENTS)
@settings(**_SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, events):
    """J8 law: the union+window as-of rewrite equals pd.merge_asof
    (backward, exact-match allowed) on arbitrary inputs, including
    ties and keys with no builds."""
    builds = [(k, t, float(v)) for k, t, p, v in events if not p]
    probes = [(k, t, i) for i, (k, t, p, _) in enumerate(events) if p]
    # pre-aggregate builds: one deterministic value per (key, ts)
    bmap: dict = {}
    for k, t, v in builds:
        bmap[(k, t)] = max(v, bmap.get((k, t), float("-inf")))

    # --- Spark union+window rewrite (mirrors joins.py J8) ---
    b_df = spark.createDataFrame(
        [(k, t, v, 0, None) for (k, t), v in bmap.items()],
        "k long, t long, bval double, side int, probe_id int",
    )
    p_df = spark.createDataFrame(
        [(k, t, None, 1, i) for k, t, i in probes],
        "k long, t long, bval double, side int, probe_id int",
    )
    w = (
        Window.partitionBy("k")
        .orderBy("t", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    got_rows = (
        b_df.unionByName(p_df)
        .withColumn("asof_val", F.last("bval", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select("probe_id", "asof_val")
        .collect()
    )
    got = {r["probe_id"]: r["asof_val"] for r in got_rows}

    # --- pandas reference ---
    if probes:
        pp = pd.DataFrame(probes, columns=["k", "t", "probe_id"]).sort_values(
            ["t", "probe_id"], kind="mergesort"
        )
        if bmap:
            bb = pd.DataFrame(
                [(k, t, v) for (k, t), v in bmap.items()],
                columns=["k", "t", "bval"],
            ).sort_values(["t", "k"], kind="mergesort")
            ref = pd.merge_asof(pp, bb, on="t", by="k", direction="backward")
        else:
            ref = pp.assign(bval=float("nan"))
        want = {
            int(r.probe_id): (None if pd.isna(r.bval) else float(r.bval))
            for r in ref.itertuples()
        }
    else:
        want = {}
    assert got == want


@given(
    vals=st.lists(st.floats(-1e6, 1e6, width=32), min_size=1, max_size=40),
    n_parts=st.integers(1, 8),
)
@settings(**_SETTINGS)
def test_dec_sum_partition_invariant(spark, vals, n_parts):
    """numeric.dec_sum law: the result is identical under ANY
    partitioning (the property plain SUM(double) lacks)."""
    from update_database_by_wind_spark.functions.numeric import dec_sum

    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    a = df.repartition(1).agg(dec_sum("x", "s")).first()["s"]
    b = df.repartition(n_parts).agg(dec_sum("x", "s")).first()["s"]
    assert a == b


@given(
    ids=st.lists(st.integers(0, 10_000), min_size=1, max_size=40),
    n_parts=st.integers(1, 8),
)
@settings(**_SETTINGS)
def test_hash_split_partitions_input_deterministically(spark, ids, n_parts):
    """tr_hash_split law: the multiplicative-hash split assigns every
    row to exactly one split, and the assignment is a pure function of
    the key — identical under any partitioning (the property
    randomSplit lacks)."""
    from update_database_by_wind_spark.operators.training import _bucket_col

    df = spark.createDataFrame([(int(i),) for i in ids], "doc_id long")
    bucket = _bucket_col()
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )

    def assign(frame):
        return {
            (r["doc_id"], r["s"])
            for r in frame.select("doc_id", split.alias("s")).distinct().collect()
        }

    a = assign(df.repartition(1))
    b = assign(df.repartition(n_parts))
    assert a == b
    # one split per distinct key: mapping is a function
    assert len({k for k, _ in a}) == len(a)


@given(rows=_ROWS, extra=_ROWS, salts=st.integers(1, 5))
@settings(**_SETTINGS)
def test_salted_join_equals_plain_join(spark, rows, extra, salts):
    """J10 law: salting preserves join semantics exactly — the salted
    fact⋈dim equals the unsalted join on arbitrary inputs, any salt
    fan-out."""
    fact = _df(spark, rows)  # pk, batch, val
    dim = _df(spark, extra).dropDuplicates(["pk"]).select("pk", "batch")
    plain = fact.join(dim.withColumnRenamed("batch", "dbatch"), "pk")

    salted_fact = fact.withColumn(
        "salt", (F.col("batch") % salts).cast("int")
    )
    salted_dim = (
        dim.withColumnRenamed("batch", "dbatch")
        .withColumn(
            "salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
        )
    )
    salted = salted_fact.join(salted_dim, ["pk", "salt"]).drop("salt")
    key = ["pk", "batch", "val", "dbatch"]
    assert sorted(map(tuple, plain.select(*key).collect())) == sorted(
        map(tuple, salted.select(*key).collect())
    )


def test_ewma_matches_pandas_reference(spark, sf_smoke):
    """ts_ewma (applyInPandas recurrence) must equal a single-process
    pandas recompute of the same per-user daily series — the
    distributed grouping cannot change the smoother's values."""
    from update_database_by_wind_spark.operators.analytics_extra import ts_ewma
    from update_database_by_wind_spark.sources import load

    got = (
        ts_ewma(spark, sf_smoke)
        .toPandas()
        .sort_values(["user_id", "day"])
        .reset_index(drop=True)
    )
    daily = (
        load(spark, sf_smoke, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("day_value")
        )
        .toPandas()
        .sort_values(["user_id", "day"])
        .reset_index(drop=True)
    )
    expected = daily.assign(
        ewma=daily.groupby("user_id")["day_value"].transform(
            lambda s: s.ewm(alpha=0.3, adjust=False).mean()
        )
    )
    # ts_ewma rounds to 6 decimals JVM-side (oracle parity), so compare
    # against the unrounded pandas reference within that granularity
    pd.testing.assert_frame_equal(
        got[["user_id", "day", "ewma"]],
        expected[["user_id", "day", "ewma"]],
        check_exact=False,
        rtol=0,
        atol=1e-6,
    )


def test_skewed_events_join_partial_salting_preserves_results(spark):
    """The bench skew receipt (joins.skewed_events_join) must return
    identical aggregates salted and unsalted — partial salting (only
    the hot key salted, only hot dim rows replicated) is a pure
    physical rewrite.  Run at sf0.001 with a salt count that does NOT
    divide the event count evenly, so uneven salt buckets are
    exercised too."""
    from update_database_by_wind_spark.operators.joins import (
        skewed_events_join,
    )

    sf_dir = "/root/testdata/sf0.001"
    plain = sorted(
        map(tuple, skewed_events_join(spark, sf_dir).collect())
    )
    salted = sorted(
        map(tuple, skewed_events_join(spark, sf_dir, salts=7).collect())
    )
    assert plain == salted
    assert plain, "receipt join must produce rows"


@given(
    parts=st.lists(
        st.tuples(
            st.sampled_from([None, "a", "b:c", "d%3A", "sp ace", "1993-07"]),
            st.integers(1, 4),  # rows in this partition
        ),
        min_size=1,
        max_size=5,
        unique_by=lambda t: t[0],
    ),
    del_mod=st.integers(1, 5),
)
# r6's falsifying example, pinned: an all-NULL-partition target reads
# back with the partition column inferred as VOID, which the survivor
# rewrite's partitionBy used to reject (fixed by the cast-to-string in
# cow_delete).
@example(parts=[(None, 2)], del_mod=2)
@settings(**_SETTINGS)
def test_cow_delete_equals_logical_delete(spark, tmp_path_factory, parts, del_mod):
    """U14 law: whatever the partition values (NULL, percent-escaped,
    already-percent-looking, spaced) and whatever mix of full / partial
    / zero deletion the predicate induces per partition, the physical
    COW delete's read-back equals the logical filter(~predicate)."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        cow_delete,
    )

    target_path = str(tmp_path_factory.mktemp("cowdel") / "t")
    rows, pk = [], 0
    for val, n in parts:
        for _ in range(n):
            rows.append((pk, val))
            pk += 1
    df = spark.createDataFrame(rows, "pk long, part string")
    df.repartition(F.col("part")).write.partitionBy("part").parquet(
        target_path
    )
    predicate = F.col("pk") % del_mod == 0
    cow_delete(spark, target_path, predicate, "part")
    expected = sorted(
        (p, v) for p, v in rows if p % del_mod != 0
    )
    # deleting EVERY row leaves a legal empty table, but plain parquet
    # can no longer infer its schema (no files survive) — the reader
    # must supply one, exactly as a catalog/Delta table would via
    # metadata; with any survivor the inferred read works as before
    back = (
        spark.read.schema("pk long, part string").parquet(target_path)
        if not expected
        else spark.read.parquet(target_path)
    )
    got = sorted((r.pk, r.part) for r in back.collect())
    assert got == expected


def test_cow_delete_null_predicate_rows_are_retained(spark, tmp_path):
    """SQL DELETE semantics: rows where the predicate evaluates to
    NULL are RETAINED.  The census counts them as kept and the
    survivor rewrite must agree — before the coalesce fix, the rewrite
    leg's bare ~predicate silently dropped them from rewritten
    partitions (the advisor's round-6 finding)."""
    from update_database_by_wind_spark.operators.update_pipeline import (
        cow_delete,
    )

    target_path = str(tmp_path / "t")
    # part "a": one TRUE-delete row, one NULL-predicate row, one FALSE
    # row → partial rewrite; part "b": untouched.
    rows = [(0, 10.0, "a"), (1, None, "a"), (2, 1.0, "a"), (3, None, "b")]
    df = spark.createDataFrame(rows, "pk long, val double, part string")
    df.repartition(F.col("part")).write.partitionBy("part").parquet(
        target_path
    )
    stats = cow_delete(spark, target_path, F.col("val") > 5.0, "part")
    assert stats == {"dropped": [], "rewritten": ["a"]}
    back = sorted(r.pk for r in spark.read.parquet(target_path).collect())
    assert back == [1, 2, 3]


@given(
    data=st.lists(
        # values drawn from a small domain with a repetition knob so
        # genuine heavy hitters appear; hypothesis shrinks toward the
        # adversarial corner (everything one value / everything unique)
        st.integers(0, 12),
        min_size=1,
        max_size=400,
    ),
    n_parts=st.integers(1, 4),
    batch=st.integers(1, 7),
    c=st.integers(2, 8),
)
@settings(max_examples=60, deadline=None)
def test_misra_gries_candidates_superset_of_heavy_hitters(
    data, n_parts, batch, c
):
    """A15 law (pure-pandas, no Spark): for ANY partitioning and ANY
    Arrow-batch slicing, the union of per-partition bounded MG
    summaries contains every item with global frequency > n/K for
    every K ≤ c (per-partition undercount ≤ n_p/(c+1) + pigeonhole
    across partitions)."""
    import pandas as pd

    from update_database_by_wind_spark.operators.aggregates import (
        _mg_update,
    )

    parts = [data[i::n_parts] for i in range(n_parts)]
    candidates = set()
    for part in parts:
        mg = None
        for i in range(0, len(part), batch):
            chunk = pd.Series(part[i : i + batch])
            mg = _mg_update(mg, chunk.value_counts(), c)
        if mg is not None:
            candidates |= set(mg.index)
    n = len(data)
    freq = pd.Series(data).value_counts()
    heavy = set(freq[freq * c > n].index)
    assert heavy <= candidates, (heavy - candidates, n_parts, batch, c)


# --- round-7 operator laws -----------------------------------------------------

_IVM_OPS = st.lists(
    st.tuples(
        st.sampled_from(["ins", "del", "upd"]),
        st.integers(0, 9),   # pk (collisions on purpose)
        st.integers(0, 3),   # group key
        st.integers(-50, 50),  # value (exact integers)
    ),
    min_size=0,
    max_size=12,
)


@given(rows=_ROWS, ops=_IVM_OPS)
@settings(**_SETTINGS)
def test_ivm_merge_equals_recompute(spark, rows, ops):
    """U16 law: maintaining a grouped (count, sum) view through ANY
    signed delta batch (inserts of new keys, deletes and updates of
    existing ones — updates as the -old/+new pair) equals recomputing
    the view from the final table.  Groups whose multiplicity reaches
    zero must vanish."""
    base = {}  # pk -> (group, val)
    for pk, grp, val in ((int(k), int(b), int(v)) for k, b, v in rows):
        base[pk] = (grp, val)  # keep-last on duplicate pk

    final = dict(base)
    deltas = []  # (group, sign, val)
    for op, pk, grp, val in ops:
        if op == "ins" and pk not in final:
            final[pk] = (grp, val)
            deltas.append((grp, 1, val))
        elif op == "del" and pk in final:
            g, v = final.pop(pk)
            deltas.append((g, -1, v))
        elif op == "upd" and pk in final:
            g, v = final[pk]
            final[pk] = (g, val)
            deltas.append((g, -1, v))
            deltas.append((g, 1, val))

    v0_df = spark.createDataFrame(
        [(g, v) for g, v in base.values()] or [(None, None)],
        "grp int, val long",
    ).filter(F.col("grp").isNotNull())
    v0 = v0_df.groupBy("grp").agg(
        F.count("*").alias("n"), F.sum("val").alias("s")
    )
    d_df = spark.createDataFrame(
        deltas or [(None, None, None)], "grp int, sign int, val long"
    ).filter(F.col("grp").isNotNull())
    dv = d_df.groupBy("grp").agg(
        F.sum("sign").alias("d_n"),
        F.sum(F.col("sign") * F.col("val")).alias("d_s"),
    )
    maintained = (
        v0.join(dv, "grp", "full_outer")
        .select(
            "grp",
            (F.coalesce("n", F.lit(0)) + F.coalesce("d_n", F.lit(0))).alias(
                "n"
            ),
            (F.coalesce("s", F.lit(0)) + F.coalesce("d_s", F.lit(0))).alias(
                "s"
            ),
        )
        .filter(F.col("n") > 0)
    )
    got = {
        r["grp"]: (r["n"], r["s"]) for r in maintained.collect()
    }
    want: dict = {}
    for g, v in final.values():
        n, s = want.get(g, (0, 0))
        want[g] = (n + 1, s + v)
    assert got == want


_INTERVALS = st.lists(
    st.tuples(
        st.integers(0, 2),    # day
        st.integers(0, 5),    # user (unique per day via unique_by below)
        st.integers(0, 20),   # start
        st.integers(0, 10),   # duration (0 => point interval)
    ),
    min_size=1,
    max_size=15,
    unique_by=lambda t: (t[0], t[1]),
)


@given(iv=_INTERVALS)
@settings(**_SETTINGS)
def test_sweep_line_concurrency_equals_brute_force(spark, iv):
    """E2 law: the ±1 sweep-line max equals the brute-force count of
    closed intervals covering any boundary point, per day — including
    point intervals (which must count themselves) and touching
    intervals (closed semantics: end == start counts as concurrent)."""
    rows = [(d, u, s, s + dur) for d, u, s, dur in iv]
    df = spark.createDataFrame(rows, "day int, user_id int, s long, e long")
    deltas = df.select(
        "day",
        "user_id",
        F.explode(
            F.array(
                F.struct(F.col("s").alias("t"), F.lit(1).alias("delta")),
                F.struct(F.col("e").alias("t"), F.lit(-1).alias("delta")),
            )
        ).alias("x"),
    ).select("day", "user_id", "x.t", "x.delta")
    w = (
        Window.partitionBy("day")
        .orderBy(F.col("t").asc(), F.col("delta").desc(), F.col("user_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    got = {
        r["day"]: r["m"]
        for r in deltas.withColumn("live", F.sum("delta").over(w))
        .groupBy("day")
        .agg(F.max("live").alias("m"))
        .collect()
    }
    want: dict = {}
    for d in {r[0] for r in rows}:
        day_iv = [(s, e) for dd, _, s, e in rows if dd == d]
        boundaries = {s for s, _ in day_iv} | {e for _, e in day_iv}
        want[d] = max(
            sum(1 for s, e in day_iv if s <= t <= e) for t in boundaries
        )
    assert got == want


@given(
    ids=st.lists(st.integers(0, 100_000), min_size=1, max_size=30, unique=True),
    n_parts=st.integers(1, 8),
)
@settings(**_SETTINGS)
def test_weighted_sample_deterministic_and_weight_monotone(spark, ids, n_parts):
    """L26 laws: (a) the selection is identical under any partitioning
    (pure function of the data); (b) it equals a pandas replay of the
    same exact-integer priority; (c) between two docs with the SAME
    hash, the heavier one never ranks lower."""
    from update_database_by_wind_spark.operators.training import (
        _KNUTH,
        _PRIME,
    )

    rows = [(i, (i * 7) % 500 + 1) for i in ids]  # (doc_id, weight)
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    priority = (
        ((F.col("doc_id") % _PRIME) * F.lit(_KNUTH)) % _PRIME
    ) * F.col("n_chars")
    w = Window.orderBy(F.col("priority").desc(), F.col("doc_id").asc())

    def select_top(frame, k=5):
        return sorted(
            r["doc_id"]
            for r in frame.select(
                "doc_id", priority.alias("priority")
            )
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .collect()
        )

    a = select_top(df.repartition(1))
    b = select_top(df.repartition(n_parts))
    assert a == b
    # pandas replay of the identical integer arithmetic
    pri = {i: ((i % _PRIME) * _KNUTH) % _PRIME * wt for i, wt in rows}
    want = sorted(
        sorted(pri, key=lambda i: (-pri[i], i))[:5]
    )
    assert a == want


def _ewma_scalar_recurrence(series):
    """The oracle's recursive CTE, literally: y ← fl(0.3·x + 0.7·y)."""
    out, prev = [], None
    for x in series:
        prev = x if prev is None else 0.3 * x + 0.7 * prev
        out.append(prev)
    return out


def test_ewma_vectorized_kernel_matches_explicit_recurrence_on_fixtures(spark):
    """ts_ewma parity guard on the driver's real inputs: the
    across-users numpy kernel must reproduce the oracle's explicit
    fl(0.3·x + 0.7·prev) recurrence BIT-exactly (not merely after
    rounding) over every fixture series at both driver scale factors
    (sf0.001 smoke + sf0.01 correctness).  pandas' ewm(adjust=False)
    fails this bar — its constant-series skip diverges by an ulp,
    which fuzzing showed landing on 6-decimal ROUND midpoints — which
    is why the kernel replays the recurrence itself."""
    from update_database_by_wind_spark.operators.analytics_extra import (
        _ewma_exact_kernel,
    )

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        from update_database_by_wind_spark.functions.numeric import dec_sum

        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        daily = (
            events.filter(F.col("event_type") == "purchase")
            .groupBy(
                "user_id", F.date_trunc("day", F.col("ts")).alias("day")
            )
            .agg(dec_sum("value", "day_value"))
            .toPandas()
        )
        got = _ewma_exact_kernel(daily)
        for _, g in got.groupby("user_id"):
            g = g.sort_values("day")
            want = _ewma_scalar_recurrence(
                g["day_value"].astype("float64").tolist()
            )
            assert g["ewma"].tolist() == want, (sf_dir, g["user_id"].iloc[0])


_EWMA_SERIES = st.lists(
    st.lists(
        # 6-decimal-quantized doubles — the dec_sum output domain the
        # operator actually feeds the kernel
        st.integers(0, 1_000_000_000).map(lambda i: i / 1e6),
        min_size=1,
        max_size=12,
    ).map(
        # inject constant runs: duplicate each value with its successor
        # sometimes, the exact shape that triggers pandas' skip and the
        # shape the advisor asked to fuzz
        lambda xs: [v for x in xs for v in (x, x)][: len(xs) + 3]
    ),
    min_size=1,
    max_size=5,
)


@given(series_by_user=_EWMA_SERIES)
@settings(max_examples=120, deadline=None)
def test_ewma_kernel_bit_exact_on_arbitrary_series(series_by_user):
    """Advisor ask (round 7→8): a hypothesis property over ARBITRARY
    quantized float series — not just the two fixture dirs — proving
    the vectorized kernel and the oracle's explicit recurrence agree
    bit-for-bit, so a one-ulp divergence can never land on a ROUND
    midpoint at any scale factor.  Pure-pandas invocation: no Spark
    needed, the kernel is deterministic numpy."""
    from update_database_by_wind_spark.operators.analytics_extra import (
        _ewma_exact_kernel,
    )

    rows = [
        (u, d, v)
        for u, xs in enumerate(series_by_user)
        for d, v in enumerate(xs)
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "day", "day_value"])
    # shuffle row order: the kernel must not depend on input order
    got = _ewma_exact_kernel(pdf.sample(frac=1, random_state=0))
    for u, g in got.groupby("user_id"):
        g = g.sort_values("day")
        want = _ewma_scalar_recurrence(
            g["day_value"].astype("float64").tolist()
        )
        assert g["ewma"].tolist() == want, (u, g["day_value"].tolist())


def test_heavy_hitters_end_to_end_on_skewed_corpus(spark):
    """A15 end-to-end on the CLASSIC shape the fixture lacks (its user
    frequencies sit near the mean): one dominant key holding ~30% of a
    synthetic corpus spread across many partitions must be detected
    with its exact count, and near-threshold keys must fall exactly on
    the integer-compare side the law says."""
    import pandas as pd

    from update_database_by_wind_spark.operators.aggregates import (
        _HH_K,
        _mg_update,
    )

    rows = [(0,)] * 3000 + [(k,) for k in range(1, 701) for _ in range(10)]
    df = spark.createDataFrame(rows, "user_id long").repartition(16)

    def mg_candidates(batches):
        mg = None
        for pdf in batches:
            mg = _mg_update(mg, pdf["user_id"].value_counts(), 191)
        if mg is not None and len(mg):
            yield pd.DataFrame({"user_id": mg.index.to_numpy()})

    cand = df.mapInPandas(mg_candidates, "user_id long").distinct()
    total = df.count()
    got = {
        r["user_id"]: r["n_events"]
        for r in df.join(F.broadcast(cand), "user_id", "left_semi")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .filter(F.col("n_events") * _HH_K > F.lit(total))
        .collect()
    }
    # exact expectation: 10000 rows, threshold n/140 ≈ 71.4 — only the
    # dominant key (3000 > 71.4) qualifies; every 10-count key must not
    assert got == {0: 3000}, got


@given(
    keys=st.lists(st.integers(0, 400), min_size=1, max_size=40),
)
@settings(**_SETTINGS)
def test_write_expectations_reason_strings_partition_batch(spark, keys):
    """U17 law: every row lands in exactly one quarantine class, the
    class counts sum to the batch size, and the reason string is the
    declared-rule-order concatenation — replayed against a pure-Python
    reference on arbitrary key sets (including keys failing BOTH
    rules)."""
    dim = list(range(0, 401, 2))  # even keys exist in the dimension
    rows = [(k, 100 - (k % 7) * 20) for k in keys]  # some cents <= 0
    df = spark.createDataFrame(rows, "k long, cents long")
    dim_df = spark.createDataFrame([(d,) for d in dim], "c long")
    probed = df.join(F.broadcast(dim_df), df.k == dim_df.c, "left")
    reason = F.concat(
        F.when(F.col("cents") <= 0, F.lit("price_positive;")).otherwise(
            F.lit("")
        ),
        F.when(F.col("c").isNull(), F.lit("fk_customer;")).otherwise(
            F.lit("")
        ),
    )
    got = {
        (r["reason"], r["n"])
        for r in probed.select(
            F.when(reason == "", "ok").otherwise(reason).alias("reason")
        )
        .groupBy("reason")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    want: dict = {}
    for k, cents in rows:
        r = ("price_positive;" if cents <= 0 else "") + (
            "fk_customer;" if k not in dim else ""
        )
        r = r or "ok"
        want[r] = want.get(r, 0) + 1
    assert got == set(want.items())
    assert sum(n for _, n in got) == len(rows)


_QSK_VALUES = st.lists(st.integers(0, 1_000_000_000), min_size=1, max_size=300)


@given(
    values=_QSK_VALUES,
    shard_of=st.lists(st.integers(0, 4), min_size=300, max_size=300),
)
@settings(max_examples=200, deadline=None)
def test_quantile_sketch_laws_under_arbitrary_sharding(values, shard_of):
    """A16 laws, fuzzed over arbitrary values AND arbitrary shard
    assignments (the verdict's ask): (1) bin-wise counter addition of
    per-shard histograms equals the from-scratch histogram — the
    mergeability contract under ANY partitioning; (2) for every
    percentile, the first bin whose cumulative count reaches the
    integer rank r = (pct·n + 99) DIV 100 brackets the exact r-th
    order statistic within one bin width.  Pure-python replay of the
    integer arithmetic both engines run, over the operator's OWN
    constants (review finding: a re-declared W would let the test
    drift from the operator)."""
    from collections import Counter

    from update_database_by_wind_spark.operators.aggregates import (
        _QSK_PCTS,
        _QSK_W,
    )

    W = _QSK_W
    n = len(values)
    full = Counter(v // W for v in values)
    shards = [Counter() for _ in range(5)]
    for v, s in zip(values, shard_of):
        shards[s][v // W] += 1
    merged = Counter()
    for sh in shards:
        merged.update(sh)
    assert merged == full  # law 1: merge ≡ recompute

    ordered = sorted(values)
    cum, cdf = 0, []
    for b in sorted(full):
        cum += full[b]
        cdf.append((b, cum))
    for pct in _QSK_PCTS:
        r = (pct * n + 99) // 100
        bin_ = next(b for b, c in cdf if c >= r)
        exact = ordered[r - 1]
        assert bin_ * W <= exact <= (bin_ + 1) * W - 1  # law 2: bracket


def test_cms_never_undercounts_and_merges(spark, sf_smoke):
    """A17 invariants at the smoke SF (different corpus than the oracle
    gate): CMS estimates are lower-bounded by exact counts (every
    occurrence of k lands in all d of k's buckets), and shard-sum
    counters equal from-scratch counters."""
    import update_database_by_wind_spark.operators  # noqa: F401
    from update_database_by_wind_spark.registry import REGISTRY

    rows = REGISTRY["a17_countmin_sketch"].fn(spark, sf_smoke).collect()
    assert rows, "probe set empty"
    for r in rows:
        assert r["overcount"] >= 0, r
        assert r["cms_est"] == r["exact_cnt"] + r["overcount"]
        assert r["merge_ok"] is True


# Distributed exact rank (functions/ranks.py): values with heavy ties,
# negatives, and a unique key — the rewrite must be BIT-identical to
# the unpartitioned window it replaced in e5/o8, including NTILE edge
# cases (n < tiles, n % tiles != 0), for any bucket count (including
# more buckets than rows and the degenerate single-bucket case).
_RANK_ROWS = st.lists(
    st.integers(-50, 50), min_size=1, max_size=40, unique=False
)


@given(vals=_RANK_ROWS, n_buckets=st.sampled_from([1, 2, 5, 64]),
       descending=st.booleans())
@settings(**_SETTINGS)
@example(vals=[7] * 12, n_buckets=5, descending=True)  # one hot value
@example(vals=[1, 2, 3], n_buckets=64, descending=False)  # n < tiles
def test_global_ranks_match_unpartitioned_window(
    spark, vals, n_buckets, descending
):
    from update_database_by_wind_spark.functions.ranks import (
        ntile_from_rank,
        with_global_ranks,
    )

    df = spark.createDataFrame(
        [(i, int(v)) for i, v in enumerate(vals)], "k long, v long"
    )
    spec = {
        "value": "v",
        "key": "k",
        "rank": "rn",
        "descending": descending,
        "cum": ("v", "cum"),
    }
    got_df, n = with_global_ranks(df, [spec], n_buckets=n_buckets)
    got_df = got_df.withColumn("tile", ntile_from_rank("rn", n, 5))
    order = [F.col("v").desc(), "k"] if descending else ["v", "k"]
    w = Window.orderBy(*order)
    exp_df = df.select(
        "k",
        F.row_number().over(w).cast("long").alias("rn"),
        F.sum("v")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("cum"),
        F.ntile(5).over(w).cast("long").alias("tile"),
    )
    got = {r["k"]: (r["rn"], r["cum"], r["tile"]) for r in got_df.collect()}
    exp = {r["k"]: (r["rn"], r["cum"], r["tile"]) for r in exp_df.collect()}
    assert got == exp
    assert n == len(vals)
    assert spec["total"] == sum(vals)


# Two-pass sessionization (j13's round-12 prefix): runs straddling
# chunk edges, chains across EMPTY chunks, ties, and gap == chunk edge
# cases must all reproduce the single-pass reference exactly.
@given(
    ts=st.lists(st.integers(0, 1000), min_size=1, max_size=40),
    gap=st.sampled_from([1, 5, 30, 99, 100, 250]),
    chunk=st.sampled_from([1, 7, 100, 5000]),
)
@settings(**_SETTINGS)
# chunk=1: every distinct t is its own chunk -> maximal merge-pass load
# chunk=5000: one chunk -> pure pass-1; 100: the mixed default shape
@example(ts=[95, 96, 104, 105], gap=30, chunk=100)  # straddles an edge
@example(ts=[95, 305], gap=250, chunk=100)  # chain across empty chunk
@example(ts=[99, 100, 199, 200], gap=99, chunk=100)  # merge at the gap
@example(ts=[7, 7, 7, 207, 207], gap=5, chunk=100)  # tie-heavy, 2 runs
@example(ts=[0, 1, 2, 3], gap=1, chunk=1)  # chain across MANY chunks
def test_two_pass_sessionize_matches_single_pass(spark, ts, gap, chunk):
    from update_database_by_wind_spark.operators.joins import (
        sessionize_two_pass,
    )

    df = spark.createDataFrame(
        [(int(t), i) for i, t in enumerate(ts)], "t_us long, event_id long"
    )
    got = sorted(
        (r["start_us"], r["end_us"], r["n_err"])
        for r in sessionize_two_pass(df, gap_us=gap, chunk_us=chunk).collect()
    )
    runs, cur = [], None
    for t in sorted(ts):
        if cur is None or t - cur[1] > gap:
            if cur:
                runs.append(tuple(cur))
            cur = [t, t, 1]
        else:
            cur[1], cur[2] = t, cur[2] + 1
    if cur:
        runs.append(tuple(cur))
    assert got == sorted(runs)
