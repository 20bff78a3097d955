"""Input-contract and drift guards on functions/ranks.py (round-13
hardening: the round-12 verdict's ask #5 plus the advisor's
drift-invariant finding).  The POSITIVE path — bit-equivalence of the
distributed ranks against the unpartitioned reference window, swept
over bucket counts including the bisection classifier's edge shapes —
lives in tests/test_properties.py; this file pins the refusals."""

import pytest
from pyspark.sql import functions as F

from update_database_by_wind_spark.functions.ranks import with_global_ranks


def _spec(**over):
    spec = {"value": "v", "key": "k", "rank": "rn"}
    spec.update(over)
    return spec


def test_non_integral_value_column_is_refused(spark):
    """A double value column would mis-bucket silently against the
    long-cast split literals — the guard must refuse it up front,
    before any job runs."""
    df = spark.createDataFrame([(1, 1.5), (2, 2.5)], "k long, v double")
    with pytest.raises(TypeError, match="not integral"):
        with_global_ranks(df, [_spec()], n_buckets=4)


def test_non_integral_measure_column_is_refused(spark):
    """The cum measure is cast long in both the count pass and the
    window sum — a double measure would TRUNCATE silently, so it is
    refused with the same loud TypeError as the value column."""
    df = spark.createDataFrame(
        [(1, 10, 0.5), (2, 20, 0.7)], "k long, v long, m double"
    )
    with pytest.raises(TypeError, match="measure column 'm'"):
        with_global_ranks(df, [_spec(cum=("m", "cm"))], n_buckets=4)


def test_missing_value_column_is_refused(spark):
    df = spark.createDataFrame([(1, 10)], "k long, v long")
    with pytest.raises(TypeError, match="not in input schema"):
        with_global_ranks(df, [_spec(value="nope")], n_buckets=4)


def test_null_values_are_refused_by_the_boundary_pass(spark):
    """A null value lands in the last bucket (the CASE tree's
    otherwise) while the in-bucket sort puts nulls first — the
    boundary pass, which sees every row anyway, counts value nulls per
    column and raises on the first one instead of mis-ranking
    silently (round 19: this guard moved from the count pass into the
    boundary aggregate when the count pass went lazy)."""
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 30)], "k long, v long"
    )
    with pytest.raises(ValueError, match="null values in rank columns"):
        with_global_ranks(df, [_spec()], n_buckets=4)


def test_input_drift_after_boundary_pass_is_harmless(spark, tmp_path):
    """Round-19 semantics: the exact per-bucket offsets are no longer
    collected in a second eager job — they are a lazy broadcast
    subtree evaluated inside the SAME action as the rank pass.  A
    source that drifts between the eager boundary job and the caller's
    action therefore yields a CORRECT result computed wholly from the
    drifted input (stale splits only affect bucket balance, never
    correctness), where the pre-round-19 design had to raise.
    Simulate the drift with a non-deterministic UDF whose value comes
    from a file the test rewrites between the with_global_ranks call
    and the collect: every row moves from the boundary-time bucket
    (>= the single split 5) into the other one (v == 3 < 5), and the
    ranks must still come back exact and total."""
    marker = tmp_path / "value.txt"
    marker.write_text("5")
    path = str(marker)

    def _read_marker() -> int:
        with open(path) as fh:
            return int(fh.read().strip())

    read_marker = F.udf(_read_marker, "long").asNondeterministic()
    df = spark.range(30).select(
        F.col("id").alias("k"), read_marker().alias("v")
    )
    # the boundary pass runs eagerly here and sees v == 5 everywhere
    out, n = with_global_ranks(df, [_spec()], n_buckets=4)
    assert n == 30
    # ...then the input drifts before the action: offsets and ranks
    # both see v == 3, so every row ranks by the unique tiebreak k
    marker.write_text("3")
    got = {r["k"]: r["rn"] for r in out.collect()}
    assert got == {k: k + 1 for k in range(30)}


def test_missing_offset_guard_raises_loudly(spark):
    """The drift guard itself (ranks._guarded): two evaluations of a
    non-deterministic source INSIDE one action can still disagree, and
    a rank-pass row landing in a bucket the offsets evaluation never
    saw must raise, not silently drop or mis-rank.  The in-action
    interleaving cannot be staged deterministically from a test, so
    pin the guard expression directly: a null offset (the left join's
    miss) raises with the documented message."""
    from update_database_by_wind_spark.functions.ranks import _guarded

    df = spark.createDataFrame(
        [(0, 7), (1, None)], "k long, _cnt_off long"
    )
    assert [
        r["g"]
        for r in df.filter("k = 0")
        .select(_guarded("_cnt_off").alias("g"))
        .collect()
    ] == [7]
    with pytest.raises(Exception, match="bucket the count pass never saw"):
        df.select(_guarded("_cnt_off").alias("g")).collect()
