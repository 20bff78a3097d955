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


def test_null_values_are_refused_by_the_count_pass(spark):
    """A null value lands in the last bucket (the CASE tree's
    otherwise) while the in-bucket sort puts nulls first — the count
    pass, which sees every row anyway, counts value nulls per spec and
    raises on the first one instead of mis-ranking silently."""
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 30)], "k long, v long"
    )
    with pytest.raises(ValueError, match="null values in rank columns"):
        with_global_ranks(df, [_spec()], n_buckets=4)


def test_input_drift_between_jobs_fails_loudly(spark, tmp_path):
    """The advisor's finding: the count pass and the rank pass are
    separate jobs over the same lazy input, so a source that evaluates
    differently between them could land rank-pass rows in a bucket the
    count pass never saw — and the old inner join against the offsets
    DROPPED those rows silently.  Simulate exactly that drift with a
    non-deterministic UDF whose value comes from a file the test
    rewrites between the eager passes and the lazy rank collect: every
    row moves from the occupied bucket (>= the single split) into the
    never-seen one (< the split), and the left-join guard must raise
    instead of returning an empty result."""
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
    # splits/count passes run eagerly here and see v == 5 everywhere:
    # the single split is 5, bucket 1 (v >= 5) holds every row and
    # bucket 0 (v < 5) is never seen
    out, n = with_global_ranks(df, [_spec()], n_buckets=4)
    assert n == 30
    # ...then the input drifts before the lazy rank pass evaluates
    marker.write_text("3")
    with pytest.raises(Exception, match="bucket the count pass never saw"):
        out.collect()
