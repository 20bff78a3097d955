"""Structural tests for S13 file-level min/max data skipping
(operators/storage.py) — the receipts S10/S11 have, at family parity:

- the pruned read's file list is strictly smaller than the listing on
  a range-clustered write, and band results equal the full-scan filter;
- the honest NEGATIVE case: on an adversarially NON-clustered write
  (hash-shuffled, every file spans the whole key range) skipping must
  keep every file and still return the right rows — data skipping is
  a layout contract, and the index must never lie about it;
- generative fuzz over band edges (empty band below/above the domain,
  single-point bands, full-domain bands) proving pruned == full-scan
  row-for-row at every edge;
- the advisor's edge cases: empty index raises, string columns get a
  string-typed index (no hardcoded `long` schema), zero-row-group
  files are dropped rather than poisoning comparisons with nulls.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from update_database_by_wind_spark.operators.storage import (
    build_file_stats_index,
    skipping_read,
)


@pytest.fixture(scope="module")
def clustered(spark, sf_smoke, tmp_path_factory):
    """orders range-clustered on o_custkey into 8 files."""
    base = str(tmp_path_factory.mktemp("skip_clustered"))
    (
        spark.read.parquet(os.path.join(sf_smoke, "orders.parquet"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .repartitionByRange(8, "o_custkey")
        .write.mode("overwrite")
        .parquet(base)
    )
    index = build_file_stats_index(spark, base, "o_custkey")
    return base, index


@pytest.fixture(scope="module")
def shuffled(spark, sf_smoke, tmp_path_factory):
    """The adversarial layout: hash-repartitioned on orderkey, so every
    file's o_custkey span covers ~the whole domain."""
    base = str(tmp_path_factory.mktemp("skip_shuffled"))
    (
        spark.read.parquet(os.path.join(sf_smoke, "orders.parquet"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .repartition(8, "o_orderkey")
        .write.mode("overwrite")
        .parquet(base)
    )
    index = build_file_stats_index(spark, base, "o_custkey")
    return base, index


def _domain(index):
    row = index.agg(
        F.min("vmin").alias("lo"), F.max("vmax").alias("hi")
    ).collect()[0]
    return row["lo"], row["hi"]


def test_clustered_band_prunes_and_loses_nothing(spark, clustered):
    base, index = clustered
    lo, hi = _domain(index)
    mid = (lo + hi) // 2
    band = (mid, mid + max(1, (hi - lo) // 16))
    df, n_kept, n_total = skipping_read(spark, index, *band)
    assert n_total == 8
    assert n_kept < n_total, "clustered write must let the band skip files"
    got = df.filter(F.col("o_custkey").between(*band)).count()
    full = (
        spark.read.parquet(base)
        .filter(F.col("o_custkey").between(*band))
        .count()
    )
    assert got == full and full > 0


def test_index_matches_listing_and_row_total(spark, clustered):
    base, index = clustered
    rows = index.collect()
    listed = sorted(glob.glob(os.path.join(base, "*.parquet")))
    assert sorted(r["file"] for r in rows) == listed
    total = sum(r["n_rows"] for r in rows)
    assert total == spark.read.parquet(base).count()
    for r in rows:
        assert r["vmin"] <= r["vmax"]


def test_non_clustered_layout_keeps_everything(spark, shuffled):
    """The honest negative: when every file spans the domain, a narrow
    band must keep ALL files (the index can only prune what the layout
    localized) and the result must still be exact."""
    base, index = shuffled
    lo, hi = _domain(index)
    mid = (lo + hi) // 2
    band = (mid, mid + max(1, (hi - lo) // 16))
    df, n_kept, n_total = skipping_read(spark, index, *band)
    assert n_total == 8
    assert n_kept == n_total, (
        "a hash-shuffled layout has no locality; pruning here would "
        "mean the index is lying about file spans"
    )
    got = df.filter(F.col("o_custkey").between(*band)).count()
    full = (
        spark.read.parquet(base)
        .filter(F.col("o_custkey").between(*band))
        .count()
    )
    assert got == full


@pytest.mark.parametrize(
    "make_band",
    [
        lambda lo, hi: (lo - 1000, lo - 1),  # entirely below the domain
        lambda lo, hi: (hi + 1, hi + 1000),  # entirely above
        lambda lo, hi: (lo, lo),  # single point at the min
        lambda lo, hi: (hi, hi),  # single point at the max
        lambda lo, hi: (lo, hi),  # the whole domain
        lambda lo, hi: (hi, lo),  # inverted band -> empty
    ],
    ids=["below", "above", "point-min", "point-max", "full", "inverted"],
)
def test_band_edges_pruned_equals_full_scan(spark, clustered, make_band):
    base, index = clustered
    lo, hi = _domain(index)
    b_lo, b_hi = make_band(lo, hi)
    df, n_kept, n_total = skipping_read(spark, index, b_lo, b_hi)
    got = df.filter(F.col("o_custkey").between(b_lo, b_hi)).count()
    full = (
        spark.read.parquet(base)
        .filter(F.col("o_custkey").between(b_lo, b_hi))
        .count()
    )
    assert got == full
    if b_lo > b_hi or b_hi < lo or b_lo > hi:
        assert n_kept == 0 and got == 0
    if (b_lo, b_hi) == (lo, hi):
        assert n_kept == n_total


def test_inverted_band_reads_nothing_even_unclustered(spark, shuffled):
    """Review finding (r11): an inverted band (lo > hi) must keep ZERO
    files on ANY layout.  Without the explicit lo <= hi short-circuit,
    the interval test `vmin <= hi AND vmax >= lo` selects any file
    spanning [hi, lo] — on this hash-shuffled layout every file spans
    the domain, so the old code would read the whole table to return
    zero rows."""
    base, index = shuffled
    lo, hi = _domain(index)
    df, n_kept, n_total = skipping_read(spark, index, hi, lo)
    assert n_kept == 0
    assert df.count() == 0


def test_empty_index_raises(spark, tmp_path):
    """Advisor edge case: an index over a dir with no parquet files
    must fail loudly at plan time, not IndexError in the empty-band
    branch."""
    empty = tmp_path / "no_files"
    empty.mkdir()
    index = build_file_stats_index(spark, str(empty), "o_custkey")
    assert index.count() == 0
    with pytest.raises(ValueError, match="empty stats index"):
        skipping_read(spark, index, 0, 10)


def test_string_column_index_is_string_typed(spark, sf_smoke, tmp_path):
    """Advisor edge case: the index schema derives from the column's
    arrow type — a string column yields string vmin/vmax (the old code
    hardcoded `long` and crashed at createDataFrame)."""
    base = str(tmp_path / "str_cluster")
    (
        spark.read.parquet(os.path.join(sf_smoke, "orders.parquet"))
        .select("o_orderkey", "o_orderpriority")
        .repartitionByRange(4, "o_orderpriority")
        .write.mode("overwrite")
        .parquet(base)
    )
    index = build_file_stats_index(spark, base, "o_orderpriority")
    schema = dict(index.dtypes)
    assert schema["vmin"] == "string" and schema["vmax"] == "string"
    rows = index.collect()
    assert all(r["vmin"] <= r["vmax"] for r in rows)


def test_unsupported_column_type_raises(spark, tmp_path):
    base = str(tmp_path / "arr_col")
    spark.createDataFrame(
        [(1, [1, 2]), (2, [3])], "k long, xs array<long>"
    ).write.mode("overwrite").parquet(base)
    with pytest.raises(ValueError, match="min/max skipping supports"):
        build_file_stats_index(spark, base, "xs")


def test_zero_row_files_are_dropped(spark, tmp_path):
    """A parquet file with zero row groups holds no rows; it must be
    dropped from the index (not carried with null stats that poison
    every range comparison)."""
    base = str(tmp_path / "with_empty")
    spark.createDataFrame(
        [(i, i * 10) for i in range(100)], "k long, v long"
    ).repartitionByRange(4, "k").write.mode("overwrite").parquet(base)
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"k": pa.array([], pa.int64()), "v": pa.array([], pa.int64())}),
        os.path.join(base, "part-empty.parquet"),
    )
    index = build_file_stats_index(spark, base, "k")
    files = [r["file"] for r in index.collect()]
    assert not any("part-empty" in f for f in files)
    df, n_kept, n_total = skipping_read(spark, index, 10, 30)
    assert n_total == len(files)
    assert df.filter(F.col("k").between(10, 30)).count() == 21


# --- round-12 widening: multi-column, timestamp, decimal ----------------

from update_database_by_wind_spark.operators.storage import (  # noqa: E402
    skipping_read_multi,
)


@pytest.fixture(scope="module")
def bi_clustered(spark, tmp_path_factory):
    """Synthetic (k, ts, amt) where ts and amt are monotone in k, so a
    range-cluster on k gives EVERY indexed column tight per-file spans
    — the correlated-dimension layout where conjunctive skipping
    prunes on both bands at once."""
    base = str(tmp_path_factory.mktemp("skip_multi"))
    (
        spark.range(2000)
        .select(
            F.col("id").alias("k"),
            # TIMESTAMP_NTZ: lands in parquet as stats-bearing INT64
            # micros (matching the driver testdata).  A tz-aware
            # TimestampType would be written INT96 under Spark's
            # default outputTimestampType, which carries NO min/max —
            # the builder's loud no-stats raise covers that case.
            F.timestamp_micros(
                F.lit(1_700_000_000_000_000) + F.col("id") * 60_000_000
            )
            .cast("timestamp_ntz")
            .alias("ts"),
            (F.col("id").cast("decimal(18,2)") / 4).alias("amt"),
        )
        .repartitionByRange(8, "k")
        .write.mode("overwrite")
        .parquet(base)
    )
    index = build_file_stats_index(spark, base, ["k", "ts", "amt"])
    return base, index


def test_multi_column_index_types_derive_from_arrow(bi_clustered):
    _, index = bi_clustered
    schema = dict(index.dtypes)
    assert schema["k_min"] == "bigint" and schema["k_max"] == "bigint"
    assert schema["ts_min"].startswith("timestamp")
    assert schema["amt_min"] == "decimal(28,8)" or schema[
        "amt_min"
    ].startswith("decimal")
    for r in index.collect():
        assert r["k_min"] <= r["k_max"]
        assert r["ts_min"] <= r["ts_max"]
        assert r["amt_min"] <= r["amt_max"]


def test_conjunctive_bands_prune_and_lose_nothing(spark, bi_clustered):
    base, index = bi_clustered
    import datetime

    # derive the time origin from the index itself (session-TZ robust)
    t0 = min(r["ts_min"] for r in index.collect())
    bands = {
        "k": (500, 740),
        "ts": (
            t0 + datetime.timedelta(minutes=500),
            t0 + datetime.timedelta(minutes=700),
        ),
    }
    df, n_kept, n_total = skipping_read_multi(spark, index, bands)
    assert n_total == 8
    assert n_kept < n_total, "correlated layout must prune"
    pred = F.col("k").between(*bands["k"]) & F.col("ts").between(*bands["ts"])
    assert df.filter(pred).count() == (
        spark.read.parquet(base).filter(pred).count()
    )
    # conjunction keeps no more files than either band alone
    _, k_only, _ = skipping_read_multi(spark, index, {"k": bands["k"]})
    _, ts_only, _ = skipping_read_multi(spark, index, {"ts": bands["ts"]})
    assert n_kept <= min(k_only, ts_only)


def test_decimal_band_skips_exactly(spark, bi_clustered):
    from decimal import Decimal

    base, index = bi_clustered
    band = (Decimal("100.00"), Decimal("150.25"))
    df, n_kept, n_total = skipping_read_multi(spark, index, {"amt": band})
    assert 0 < n_kept < n_total
    pred = F.col("amt").between(*band)
    assert df.filter(pred).count() == (
        spark.read.parquet(base).filter(pred).count()
    )


def test_single_timestamp_column_back_compat_schema(spark, bi_clustered):
    """A single timestamp column keeps the original (file, vmin, vmax,
    n_rows) schema — typed by the column's arrow type — and
    skipping_read plans over it with datetime bounds."""
    base, _ = bi_clustered
    import datetime

    index = build_file_stats_index(spark, base, "ts")
    schema = dict(index.dtypes)
    assert schema["vmin"].startswith("timestamp")
    t0 = min(r["vmin"] for r in index.collect())
    lo, hi = t0 + datetime.timedelta(minutes=100), t0 + datetime.timedelta(
        minutes=260
    )
    df, n_kept, n_total = skipping_read(spark, index, lo, hi)
    assert 0 < n_kept < n_total
    pred = F.col("ts").between(lo, hi)
    assert df.filter(pred).count() == (
        spark.read.parquet(base).filter(pred).count()
    )


@pytest.mark.parametrize(
    "mk",
    [
        lambda lo, hi: (lo, hi),  # full domain on both
        lambda lo, hi: (hi, lo),  # inverted -> zero files
        lambda lo, hi: (lo, lo),  # point at min
        lambda lo, hi: (hi + 1, hi + 10),  # above domain
    ],
    ids=["full", "inverted", "point-min", "above"],
)
def test_multi_band_edges_pruned_equals_full_scan(spark, bi_clustered, mk):
    base, index = bi_clustered
    b = mk(0, 1999)
    df, n_kept, n_total = skipping_read_multi(spark, index, {"k": b})
    pred = F.col("k").between(*b)
    got = df.filter(pred).count()
    full = spark.read.parquet(base).filter(pred).count()
    assert got == full
    if b[0] > b[1] or b[0] > 1999:
        assert n_kept == 0 and got == 0


def test_multi_index_unknown_band_column_raises(spark, bi_clustered):
    _, index = bi_clustered
    with pytest.raises(ValueError, match="no stats for"):
        skipping_read_multi(spark, index, {"nope": (0, 1)})


def test_empty_column_list_raises(spark, bi_clustered):
    base, _ = bi_clustered
    with pytest.raises(ValueError, match="no columns requested"):
        build_file_stats_index(spark, base, [])


# --- persisted index: the s13 -> S1 integration ---------------------------------

from update_database_by_wind_spark.operators.storage import (  # noqa: E402
    indexed_band_read,
    write_stats_index,
)


def test_persisted_index_roundtrip_and_reuse(spark, tmp_path):
    base = str(tmp_path / "tbl")
    (
        spark.range(1000)
        .select(F.col("id").alias("k"), (F.col("id") * 3).alias("v"))
        .repartitionByRange(8, "k")
        .write.parquet(base)
    )
    dest = write_stats_index(spark, base, ["k"])
    assert dest.endswith("_stats_index")
    # the index dir must be invisible to data scans and to the builder
    assert spark.read.parquet(base).count() == 1000
    df, n_kept, n_total = indexed_band_read(spark, base, {"k": (100, 199)})
    assert n_total == 8 and 0 < n_kept < n_total
    pred = F.col("k").between(100, 199)
    assert df.filter(pred).count() == 100


def test_indexed_read_rebuilds_on_append(spark, tmp_path):
    """Staleness guard: an append AFTER the index was written must
    trigger a rebuild — a stale index planning past new files would
    silently lose their rows."""
    base = str(tmp_path / "tbl")
    (
        spark.range(1000)
        .select(F.col("id").alias("k"))
        .repartitionByRange(4, "k")
        .write.parquet(base)
    )
    write_stats_index(spark, base, ["k"])
    spark.range(1000, 1100).select(F.col("id").alias("k")).coalesce(
        1
    ).write.mode("append").parquet(base)
    df, n_kept, n_total = indexed_band_read(spark, base, {"k": (1000, 1099)})
    assert n_total == 5, "rebuilt index must see the appended file"
    assert df.filter(F.col("k").between(1000, 1099)).count() == 100


def test_indexed_read_builds_when_no_index(spark, tmp_path):
    base = str(tmp_path / "tbl")
    (
        spark.range(400)
        .select(F.col("id").alias("k"))
        .repartitionByRange(4, "k")
        .write.parquet(base)
    )
    df, n_kept, n_total = indexed_band_read(spark, base, {"k": (0, 99)})
    assert n_total == 4 and n_kept < n_total
    assert df.filter(F.col("k").between(0, 99)).count() == 100
    import os

    assert os.path.isdir(os.path.join(base, "_stats_index"))


def test_indexed_read_rebuilds_for_uncovered_column(spark, tmp_path):
    """An index persisted for one column must rebuild (not KeyError)
    when a band arrives on a column it does not cover."""
    base = str(tmp_path / "tbl")
    (
        spark.range(500)
        .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
        .repartitionByRange(4, "k")
        .write.parquet(base)
    )
    write_stats_index(spark, base, ["k"])
    df, n_kept, n_total = indexed_band_read(spark, base, {"v": (0, 198)})
    assert n_total == 4 and 0 < n_kept < n_total
    assert df.filter(F.col("v").between(0, 198)).count() == 100


def test_multi_band_generative_parity(spark, tmp_path_factory):
    """Generative sweep for conjunctive skipping: random correlated and
    anti-correlated layouts x random (possibly empty/inverted/point)
    bands on both columns — the pruned read filtered by the predicate
    must equal the full scan row-for-row, every time.  (hypothesis is
    deliberately not used here: one shared layout, a deterministic
    band grid — Spark round trips per example are too slow for
    shrinking to help.)"""
    base = str(tmp_path_factory.mktemp("skip_gen") / "tbl")
    (
        spark.range(3000)
        .select(
            F.col("id").alias("k"),
            # v correlates with k in the first half, anti-correlates in
            # the second: per-file v-spans are tight in some files and
            # wide in others, so conjunctive pruning decisions differ
            # per file
            F.when(F.col("id") < 1500, F.col("id") * 2)
            .otherwise((3000 - F.col("id")) * 7)
            .alias("v"),
        )
        .repartitionByRange(10, "k")
        .write.parquet(base)
    )
    index = build_file_stats_index(spark, base, ["k", "v"])
    full = spark.read.parquet(base)
    bands_k = [(0, 2999), (100, 220), (2999, 2999), (3000, 4000), (50, 10)]
    bands_v = [(0, 30000), (500, 900), (-5, -1), (10500, 10500)]
    for bk in bands_k:
        for bv in bands_v:
            bands = {"k": bk, "v": bv}
            df, n_kept, n_total = skipping_read_multi(spark, index, bands)
            pred = F.col("k").between(*bk) & F.col("v").between(*bv)
            got = df.filter(pred).count()
            exp = full.filter(pred).count()
            assert got == exp, (bands, n_kept, n_total, got, exp)
            if bk[0] > bk[1] or bv[0] > bv[1]:
                assert n_kept == 0


# --- round 13: union rebuilds + the default auto-skipping reader ---------------

from update_database_by_wind_spark.operators.storage import (  # noqa: E402
    read_parquet_pruned,
)


def _write_kv(spark, base: str, n: int = 1000, files: int = 8) -> None:
    (
        spark.range(n)
        .select(F.col("id").alias("k"), (F.col("id") * 3).alias("v"))
        .repartitionByRange(files, "k")
        .write.parquet(base)
    )


def test_rebuild_unions_cached_stat_columns(spark, tmp_path):
    """The advisor's thrash finding: an index persisted for column k
    must, when a band arrives on column v, rebuild carrying BOTH — so
    the next probe on EITHER column reuses the index instead of the
    two query families rebuilding it back and forth forever."""
    import os

    base = str(tmp_path / "tbl")
    _write_kv(spark, base)
    write_stats_index(spark, base, ["k"])
    idx_dir = os.path.join(base, "_stats_index")
    # band on v: rebuild required (v uncovered) — must union in k
    indexed_band_read(spark, base, {"v": (0, 500)})
    cols = spark.read.parquet(idx_dir).columns
    assert {"k_min", "k_max", "v_min", "v_max"} <= set(cols)
    # now BOTH families probe without a rebuild
    stamp = os.stat(idx_dir).st_mtime_ns
    _, k_kept, k_total = indexed_band_read(spark, base, {"k": (100, 199)})
    _, v_kept, v_total = indexed_band_read(spark, base, {"v": (300, 597)})
    assert os.stat(idx_dir).st_mtime_ns == stamp, "probe rebuilt the index"
    assert 0 < k_kept < k_total and 0 < v_kept < v_total


def test_default_reader_without_index_is_a_full_read(spark, tmp_path):
    """The negative case: a plain parquet directory keeps working —
    full listing, no error, and the read path writes NOTHING."""
    import os

    base = str(tmp_path / "tbl")
    _write_kv(spark, base)
    df, n_kept, n_total = read_parquet_pruned(spark, base, {"k": (0, 99)})
    assert n_kept == n_total == 8
    assert not os.path.isdir(os.path.join(base, "_stats_index"))
    assert df.filter(F.col("k").between(0, 99)).count() == 100


def test_default_reader_prunes_through_fresh_index(spark, tmp_path):
    base = str(tmp_path / "tbl")
    _write_kv(spark, base)
    write_stats_index(spark, base, ["k"])
    df, n_kept, n_total = read_parquet_pruned(spark, base, {"k": (100, 199)})
    assert n_total == 8 and 0 < n_kept < n_total
    assert df.filter(F.col("k").between(100, 199)).count() == 100


def test_default_reader_falls_back_on_stale_index(spark, tmp_path):
    """A reader must never rebuild (it may have no write lease) and
    must never plan over a stale index (rows lost/invented) — on
    drift it reads the full live listing, correctness over skipping."""
    import os

    base = str(tmp_path / "tbl")
    _write_kv(spark, base)
    write_stats_index(spark, base, ["k"])
    idx_dir = os.path.join(base, "_stats_index")
    stamp = os.stat(idx_dir).st_mtime_ns
    spark.range(1000, 1100).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    ).coalesce(1).write.mode("append").parquet(base)
    df, n_kept, n_total = read_parquet_pruned(spark, base, {"k": (1000, 1099)})
    assert n_kept == n_total == 9, "stale index must mean full fallback"
    assert os.stat(idx_dir).st_mtime_ns == stamp, "reader rebuilt the index"
    assert df.filter(F.col("k").between(1000, 1099)).count() == 100


def test_default_reader_prunes_on_covered_subset(spark, tmp_path):
    """Bands on a covered and an uncovered column: conjunctive pruning
    on the covered subset alone is sound (it only keeps extra files) —
    the reader must prune on k and leave v to the caller's filter."""
    base = str(tmp_path / "tbl")
    _write_kv(spark, base)
    write_stats_index(spark, base, ["k"])
    bands = {"k": (100, 199), "v": (300, 597)}
    df, n_kept, n_total = read_parquet_pruned(spark, base, bands)
    assert 0 < n_kept < n_total
    pred = F.col("k").between(100, 199) & F.col("v").between(300, 597)
    assert df.filter(pred).count() == 100


def test_default_reader_no_bands_is_plain_read(spark, tmp_path):
    base = str(tmp_path / "tbl")
    _write_kv(spark, base)
    write_stats_index(spark, base, ["k"])
    df, n_kept, n_total = read_parquet_pruned(spark, base)
    assert n_kept == n_total == 8
    assert df.count() == 1000


def test_default_reader_survives_corrupt_index(spark, tmp_path):
    """A plain spark.read.parquet ignores underscore dirs entirely, so
    the transparent reader must never fail a read the plain reader
    would serve: garbage in _stats_index degrades to a full read."""
    import os

    base = str(tmp_path / "tbl")
    _write_kv(spark, base)
    idx_dir = os.path.join(base, "_stats_index")
    os.makedirs(idx_dir)
    with open(os.path.join(idx_dir, "part-00000.parquet"), "w") as fh:
        fh.write("not parquet")
    df, n_kept, n_total = read_parquet_pruned(spark, base, {"k": (0, 99)})
    assert n_kept == n_total == 8
    assert df.filter(F.col("k").between(0, 99)).count() == 100


def test_maintenance_path_repairs_corrupt_index(spark, tmp_path):
    """The write-lease counterpart of the reader's degradation: an
    index is derived data, so indexed_band_read REBUILDS an unreadable
    one (torn write, wrong schema) and then prunes normally."""
    import os

    base = str(tmp_path / "tbl")
    _write_kv(spark, base)
    idx_dir = os.path.join(base, "_stats_index")
    os.makedirs(idx_dir)
    with open(os.path.join(idx_dir, "part-00000.parquet"), "w") as fh:
        fh.write("not parquet")
    df, n_kept, n_total = indexed_band_read(spark, base, {"k": (100, 199)})
    assert n_total == 8 and 0 < n_kept < n_total
    assert df.filter(F.col("k").between(100, 199)).count() == 100
    # the repair left a valid index behind: the next probe reuses it
    stamp = os.stat(idx_dir).st_mtime_ns
    indexed_band_read(spark, base, {"k": (0, 99)})
    assert os.stat(idx_dir).st_mtime_ns == stamp


def test_default_reader_generative_parity(spark, tmp_path_factory):
    """read_parquet_pruned mirror of the multi-band generative sweep:
    over correlated/anti-correlated layouts and every band-shape class
    (full-domain, interior, point, empty-above, inverted), the pruned
    read filtered by the predicate must equal the full scan — with the
    index covering k only, so the v band always exercises the
    covered-subset path."""
    base = str(tmp_path_factory.mktemp("reader_gen") / "tbl")
    (
        spark.range(3000)
        .select(
            F.col("id").alias("k"),
            F.when(F.col("id") < 1500, F.col("id") * 2)
            .otherwise((3000 - F.col("id")) * 7)
            .alias("v"),
        )
        .repartitionByRange(10, "k")
        .write.parquet(base)
    )
    write_stats_index(spark, base, ["k"])
    full = spark.read.parquet(base)
    bands_k = [(0, 2999), (100, 220), (2999, 2999), (3000, 4000), (50, 10)]
    bands_v = [(0, 30000), (500, 900), (-5, -1)]
    for bk in bands_k:
        for bv in bands_v:
            df, n_kept, n_total = read_parquet_pruned(
                spark, base, {"k": bk, "v": bv}
            )
            pred = F.col("k").between(*bk) & F.col("v").between(*bv)
            got = df.filter(pred).count()
            exp = full.filter(pred).count()
            assert got == exp, ((bk, bv), n_kept, n_total, got, exp)
            if bk[0] > bk[1]:
                assert n_kept == 0, "inverted covered band keeps nothing"


# --- round-15: per-partition z-span census -------------------------------------


def test_partition_zspan_census_groups_and_classifies(spark, tmp_path):
    """partition_zspan_census laws: files group under their DECODED
    partition-dir value, a file spanning more than half the table's
    key domain is degraded, a tight file is healthy, and the entries
    come back partition-sorted with exact counts."""
    from update_database_by_wind_spark.operators.storage import (
        partition_zspan_census,
    )

    base = str(tmp_path / "t")
    # partition 'a:x' (escapes to m=a%3Ax): four tight quarter files
    # (a HALF split sits exactly on the degraded threshold — span*2
    # == zdom+1 — which is the point of the rule, not a test fixture)
    (
        spark.range(1000)
        .select(F.lit("a:x").alias("m"), F.col("id").alias("z"))
        .repartitionByRange(4, "z")
        .write.partitionBy("m")
        .parquet(base)
    )
    # partition 'b': one tight file + one full-span file
    (
        spark.range(100)
        .select(F.lit("b").alias("m"), (F.col("id") + 400).alias("z"))
        .coalesce(1)
        .write.mode("append")
        .partitionBy("m")
        .parquet(base)
    )
    (
        spark.createDataFrame([("b", 0), ("b", 999)], "m string, z long")
        .coalesce(1)
        .write.mode("append")
        .partitionBy("m")
        .parquet(base)
    )
    zdom, entries = partition_zspan_census(spark, base, "z", "m")
    assert zdom == 999
    assert [e["partition"] for e in entries] == ["a:x", "b"]
    a, b = entries
    assert a["n_files"] == 4 and not a["degraded"]
    assert b["n_files"] == 2
    assert len(b["degraded"]) == 1 and len(b["healthy"]) == 1
    deg = b["degraded"][0]
    assert deg["z_min"] == 0 and deg["z_max"] == 999
    # an unpartitioned file is a loud error, not a silent drop
    flat = str(tmp_path / "flat")
    spark.range(10).select(F.col("id").alias("z")).coalesce(1).write.parquet(
        flat
    )
    import pytest

    with pytest.raises(ValueError, match="no m= path component"):
        partition_zspan_census(spark, flat, "z", "m")
