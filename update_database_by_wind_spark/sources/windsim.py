"""S9: external-API quote-feed source via Spark 4's Python Data Source API.

The reference category's defining ingest is a vendor-terminal call —
``w.wsd(codes, fields, start, end)`` — that returns one daily quote row
per (security, trade_date).  The harness has no network, so this module
implements the same *shape* as a first-class Spark source: a registered
``DataSource`` whose reader plans ONE INPUT PARTITION PER SECURITY (the
unit a vendor API is actually rate-limited and retried on), with each
partition independently producing its security's daily series.  On a
1000-executor cluster that is exactly how a bulk terminal backfill is
parallelized: the driver plans the code list, executors each hold one
API conversation.

The quote values are deterministic integer arithmetic on a portable
base-31 polynomial hash of the security code (the l3h construction), so
the WHOLE feed — not just transforms over it — is replayable in ANSI
SQL and the source earns a full value-hash oracle, unlike a real
network source which could only ever be rows-only.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

_P = 1_000_003
_KNUTH = 2654435761
_MOD = 100_000_007
_BASE_DATE = datetime.date(2024, 1, 1)

DEFAULT_CODES = (
    "600000.SH",
    "600519.SH",
    "000001.SZ",
    "000858.SZ",
    "300750.SZ",
)
DEFAULT_DAYS = 60


def _code_hash(code: str) -> int:
    h = 0
    for c in code:
        h = (h * 31 + ord(c)) % _P
    return h


def _quote(h: int, i: int) -> tuple[int, int]:
    """(close_cents, volume) for day index ``i`` — mod-first so every
    intermediate fits int64 (same overflow discipline as tr_hash_split)."""
    step = ((h * (i + 1)) % _P * _KNUTH) % _MOD
    return 10000 + step % 2000, 1000 + step % 9000


class _CodePartition(InputPartition):
    def __init__(self, code: str, days: int):
        self.code = code
        self.days = days


class WindSimReader(DataSourceReader):
    def __init__(self, options):
        codes = options.get("codes", ",".join(DEFAULT_CODES))
        self._codes = [c for c in codes.split(",") if c]
        self._days = int(options.get("days", DEFAULT_DAYS))

    def partitions(self):
        # one partition per security: the retry/rate-limit unit of a
        # real vendor API, and the natural parallelism of a backfill
        return [_CodePartition(c, self._days) for c in self._codes]

    def read(self, partition):
        h = _code_hash(partition.code)
        for i in range(partition.days):
            cents, volume = _quote(h, i)
            yield (
                partition.code,
                _BASE_DATE + datetime.timedelta(days=i),
                cents / 100.0,
                volume,
            )


class WindSimSource(DataSource):
    """``spark.read.format("windsim").option("codes", "A,B").load()``"""

    @classmethod
    def name(cls) -> str:
        return "windsim"

    def schema(self) -> str:
        return "code string, trade_date date, close double, volume bigint"

    def reader(self, schema) -> WindSimReader:
        return WindSimReader(self.options)


def register(spark: SparkSession) -> None:
    """Idempotent registration (re-registering replaces the entry)."""
    spark.dataSource.register(WindSimSource)


def wsd(
    spark: SparkSession,
    codes: tuple[str, ...] = DEFAULT_CODES,
    days: int = DEFAULT_DAYS,
) -> DataFrame:
    """The category's ``w.wsd(codes, fields, start, end)`` surface: one
    row per (security, trade_date) with close/volume fields."""
    register(spark)
    return (
        spark.read.format("windsim")
        .option("codes", ",".join(codes))
        .option("days", str(days))
        .load()
    )


def oracle_sql(
    codes: tuple[str, ...] = DEFAULT_CODES, days: int = DEFAULT_DAYS
) -> str:
    """DuckDB replay of the feed: same portable hash, same mod-first
    arithmetic, one row per (code, day)."""
    code_list = ", ".join(f"'{c}'" for c in codes)
    return f"""
quotes AS (
  SELECT code,
         DATE '2024-01-01' + CAST(i AS INTEGER) AS trade_date,
         CAST(10000 + (((h * (i + 1)) % {_P}) * {_KNUTH}) % {_MOD} % 2000
              AS DOUBLE) / 100 AS close,
         CAST(1000 + (((h * (i + 1)) % {_P}) * {_KNUTH}) % {_MOD} % 9000
              AS BIGINT) AS volume
  FROM (
    SELECT code,
           list_reduce(list_transform(string_split(code, ''),
                                      c -> unicode(c)),
                       (acc, x) -> (acc * 31 + x) % {_P}) AS h
    FROM (SELECT unnest([{code_list}]) AS code)
  ), UNNEST(range(0, {days})) AS t(i)
)"""
