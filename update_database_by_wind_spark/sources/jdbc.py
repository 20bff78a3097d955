"""JDBC source/sink/upsert (SURVEY.md §2.1 S4–S6, §2.9).

This is the driver-mandated approach for the reference's database
updates ("Spark JDBC connector for database updates", BASELINE.json).

* **S4 partitioned read** — ``spark.read.jdbc`` with
  (column, lowerBound, upperBound, numPartitions): each executor opens
  its own connection and reads one key range, so a 100 TB-adjacent
  dimension snapshot loads in parallel instead of through one socket.
* **S5 batch sink** — ``df.write.jdbc`` append/overwrite with
  ``batchsize`` (executemany batching per partition).
* **S6 upsert** — Spark's JDBC writer has no native upsert, so:
  stage the DataFrame into a scratch table (parallel S5 write), then
  issue ONE server-side set-based ``MERGE INTO`` from stage to target.
  All row matching happens inside the database — no per-row
  round-trips, no driver-side data movement; the MERGE is O(stage)
  work on the server regardless of target size.  Works on any MERGE-
  capable engine (Derby ≥10.11 — bundled with Spark and used in
  tests — plus Postgres 15+, SQL Server, Oracle; for older
  Postgres/MySQL swap the MERGE text for INSERT … ON CONFLICT /
  ON DUPLICATE KEY via the ``merge_sql`` hook).

Upsert idempotence (U4): dedupe the source on the PK first
(keep-latest) so task retries and re-runs are no-ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_jdbc_partitioned(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int = 8,
    driver: str | None = None,
) -> DataFrame:
    """S4: range-partitioned parallel JDBC read."""
    props = {"driver": driver} if driver else {}
    return spark.read.jdbc(
        url=url,
        table=table,
        column=partition_column,
        lowerBound=lower_bound,
        upperBound=upper_bound,
        numPartitions=num_partitions,
        properties=props,
    )


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 10_000,
    driver: str | None = None,
    column_types: str | None = None,
) -> None:
    """S5: batch JDBC sink (append/overwrite), executemany-batched.

    ``column_types`` forwards ``createTableColumnTypes`` — needed when
    the default string mapping is unusable downstream (Spark maps
    StringType to CLOB on Derby, and CLOB columns cannot appear in a
    MERGE ON comparison; declare them VARCHAR instead)."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    writer = writer.option("batchsize", str(batchsize))
    if driver:
        writer = writer.option("driver", driver)
    if column_types:
        writer = writer.option("createTableColumnTypes", column_types)
    writer.mode(mode).save()


def _execute_update(spark: SparkSession, url: str, sql: str) -> None:
    """Run one DDL/DML statement through the JVM's DriverManager."""
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)  # noqa: SLF001
    try:
        stmt = conn.createStatement()
        try:
            stmt.executeUpdate(sql)
        finally:
            stmt.close()
    finally:
        conn.close()


def default_merge_sql(
    target: str, stage: str, pk_cols: list[str], value_cols: list[str]
) -> str:
    """ANSI/Derby MERGE from stage into target (server-side set-based).

    Column identifiers are double-quoted: Spark's JDBC writer creates
    case-preserved quoted columns, while unquoted names fold to upper
    case in Derby/ANSI databases — unquoted MERGE text would not
    resolve against the written schema.
    """

    def q(c: str) -> str:
        return f'"{c}"'

    on = " AND ".join(f"t.{q(c)} = s.{q(c)}" for c in pk_cols)
    set_clause = ", ".join(f"{q(c)} = s.{q(c)}" for c in value_cols)
    cols = ", ".join(q(c) for c in pk_cols + value_cols)
    vals = ", ".join(f"s.{q(c)}" for c in pk_cols + value_cols)
    return (
        f"MERGE INTO {target} t USING {stage} s ON {on} "
        f"WHEN MATCHED THEN UPDATE SET {set_clause} "
        f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})"
    )


def cdc_merge_sql(
    target: str,
    stage: str,
    pk_cols: list[str],
    value_cols: list[str],
    change_col: str = "change_type",
    delete_value: str = "delete",
) -> str:
    """CDC-aware ANSI/Derby MERGE: applies an insert/update/delete
    change feed in ONE server-side set-based statement.

    The stage table carries ``change_col`` alongside the row payload;
    conditional WHEN clauses route each staged row — matched deletes
    DELETE, matched non-deletes UPDATE, unmatched non-deletes INSERT
    (an unmatched delete is a no-op, the correct idempotent re-run
    behavior: re-applying a feed whose deletes already landed changes
    nothing).  ``value_cols`` are the target's payload columns and must
    NOT include ``change_col`` — the marker stays in the stage."""

    def q(c: str) -> str:
        return f'"{c}"'

    on = " AND ".join(f"t.{q(c)} = s.{q(c)}" for c in pk_cols)
    set_clause = ", ".join(f"{q(c)} = s.{q(c)}" for c in value_cols)
    cols = ", ".join(q(c) for c in pk_cols + value_cols)
    vals = ", ".join(f"s.{q(c)}" for c in pk_cols + value_cols)
    is_del = f"s.{q(change_col)} = '{delete_value}'"
    not_del = f"s.{q(change_col)} <> '{delete_value}'"
    return (
        f"MERGE INTO {target} t USING {stage} s ON {on} "
        f"WHEN MATCHED AND {is_del} THEN DELETE "
        f"WHEN MATCHED AND {not_del} THEN UPDATE SET {set_clause} "
        f"WHEN NOT MATCHED AND {not_del} THEN INSERT ({cols}) VALUES ({vals})"
    )


def upsert_jdbc(
    df: DataFrame,
    url: str,
    target_table: str,
    pk_cols: list[str],
    stage_table: str | None = None,
    merge_sql: str | None = None,
    order_col: str | None = None,
    column_types: str | None = None,
) -> None:
    """S6/U2: upsert via stage-then-MERGE.

    1. keep-latest dedup on ``pk_cols`` (U4 idempotence; ``order_col``
       decides the winner; without one the winner is still deterministic —
       row_number ordered by every value column descending, nulls last — so
       re-runs always stage the same row for duplicate keys),
    2. parallel write into the stage table (overwrite),
    3. one server-side MERGE into the target.
    """
    stage_table = stage_table or f"{target_table}_stage"
    value_cols = [c for c in df.columns if c not in pk_cols]
    if order_col:
        order_exprs = [F.col(order_col).desc()]
    else:
        # deterministic tiebreak independent of partition order:
        # dropDuplicates(pk) would keep whichever row a task saw first
        order_exprs = [F.col(c).desc_nulls_last() for c in value_cols]
    if order_exprs:
        w = Window.partitionBy(*pk_cols).orderBy(*order_exprs)
        df = (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    else:  # pk-only frame: duplicate rows are identical, any one wins
        df = df.dropDuplicates(pk_cols)
    write_jdbc(df, url, stage_table, mode="overwrite", column_types=column_types)
    sql = merge_sql or default_merge_sql(
        target_table, stage_table, pk_cols, value_cols
    )
    _execute_update(df.sparkSession, url, sql)


def foreach_batch_upsert(
    url: str, target_table: str, pk_cols: list[str], order_col: str | None = None
):
    """S8/ST9: adapter making ``upsert_jdbc`` a streaming sink —
    ``stream.writeStream.foreachBatch(foreach_batch_upsert(...))``.
    Each micro-batch stages and merges; checkpointing + idempotent
    MERGE give effectively-once end-to-end."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_jdbc(batch_df, url, target_table, pk_cols, order_col=order_col)

    return _sink
