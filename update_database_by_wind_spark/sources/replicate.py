"""Scale-up fixture replication (bench.py's second scale point).

Builds an N×-scale copy of an sf-dir by unioning N key-shifted copies
of each table: every copy offsets the table's key columns by
``i * stride``, so foreign-key relationships (orders↔lineitem,
customer↔orders, docs↔embeddings) replicate consistently and join
selectivities stay proportional — the join/agg plans see genuinely
more *distinct* keys, not just duplicated rows.  The fixed dimension
tables (region, nation) are copied unshifted, exactly like TPC-H's
constant dimensions.

DuckDB does the rewrite: it preserves parquet TIMESTAMP(NANOS)
columns (events.ts) and writes single-file tables, so the replicas
are bit-compatible with both the Spark loaders (sources/tables.py
nanosAsLong path) and the DuckDB oracle harness.
"""

from __future__ import annotations

import os

from update_database_by_wind_spark.sources.tables import TABLES

# key columns shifted per copy; tables absent here replicate unshifted
_OFFSET_COLS: dict[str, tuple[str, ...]] = {
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


def replicate_sf(
    src_dir: str, dst_dir: str, copies: int = 10, stride: int = 1_000_000_000
) -> str:
    """Materialize ``copies``× ``src_dir`` into ``dst_dir`` (idempotent:
    existing table files are kept, so repeated bench runs reuse the
    replica — but a replica older than its source is rebuilt, because
    the harness regenerates the fixture corpus between rounds and a
    stale replica would carry the previous round's schema/encoding).
    Returns ``dst_dir``."""
    import duckdb

    os.makedirs(dst_dir, exist_ok=True)
    con = duckdb.connect()
    try:
        for t in TABLES:
            src = f"{src_dir}/{t}.parquet"
            dst = f"{dst_dir}/{t}.parquet"
            if os.path.exists(dst) and (
                os.path.getmtime(dst) >= os.path.getmtime(src)
            ):
                continue
            cols = [
                r[0]
                for r in con.execute(
                    f"DESCRIBE SELECT * FROM read_parquet('{src}')"
                ).fetchall()
            ]
            off = set(_OFFSET_COLS.get(t, ()))
            if off:
                sel = ", ".join(
                    f"({c} + i * {stride}) AS {c}" if c in off else c
                    for c in cols
                )
                q = (
                    f"SELECT {sel} FROM read_parquet('{src}'),"
                    f" range({copies}) AS r(i)"
                )
            else:
                q = f"SELECT * FROM read_parquet('{src}')"
            tmp = dst + ".tmp"
            con.execute(f"COPY ({q}) TO '{tmp}' (FORMAT PARQUET)")
            os.replace(tmp, dst)
    finally:
        con.close()
    return dst_dir
