"""Database sink: staged, set-based MERGE upsert into a SQL store.

The reference's primary Load surface is a database upsert
(ET-ETL-DWH-PY312/ETL/Load.py:63-183): sqlite ``INSERT … ON CONFLICT DO
UPDATE`` (Load.py:113-119) or MSSQL exists-check→UPDATE-else-INSERT
(Load.py:120-162), executed ONE ROW AT A TIME inside a Python loop —
O(rows) statements and round-trips, the reference's load bottleneck.

Spark-first re-expression — the two-step **stage + server-side merge**:

1. *Stage.* Land the (key-deduped) batch in a staging table. At cluster
   scale this is ``df.write.jdbc(url, staging, mode="overwrite")`` —
   executor-parallel, ``numPartitions`` controlled by the caller, no data
   through the driver. In this environment (no JDBC driver jar, sqlite is
   a local file) staging streams Arrow batches via ``toLocalIterator`` —
   same contract, test-scale transport.
2. *Merge.* ONE set-based statement the database executes server-side:
   sqlite ``INSERT INTO t SELECT … FROM staging WHERE true ON CONFLICT
   (key) DO UPDATE SET c = excluded.c`` (the set form of the reference's
   per-row conflict clause); MSSQL/Delta get the ANSI ``MERGE INTO`` from
   :func:`~etl_ender_turing_spark.operators.upsert.merge_sql`. O(1)
   statements per table regardless of batch size.

DDL auto-create (reference ``create_db_tables``, Load.py:74-76 /
utils.py) is derived from the DataFrame schema, with the unique key as a
table constraint so the conflict target exists.
"""

from __future__ import annotations

import sqlite3
from contextlib import closing

from pyspark.sql import DataFrame, types as T

from ..operators.upsert import dedup_latest

_SQLITE_TYPES = {
    T.LongType: "INTEGER", T.IntegerType: "INTEGER", T.ShortType: "INTEGER",
    T.ByteType: "INTEGER", T.BooleanType: "INTEGER",
    T.DoubleType: "REAL", T.FloatType: "REAL",
    T.StringType: "TEXT", T.TimestampType: "TEXT", T.DateType: "TEXT",
    T.BinaryType: "BLOB", T.DecimalType: "NUMERIC",
}


def sqlite_type(dt: T.DataType) -> str:
    """Map a Spark type to a sqlite column type; nested types store as
    JSON TEXT (the reference flattens everything before load, so nested
    columns only appear on extension tables)."""
    return _SQLITE_TYPES.get(type(dt), "TEXT")


def create_table_sql(table: str, schema: T.StructType,
                     key: tuple[str, ...] | list[str]) -> str:
    """DDL with the unique key as a constraint — the conflict target for
    the set-based upsert (reference auto-create: Load.py:74-76)."""
    cols = ", ".join(f"{f.name} {sqlite_type(f.dataType)}" for f in schema.fields)
    uniq = ", ".join(key)
    return f"CREATE TABLE IF NOT EXISTS {table} ({cols}, UNIQUE ({uniq}))"


def sqlite_merge_sql(table: str, staging: str, columns: list[str],
                     key: tuple[str, ...] | list[str]) -> str:
    """The ONE server-side merge statement (set form of Load.py:113-119).

    ``WHERE true`` disambiguates the upsert clause from a join condition
    (required by the sqlite parser for INSERT…SELECT…ON CONFLICT).
    """
    collist = ", ".join(columns)
    sets = ", ".join(f"{c} = excluded.{c}" for c in columns if c not in key)
    if not sets:  # all columns are key columns — nothing to update
        return (f"INSERT INTO {table} ({collist}) "
                f"SELECT {collist} FROM {staging} WHERE true "
                f"ON CONFLICT ({', '.join(key)}) DO NOTHING")
    return (f"INSERT INTO {table} ({collist}) "
            f"SELECT {collist} FROM {staging} WHERE true "
            f"ON CONFLICT ({', '.join(key)}) DO UPDATE SET {sets}")


def _to_sqlite_value(v):
    import datetime as _dt

    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat(sep=" ") if isinstance(v, _dt.datetime) else v.isoformat()
    if hasattr(v, "asDict"):        # pyspark Row (struct column) -> JSON
        import json

        return json.dumps(v.asDict(recursive=True), default=str)
    if isinstance(v, (list, dict)):
        import json

        return json.dumps(v, default=str)
    if isinstance(v, bytearray):
        return bytes(v)
    return v


def upsert_sqlite(source: DataFrame, db_path: str, table: str,
                  key: tuple[str, ...] | list[str],
                  order_col: str | None = None,
                  batch_size: int = 10_000) -> int:
    """Idempotent staged upsert of ``source`` into sqlite ``table``.

    Same semantics as ``upsert_parquet`` (intra-batch last-write-wins
    dedup, then MERGE against the live table), delivered as stage + one
    server-side statement. Returns the number of staged rows.

    Transport is ``toLocalIterator`` (partition-at-a-time through the
    driver) — sqlite is a driver-local file, so driver transport is
    inherent to the store, not a scale decision; the cluster-scale path
    swaps step 1 for ``df.write.jdbc`` and step 2 runs unchanged.
    """
    src = dedup_latest(source, key, order_col)
    cols = src.columns
    staging = f"_staging_{table}"
    n = 0
    with closing(sqlite3.connect(db_path)) as con:
        con.execute(create_table_sql(table, src.schema, key))
        con.execute(f"DROP TABLE IF EXISTS {staging}")
        con.execute(create_table_sql(staging, src.schema, key))
        placeholders = ", ".join("?" for _ in cols)
        ins = f"INSERT INTO {staging} ({', '.join(cols)}) VALUES ({placeholders})"
        buf = []
        for row in src.toLocalIterator(prefetchPartitions=True):
            buf.append(tuple(_to_sqlite_value(v) for v in row))
            if len(buf) >= batch_size:
                con.executemany(ins, buf)
                n += len(buf)
                buf.clear()
        if buf:
            con.executemany(ins, buf)
            n += len(buf)
        if n:
            con.execute(sqlite_merge_sql(table, staging, cols, key))
        con.execute(f"DROP TABLE {staging}")
        con.commit()
    return n


def read_sqlite(spark, db_path: str, table: str) -> DataFrame:
    """Round-trip helper for parity tests: sqlite table → DataFrame."""
    with closing(sqlite3.connect(db_path)) as con:
        cur = con.execute(f"SELECT * FROM {table}")
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
    if not rows:
        return spark.createDataFrame([], ", ".join(f"{c} string" for c in cols))
    return spark.createDataFrame(rows, cols)


# ---------------------------------------------------------------------------
# Second executed dialect: ANSI exists→UPDATE-else-INSERT on DuckDB
# ---------------------------------------------------------------------------

def ansi_upsert_sql(table: str, staging: str, columns: list[str],
                    key: tuple[str, ...] | list[str]) -> tuple[str, ...]:
    """The reference's MSSQL upsert (Load.py:120-162: per-row exists-check
    → UPDATE else INSERT) as TWO set-based ANSI statements — no
    dialect-specific ON CONFLICT, so the same pair runs on DuckDB, MSSQL,
    and Postgres (``UPDATE … FROM`` + ``INSERT … WHERE NOT EXISTS``).
    Update first, then insert: a staged row either matches an existing key
    (updated in statement 1, excluded by NOT EXISTS in statement 2) or is
    new (untouched by 1, inserted by 2)."""
    collist = ", ".join(columns)
    on = " AND ".join(f"{table}.{k} = s.{k}" for k in key)
    on_t = " AND ".join(f"t.{k} = s.{k}" for k in key)
    sets = ", ".join(f"{c} = s.{c}" for c in columns if c not in key)
    ins = (f"INSERT INTO {table} ({collist}) SELECT {collist} "
           f"FROM {staging} s WHERE NOT EXISTS "
           f"(SELECT 1 FROM {table} t WHERE {on_t})")
    if not sets:   # all columns are key columns — nothing to update
        return (ins,)
    return (f"UPDATE {table} SET {sets} FROM {staging} s WHERE {on}", ins)


def upsert_duckdb(source: DataFrame, db_path: str, table: str,
                  key: tuple[str, ...] | list[str],
                  order_col: str | None = None) -> int:
    """Executed upsert against DuckDB — the second SQL dialect for the
    merge surface (sqlite runs the ON CONFLICT form; DuckDB runs the ANSI
    exists→UPDATE-else-INSERT pair the reference uses on MSSQL).

    Staging is an Arrow-registered view (zero-copy into DuckDB); the
    merge is the two set-based statements from :func:`ansi_upsert_sql` in
    ONE transaction. Same semantics as :func:`upsert_sqlite`: intra-batch
    last-write-wins dedup, idempotent on replay. Returns staged rows.
    """
    import duckdb

    src = dedup_latest(source, key, order_col)
    cols = src.columns
    pdf = src.toPandas()   # driver-local store — same transport note as sqlite
    con = duckdb.connect(db_path)
    try:
        ddl_cols = ", ".join(
            f"{f.name} {_DUCKDB_TYPES.get(type(f.dataType), 'VARCHAR')}"
            for f in src.schema.fields)
        con.execute(f"CREATE TABLE IF NOT EXISTS {table} ({ddl_cols}, "
                    f"UNIQUE ({', '.join(key)}))")
        con.register("_staging_df", pdf)
        con.execute("BEGIN")
        for stmt in ansi_upsert_sql(table, "_staging_df", cols, key):
            con.execute(stmt)
        con.execute("COMMIT")
        con.unregister("_staging_df")
    finally:
        con.close()
    return len(pdf)


_DUCKDB_TYPES = {
    T.LongType: "BIGINT", T.IntegerType: "INTEGER", T.ShortType: "SMALLINT",
    T.ByteType: "TINYINT", T.BooleanType: "BOOLEAN",
    T.DoubleType: "DOUBLE", T.FloatType: "FLOAT",
    T.StringType: "VARCHAR", T.TimestampType: "TIMESTAMP",
    T.DateType: "DATE", T.BinaryType: "BLOB",
}


def anonymize_db_url(url: str) -> str:
    """Credential-masked form of a database/JDBC URL for logs and error
    messages (reference parity: ET-ETL-DWH-PY312/ETL/utils.py:256-266's
    ``anonymize_database_url``): the password segment of the userinfo is
    replaced with ``****`` — ``postgres://etl:s3cret@db:5432/dwh`` logs
    as ``postgres://etl:****@db:5432/dwh``. URLs with no userinfo pass
    through unchanged. Any surface that prints a connection target (the
    JDBC staging writer's diagnostics, run_etl banners) must route the
    URL through here first — credentials in plaintext logs outlive the
    process in every log aggregator."""
    from urllib.parse import urlsplit, urlunsplit

    if "@" not in url:
        return url
    parts = urlsplit(url)
    userinfo, _, hostinfo = parts.netloc.rpartition("@")
    masked = f"{userinfo.split(':', 1)[0]}:****@{hostinfo}"
    return urlunsplit(parts._replace(netloc=masked))
