"""Z-order (Morton) data layout — multi-dimensional clustering for
scan pruning, the lakehouse OPTIMIZE ZORDER BY shape.

Why it exists at 100 TB: file-level min/max zone maps only prune what
the physical sort clusters. Sorting by one column makes its zone maps
tight and every other column's useless; interleaving the bits of two
(or more) key columns gives every participating column
partially-sorted locality, so a predicate box on ANY of them skips
most files. The engine's job is (a) the Morton key as a pure JVM
expression the writer sorts/partitions by, and (b) the zone-map audit
that PROVES the pruning win numerically instead of asserting it.

Cross-engine shape: the bit interleave is integer arithmetic — Spark
evaluates it as one constant-length ``aggregate`` fold (scalar, no
shuffle, codegen'd), DuckDB as a generate_series sum — so file
assignments, per-file zone maps, and files-scanned counts certify
value-exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

Z_BITS = 8          # bits per dimension → 16-bit Morton keys
N_FILES = 64        # simulated file count for the layout audit


def zvalue_spark_sql(x: str, y: str, bits: int = Z_BITS) -> str:
    """Spark-SQL Morton interleave of two ``bits``-bit non-negative
    ints: x occupies even bit positions, y odd."""
    return (f"aggregate(sequence(0, {bits - 1}), CAST(0 AS BIGINT),"
            f" (acc, i) -> acc"
            f" + (shiftright(CAST({x} AS BIGINT), i) & 1)"
            f"   * shiftleft(CAST(1 AS BIGINT), 2 * i)"
            f" + (shiftright(CAST({y} AS BIGINT), i) & 1)"
            f"   * shiftleft(CAST(1 AS BIGINT), 2 * i + 1))")


def zvalue_duck_sql(x: str, y: str, bits: int = Z_BITS) -> str:
    return (f"(SELECT CAST(SUM("
            f"  (({x} >> g.i) & 1) * (CAST(1 AS BIGINT) << (2 * g.i))"
            f" + (({y} >> g.i) & 1) * (CAST(1 AS BIGINT) << (2 * g.i + 1))"
            f") AS BIGINT)"
            f" FROM (SELECT unnest(generate_series(0, {bits - 1})) AS i)"
            f" g)")


def zvalue(x: Column | str, y: Column | str, bits: int = Z_BITS) -> Column:
    x = x if isinstance(x, str) else x._jc.toString()
    y = y if isinstance(y, str) else y._jc.toString()
    return F.expr(zvalue_spark_sql(x, y, bits))


def layout_pruning_audit(df: DataFrame, x_col: str, y_col: str,
                         x_lo: int, x_hi: int, y_lo: int, y_hi: int,
                         bits: int = Z_BITS,
                         n_files: int = N_FILES) -> DataFrame:
    """One-row report: files a box predicate must scan under a Z-order
    layout vs a single-column (x-sorted) layout of the SAME data into
    the SAME file count, decided purely by per-file min/max zone maps —
    the exact skipping logic a parquet reader applies. Columns:
    (n_rows, n_files, z_files_scanned, x_files_scanned, n_hit_rows).

    Both layouts assign rows to files by equal key ranges (z div
    span vs x div span); the audit aggregates each file's zone map
    (min/max of both columns) and counts files whose box overlap is
    non-empty. Two tiny aggregates over the corpus — the audit itself
    is a layout decision tool, run on a sample or a partition at
    production scale.

    Precondition: ``0 <= x, y < 2**bits`` for every row. The Morton key
    interleaves only the low ``bits`` bits, so wider inputs would skew
    the z-vs-x comparison silently; both file ids therefore use integer
    ``div`` (exact for all BIGINT, unlike float division)."""
    z_span = (1 << (2 * bits)) // n_files
    x_span = max(1, (1 << bits) // n_files)
    keyed = df.select(
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
        F.expr(f"({zvalue_spark_sql(x_col, y_col, bits)})"
               f" div {z_span}").alias("zfile"),
        F.expr(f"CAST({x_col} AS BIGINT) div {x_span}").alias("xfile"))

    def scanned(file_col: str) -> DataFrame:
        zm = keyed.groupBy(file_col).agg(
            F.min("x").alias("x_min"), F.max("x").alias("x_max"),
            F.min("y").alias("y_min"), F.max("y").alias("y_max"))
        return zm.agg(F.sum(
            ((F.col("x_min") <= x_hi) & (F.col("x_max") >= x_lo)
             & (F.col("y_min") <= y_hi) & (F.col("y_max") >= y_lo))
            .cast("long")).alias(f"{file_col}s_scanned"))

    totals = keyed.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("zfile").alias("n_files"),
        F.sum(((F.col("x").between(x_lo, x_hi))
               & (F.col("y").between(y_lo, y_hi))).cast("long"))
        .alias("n_hit_rows"))
    return (totals.crossJoin(scanned("zfile")
                             .withColumnRenamed("zfiles_scanned",
                                                "z_files_scanned"))
            .crossJoin(scanned("xfile")
                       .withColumnRenamed("xfiles_scanned",
                                          "x_files_scanned"))
            .select("n_rows", "n_files", "z_files_scanned",
                    "x_files_scanned", "n_hit_rows"))


def layout_pruning_audit_sql(source_sql: str, x: str, y: str,
                             x_lo: int, x_hi: int, y_lo: int, y_hi: int,
                             bits: int = Z_BITS,
                             n_files: int = N_FILES) -> str:
    """DuckDB oracle for :func:`layout_pruning_audit` over a
    (x, y)-producing SELECT."""
    z_span = (1 << (2 * bits)) // n_files
    x_span = max(1, (1 << bits) // n_files)
    z = zvalue_duck_sql("x", "y", bits)
    box = (f"x_min <= {x_hi} AND x_max >= {x_lo}"
           f" AND y_min <= {y_hi} AND y_max >= {y_lo}")
    return f"""
    WITH src AS ({source_sql}),
    keyed AS (
      SELECT x, y, {z} // {z_span} AS zfile, x // {x_span} AS xfile
      FROM src
    ),
    zzm AS (SELECT zfile, MIN(x) AS x_min, MAX(x) AS x_max,
                   MIN(y) AS y_min, MAX(y) AS y_max
            FROM keyed GROUP BY 1),
    xzm AS (SELECT xfile, MIN(x) AS x_min, MAX(x) AS x_max,
                   MIN(y) AS y_min, MAX(y) AS y_max
            FROM keyed GROUP BY 1),
    t AS (SELECT COUNT(*) AS n_rows, COUNT(DISTINCT zfile) AS n_files,
                 CAST(SUM(CASE WHEN x BETWEEN {x_lo} AND {x_hi}
                                AND y BETWEEN {y_lo} AND {y_hi}
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_hit_rows
          FROM keyed)
    SELECT t.n_rows, t.n_files,
           (SELECT CAST(SUM(CASE WHEN {box} THEN 1 ELSE 0 END) AS BIGINT)
            FROM zzm) AS z_files_scanned,
           (SELECT CAST(SUM(CASE WHEN {box} THEN 1 ELSE 0 END) AS BIGINT)
            FROM xzm) AS x_files_scanned,
           t.n_hit_rows
    FROM t
    """


__all__ = ["zvalue", "zvalue_spark_sql", "zvalue_duck_sql",
           "layout_pruning_audit", "layout_pruning_audit_sql",
           "Z_BITS", "N_FILES"]
