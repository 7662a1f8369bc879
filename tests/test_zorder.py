"""Z-order layout (operators/zorder.py): Morton interleave correctness
vs a Python reference, audit invariants."""

from __future__ import annotations

from pyspark.sql import Row

from etl_ender_turing_spark.operators import zorder as zo


def _morton(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_matches_python_reference(spark):
    rows = [Row(x=x, y=y) for x in (0, 1, 5, 37, 255)
            for y in (0, 2, 9, 128, 255)]
    df = spark.createDataFrame(rows).withColumn("z", zo.zvalue("x", "y"))
    for r in df.collect():
        assert r.z == _morton(r.x, r.y), (r.x, r.y)
    # locality: the unit square's corners map to the classic N-curve
    assert [_morton(*p) for p in ((0, 0), (1, 0), (0, 1), (1, 1))] \
        == [0, 1, 2, 3]


def test_audit_invariants(spark):
    rows = [Row(k=i) for i in range(4000)]
    df = (spark.createDataFrame(rows)
          .selectExpr("CAST(k % 256 AS BIGINT) AS x",
                      "CAST((k * 37) % 256 AS BIGINT) AS y"))
    r = zo.layout_pruning_audit(df, "x", "y", 16, 31, 32, 63).collect()[0]
    assert r.n_rows == 4000
    assert 0 < r.n_files <= zo.N_FILES
    # zone maps can only over-scan, never miss: every hit row lives in
    # a scanned file, so scanned counts are >= 1 when hits exist
    assert r.n_hit_rows > 0
    assert 1 <= r.z_files_scanned <= r.n_files
    assert 1 <= r.x_files_scanned <= r.n_files
    # the 2-D box prunes better (or no worse) under the z layout
    assert r.z_files_scanned <= r.x_files_scanned


def test_audit_agrees_with_duckdb(spark):
    import duckdb

    rows = [Row(k=i) for i in range(1000)]
    df = (spark.createDataFrame(rows)
          .selectExpr("CAST(k % 256 AS BIGINT) AS x",
                      "CAST((k * k) % 256 AS BIGINT) AS y"))
    got = zo.layout_pruning_audit(df, "x", "y", 8, 23, 100, 163) \
        .collect()[0]
    src = ("SELECT CAST(g % 256 AS BIGINT) AS x,"
           " CAST((g * g) % 256 AS BIGINT) AS y"
           " FROM (SELECT unnest(generate_series(0, 999)) AS g)")
    exp = duckdb.connect().execute(
        zo.layout_pruning_audit_sql(src, "x", "y", 8, 23, 100, 163)) \
        .fetchone()
    assert (got.n_rows, got.n_files, got.z_files_scanned,
            got.x_files_scanned, got.n_hit_rows) == exp
