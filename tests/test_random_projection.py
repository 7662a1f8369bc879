"""Cross-engine pin of the JL sign projection's BIGINT grid-unit fold
(operators/similarity.random_projection vs its DuckDB oracle SQL) on
hand-built vectors that stress exactly what the catalog fixture can't:
negative sums, near-bound magnitudes, and grid roundings that land next
to the half-micro tie line — plus the loud guard on the |v_i| <= 8000
exactness bound (past it Spark's BIGINT accumulator would wrap silently
while DuckDB's HUGEINT SUM would not)."""

from __future__ import annotations

import duckdb
import pytest

from etl_ender_turing_spark.operators import similarity as sim


def _spark_rows(df, k, max_dim):
    return sorted(
        (r.vec_id, r.j, r.y_micro)
        for r in sim.random_projection(df, k=k, max_dim=max_dim)
        .collect())


def _duck_rows(parquet_path, k, max_dim):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW emb AS"
                f" SELECT * FROM '{parquet_path}/*.parquet'")
    return sorted(map(tuple, con.execute(
        sim.random_projection_sql("emb", k=k, max_dim=max_dim))
        .fetchall()))


def test_random_projection_cross_engine_exact(spark, tmp_path):
    rows = [
        # plain mixed-sign vector
        (1, [0.5, -0.25, 0.125, -0.0625]),
        # all-negative: the fold must carry NEGATIVE partial sums
        (2, [-1.0, -1.0, -1.0, -1.0]),
        # near the documented 8000 bound (|term| ~ 8e15 < 2^53)
        (3, [7999.999, -7999.999, 3.14159265358979, -2.718281828]),
        # magnitudes straddling the 1e-12 grid and half-micro tie line
        (4, [1.0000005e-6, -5.0e-7, 2.5e-7, 0.0]),
        # a classic non-representable double sum
        (5, [0.1, 0.2, 0.30000000000000004, -0.7]),
        # short vector (ragged lengths exercise per-row sequence bounds)
        (6, [42.0]),
    ]
    df = spark.createDataFrame(rows,
                               "vec_id long, embedding array<double>")
    p = str(tmp_path / "emb_parquet")
    df.write.mode("overwrite").parquet(p)
    got = _spark_rows(spark.read.parquet(p), k=4, max_dim=8)
    exp = _duck_rows(p, k=4, max_dim=8)
    assert got == exp
    assert len(got) == len(rows) * 4
    # negative outputs actually occurred (the sign path is exercised)
    assert any(y < 0 for _, _, y in got)


def test_random_projection_bound_guard_raises(spark):
    df = spark.createDataFrame([(1, [9000.0, 1.0])],
                               "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="8000 exactness bound"):
        sim.random_projection(df, k=2, max_dim=4).collect()


def test_random_projection_null_elements_stay_null(spark):
    """A NULL element keeps its row's projection NULL-free semantics
    unchanged: the guard must not trip on NULLs (TRUE AND NULL would
    fail assert_true) and the fold still yields NULL for that vector."""
    df = spark.createDataFrame(
        [(1, [1.0, None, 2.0]), (2, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<double>")
    out = {(r.vec_id, r.j): r.y_micro
           for r in sim.random_projection(df, k=2, max_dim=4).collect()}
    assert all(v is None for (i, _), v in out.items() if i == 1)
    assert all(v is not None for (i, _), v in out.items() if i == 2)
