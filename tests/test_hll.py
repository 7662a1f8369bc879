"""From-scratch HyperLogLog (operators/hll.py): accuracy envelope,
insensitivity to duplicates, register bound, cross-engine equality."""

from __future__ import annotations

from pyspark.sql import Row

from etl_ender_turing_spark.operators import hll


def test_estimate_within_hll_error_envelope(spark):
    df = spark.createDataFrame([Row(k=i) for i in range(5000)])
    r = hll.hll_estimate(df, "k").collect()[0]
    assert r.n_exact == 5000
    # raw HLL at m=256: sigma ~ 1.04/sqrt(256) = 6.5%; allow 4 sigma
    assert r.rel_err6 < 0.26
    assert r.n_registers_set <= hll.HLL_M


def test_duplicates_do_not_move_the_estimate(spark):
    base = [Row(k=i % 400) for i in range(400)]
    df1 = spark.createDataFrame(base)
    df2 = spark.createDataFrame(base * 7)       # same keys, 7x rows
    a = hll.hll_estimate(df1, "k").collect()[0]
    b = hll.hll_estimate(df2, "k").collect()[0]
    assert a.hll_raw6 == b.hll_raw6
    assert a.n_exact == b.n_exact == 400


def test_matches_duckdb_bit_for_bit(spark):
    import duckdb

    df = spark.createDataFrame([Row(k=i * 13) for i in range(1234)])
    got = tuple(hll.hll_estimate(df, "k").collect()[0])
    sql = hll.hll_estimate_sql(
        "(SELECT unnest(generate_series(0, 1233)) * 13 AS k)", "k")
    exp = duckdb.connect().execute(sql).fetchone()
    assert got == exp


def test_merge_equals_global_always(spark):
    """Sharded registers MAX-merge into exactly the global sketch."""
    df = spark.createDataFrame(
        [Row(k=i % 700, p=f"shard{i % 9}") for i in range(3000)])
    r = hll.hll_merge_check(df, "k", "p").collect()[0]
    assert r.n_parts == 9
    assert bool(r.merge_exact) and r.merged_raw6 == r.global_raw6
