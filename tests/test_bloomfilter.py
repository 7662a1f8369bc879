"""Bloom-filter scan pruning (operators/bloomfilter.py): no false
negatives ever, false positives appear as the filter saturates, the
probe is a pure JVM expression."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from etl_ender_turing_spark.operators import bloomfilter as bf


def test_no_false_negatives_and_some_false_positives(spark):
    dim = spark.createDataFrame([Row(k=i * 3) for i in range(400)])
    words = bf.build_bloom(dim, "k")
    probe = spark.createDataFrame([Row(k=i) for i in range(3000)])
    passed = {r.k for r in probe.filter(bf.bloom_member("k", words))
              .collect()}
    members = {i * 3 for i in range(400)}
    assert members <= passed                       # zero false negatives
    fps = passed - members
    # 400 keys x 3 hashes into 4096 bits saturates ~25% of the filter:
    # the 2600 non-members must show a nonzero, but small, FP set
    assert 0 < len(fps) < 300


def test_empty_dim_rejects_everything(spark):
    dim = spark.createDataFrame([], "k long")
    words = bf.build_bloom(dim, "k")
    assert words == [0] * (bf.N_BITS // 32)
    probe = spark.createDataFrame([Row(k=i) for i in range(50)])
    assert probe.filter(bf.bloom_member("k", words)).count() == 0


def test_member_expression_stays_jvm_side(spark):
    dim = spark.createDataFrame([Row(k=1), Row(k=2)])
    words = bf.build_bloom(dim, "k")
    probe = spark.createDataFrame([Row(k=i) for i in range(10)])
    plan = (probe.filter(bf.bloom_member("k", words))
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan and "Exchange" not in plan


def test_word_count_guard():
    with pytest.raises(ValueError):
        bf.bloom_member("k", [0] * 5)


def test_spark_and_duckdb_words_agree(spark):
    """The build aggregate and the oracle's relational fold produce the
    identical 128 words for the same keys."""
    import duckdb

    dim = spark.createDataFrame([Row(k=i * 7) for i in range(100)])
    words = bf.build_bloom(dim, "k")
    con = duckdb.connect()
    sql = bf.bloom_words_sql(
        "SELECT unnest(generate_series(0, 99)) * 7 AS k", "k")
    got = {r[0]: r[1] for r in con.execute(sql).fetchall()}
    assert [got[s] for s in range(bf.N_BITS // 32)] == words


def test_persisted_words_roundtrip(spark, tmp_path):
    from pyspark.sql import Row

    dim = spark.createDataFrame([Row(k=i * 11) for i in range(200)])
    direct = bf.build_bloom(dim, "k")
    path = str(tmp_path / "bloom_store")
    bf.bloom_words_df(dim, "k").write.parquet(path)
    assert bf.words_from_store(spark.read.parquet(path)) == direct
