"""Filter-DSL compiler: every grammar form from the reference
(Extract.py:34-46; get-scores.py:24-28; run-et-etl.py:92,99-106;
schema.py:150 stored form)."""

from datetime import datetime

from etl_ender_turing_spark.functions import compile_filter, parse_filter
from etl_ender_turing_spark.functions.filter_dsl import Term, compile_filter_sql


def test_parse_date_range_with_time():
    t = parse_filter("date_range,2024-06-01,2024-06-02||00:00,12:00")
    assert t == [Term("date_range", ("2024-06-01", "2024-06-02"), "and",
                      ("00:00", "12:00"))]


def test_parse_conjunction_and_or_list():
    t = parse_filter("date_range,2024-06-01,2024-06-02±categories,7,9|or")
    assert t[1] == Term("categories", ("7", "9"), "or")


def test_parse_stored_category_form():
    # '&&[tags,||and|2738|or]' (schema.py:150)
    t = parse_filter("&&[tags,||and|2738|or]")
    assert t == [Term("tags", ("2738",), "or")]


def test_compile_date_range_filters_rows(spark):
    df = spark.createDataFrame(
        [(1, datetime(2024, 6, 1, 8)), (2, datetime(2024, 6, 1, 14)),
         (3, datetime(2024, 6, 3, 8))], "id int, start_dt timestamp")
    pred = compile_filter("date_range,2024-06-01,2024-06-02||00:00,12:00")
    assert [r.id for r in df.filter(pred).collect()] == [1]


def test_compile_in_list(spark):
    df = spark.createDataFrame([(1, 7), (2, 8), (3, 9)], "id int, categories int")
    pred = compile_filter("categories,7,9|or", {"categories": "categories"})
    assert sorted(r.id for r in df.filter(pred).collect()) == [1, 3]


def test_compile_is_scored_manual(spark):
    df = spark.createDataFrame(
        [(1, (0.9, None)), (2, (None, 1.0))],
        "id int, score_details struct<automated_score:double, manual_score:double>")
    pred = compile_filter("is_scored,manual")
    assert [r.id for r in df.filter(pred).collect()] == [2]


def test_compile_reviewers_true(spark):
    df = spark.createDataFrame([(1, [10]), (2, [])], "id int, reviewers array<int>")
    pred = compile_filter("reviewers,true")
    assert [r.id for r in df.filter(pred).collect()] == [1]


def test_compile_multi_value_and_refuses_scalar_column():
    """'tags,a,b|and' on a scalar column must raise, not degrade to isin/OR
    (round-1 VERDICT wrong #2); the bridge-join path handles AND."""
    import pytest

    with pytest.raises(ValueError, match="sessions_matching_stored_filter"):
        compile_filter("tags,5,7|and")
    # single-value |and stays a plain equality — still compiles
    assert compile_filter("tags,5|and") is not None


def test_sql_rendering_matches_semantics():
    sql = compile_filter_sql("date_range,2024-06-01,2024-06-02±event_type,click|or",
                             {"date_range": "ts"})
    assert "ts >= TIMESTAMP '2024-06-01 00:00:00'" in sql
    assert "event_type IN ('click')" in sql


def test_empty_dsl_is_true(spark):
    df = spark.createDataFrame([(1,)], "id int")
    assert df.filter(compile_filter("")).count() == 1


def test_stored_filter_evaluation_semi_joins(spark):
    """'&&[tags,||and|5|or]' evaluated client-side over the bridge."""
    from etl_ender_turing_spark.functions.filter_dsl import (
        sessions_matching_stored_filter,
    )

    sessions = spark.createDataFrame(
        [("s1",), ("s2",), ("s3",)], "id string")
    tags = spark.createDataFrame(
        [("s1", 5), ("s1", 7), ("s2", 7), ("s3", 5), ("s3", 9)],
        "session_id string, tag_id long")

    got = sessions_matching_stored_filter(
        sessions, "&&[tags,||and|5|or]", {"tags": tags})
    assert {r.id for r in got.collect()} == {"s1", "s3"}

    # |and over multiple ids: session must carry ALL of them
    got_and = sessions_matching_stored_filter(
        sessions, "tags,5,7|and", {"tags": tags})
    assert {r.id for r in got_and.collect()} == {"s1"}

    # conjunction of two terms chains semi-joins
    got_conj = sessions_matching_stored_filter(
        sessions, "tags,5|or±tags,9|or", {"tags": tags})
    assert {r.id for r in got_conj.collect()} == {"s3"}
