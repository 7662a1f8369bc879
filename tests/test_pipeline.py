"""End-to-end pipeline tests: fixtures → transform → 20 tables → sync.

Invariant-based golden checks (SURVEY §5): row conservation through
explodes, unique-key integrity per declared constraint, default-user
injection, drop-list absence, datetime edge handling, idempotent re-sync,
incremental == full convergence.
"""

import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import MapType

from etl_ender_turing_spark.pipeline import raw_fixture_tables, transform_all
from etl_ender_turing_spark.pipeline.sync import (
    read_watermark, sync_incremental, sync_period, write_watermark,
)
from etl_ender_turing_spark.schemas import TABLES


@pytest.fixture(scope="module")
def raw(spark):
    return raw_fixture_tables(spark)


@pytest.fixture(scope="module")
def tables(spark, raw):
    return transform_all(raw, spark)


def test_all_21_tables_produced(tables):
    assert set(tables) == set(TABLES)
    assert "sessions_transcripts" in tables


def test_schemas_match_registry(tables):
    for name, df in tables.items():
        want = [(f.name, f.dataType) for f in TABLES[name].schema.fields]
        got = [(f.name, f.dataType) for f in df.schema.fields]
        assert got == want, name


def test_unique_keys_hold(tables):
    for name, df in tables.items():
        key = list(TABLES[name].unique_key)
        assert df.count() == df.select(*key).distinct().count(), name


def test_explode_row_conservation(raw, tables):
    # count(child rows) == sum(size(source arrays)) — no row loss/dup
    src = raw["sessions"]
    checks = {
        "sessions_categories": F.size("categories"),
        "sessions_crm_statuses": F.size("crm_statuses"),
        "sessions_reviewers": F.size("reviewers"),
        "sessions_comments": F.size("comments"),
        "sessions_summaries": F.size("summary"),
    }
    for table, sz in checks.items():
        expected = src.select(F.sum(F.greatest(sz, F.lit(0))).alias("n")) \
                      .collect()[0]["n"]
        assert tables[table].count() == expected, table


def test_two_level_conservation(raw, tables):
    expected = raw["sessions"].select(F.explode("tags").alias("t")) \
        .select(F.sum(F.size("t.match"))).collect()[0][0]
    assert tables["sessions_tags"].count() == expected
    expected_scores = raw["sessions"].filter(F.col("scores").isNotNull()) \
        .select(F.explode("scores").alias("s")) \
        .select(F.sum(F.size("s.point_scores"))).collect()[0][0]
    assert tables["sessions_scores"].count() == expected_scores


def test_default_user_injected_once(spark, raw, tables):
    assert tables["users"].filter("id = 0").count() == 1
    assert tables["users"].count() == raw["users"].count() + 1
    # exact value parity with the reference's et_default_user
    # (ETL/Transform.py:20-27)
    row = tables["users"].filter("id = 0").collect()[0]
    assert row.full_name == "Ender Turing"
    assert row.email == "ender.turing@enderturing.com"
    assert row.is_active is False and row.is_superuser is False
    assert str(row.invite_expires) == "1900-01-01 00:00:00"
    # idempotence: transform again, still exactly one id=0
    again = transform_all(raw, spark)
    assert again["users"].filter("id = 0").count() == 1


def test_transcript_metrics_match_declared_session_columns(spark, raw, tables):
    """Recomputing words_count_*/silence/duration from fixture utterances
    reproduces the sessions table's declared values exactly — the
    round-trip validation for the sessions_transcripts wiring (SURVEY
    §2.5; reference stubs the table at schema.py:495-498)."""
    from etl_ender_turing_spark.pipeline.metrics import transcript_metrics

    tm = transcript_metrics(raw["transcripts"], agent_channel="agent_channel")
    declared = tables["sessions"].select(
        F.col("id").alias("session_id"),
        *[F.col(c).alias(f"decl_{c}")
          for c in ("words_count_agent", "words_count_client",
                    "words_count_both", "silence", "duration")])
    joined = declared.join(tm, "session_id", "inner")
    n = joined.count()
    assert n == raw["transcripts"].count() and n > 200
    bad = joined.filter(
        (F.col("decl_words_count_agent") != F.col("words_count_agent"))
        | (F.col("decl_words_count_client") != F.col("words_count_client"))
        | (F.col("decl_words_count_both") != F.col("words_count_both"))
        | (F.abs(F.col("decl_silence") - F.col("silence")) > 1e-9)
        | (F.abs(F.col("decl_duration") - F.col("duration")) > 1e-9))
    assert bad.count() == 0


def test_transcripts_table_shape(raw, tables):
    tt = tables["sessions_transcripts"]
    # 4 utterances per transcribed session, ordinal key starts at 0
    assert tt.count() == raw["transcripts"].count() * 4
    assert tt.groupBy("session_id").count().filter("count != 4").count() == 0
    assert tt.filter("utterance_id NOT BETWEEN 0 AND 3").count() == 0


def test_dropped_columns_absent(tables):
    assert "end_dt" not in tables["sessions"].columns
    assert "phone_number_aliases" not in tables["agents"].columns
    assert "color" not in tables["labels"].columns
    assert "team_ids" not in tables["scorecards"].columns
    assert "tags" not in tables["sessions"].columns       # exploded source


def test_datetime_edges(tables):
    # out-of-bounds association date -> 1900 default
    oob = tables["agent_group_associations"].filter(
        "agent_id = 7 and start_dt = timestamp'1900-01-01 00:00:00'")
    assert oob.count() == 1
    # malformed start_dt rows (i % 37 == 0) were regex-salvaged, not nulled
    assert tables["sessions"].filter("start_dt is null").count() == 0


def test_derived_columns(tables):
    row = tables["sessions"].filter(F.col("caller_prev_session_id").isNotNull()) \
        .select("id", "et_link", "start_date", "start_time").first()
    assert row.et_link.endswith(f"session_id={row.id}")
    assert len(row.start_date) == 10 and len(row.start_time) == 5


def test_sync_period_and_idempotency(spark, raw, tmp_path):
    wh = str(tmp_path / "wh")
    counts1 = sync_period(spark, raw, wh, "2024-06-01", "2024-06-02")
    sessions_n = spark.read.parquet(os.path.join(wh, "sessions")).count()
    assert counts1["sessions"] == sessions_n > 0
    # day-3 sessions excluded by the date filter
    assert spark.read.parquet(os.path.join(wh, "sessions")) \
        .filter("start_date = '2024-06-03'").count() == 0
    # re-sync same period: nothing changes
    sync_period(spark, raw, wh, "2024-06-01", "2024-06-02")
    assert spark.read.parquet(os.path.join(wh, "sessions")).count() == sessions_n


def test_sync_counts_match_loaded_rows(spark, raw, tmp_path):
    """Round-1 ADVICE bug: for non-partitioned tables the reported sync
    count came from the empty-check's take(1) scan (always 1). Counts must
    equal the rows actually loaded into a fresh warehouse."""
    wh = str(tmp_path / "whcounts")
    counts = sync_period(spark, raw, wh, "2024-06-01", "2024-06-03")
    multi = 0
    for t, n in counts.items():
        loaded = spark.read.parquet(os.path.join(wh, t)).count()
        assert n == loaded, f"{t}: reported {n} != loaded {loaded}"
        multi += loaded > 1
    assert multi >= 5   # the bug pinned every non-partitioned count at 1


def test_incremental_converges_to_full(spark, raw, tmp_path):
    wh_full = str(tmp_path / "full")
    wh_inc = str(tmp_path / "inc")
    sync_period(spark, raw, wh_full, "2024-06-01", "2024-06-03")

    # incremental: day 1-2 first, then watermark-driven catch-up through day 3
    sync_period(spark, raw, wh_inc, "2024-06-01", "2024-06-02")
    write_watermark(spark, wh_inc, datetime(2024, 6, 2, 23, 59, 59))
    sync_period(spark, raw, wh_inc, "2024-06-03", "2024-06-03")
    sync_incremental(spark, raw, wh_inc, "2024-06-03")

    def comparable(df):
        # set ops reject MAP columns — serialize them to sorted JSON first
        return df.select(*[
            F.to_json(F.map_entries(c)).alias(c)
            if isinstance(df.schema[c].dataType, MapType) else F.col(c)
            for c in df.columns
        ])

    for t in ("sessions", "sessions_scores", "sessions_reviewers"):
        full = spark.read.parquet(os.path.join(wh_full, t))
        inc = spark.read.parquet(os.path.join(wh_inc, t))
        assert full.count() == inc.count(), t
        assert comparable(full).exceptAll(comparable(inc)).count() == 0, t

    wm = read_watermark(spark, wh_inc)
    assert wm == datetime(2024, 6, 3)


def test_updated_category_pull_is_dim_bounded(spark):
    """The watermark-driven category-id collect must stay metadata-sized:
    within the reference's 9,999-per-tenant cap it returns the ids; past
    the cap it must FAIL LOUDLY (limit + assert), never ship an unbounded
    list to the driver."""
    import pytest

    from etl_ender_turing_spark.pipeline.sync import _updated_category_ids

    wm = datetime(2024, 6, 1)
    small = spark.range(50).select(
        F.col("id"), F.lit("2024-06-02 00:00:00").alias("updated_at"))
    assert len(_updated_category_ids(small, wm)) == 50
    # one past the cap -> loud failure, and the limit() means the failed
    # attempt still never collected more than _DIM_CAP rows
    big = spark.range(10_000).select(
        F.col("id"), F.lit("2024-06-02 00:00:00").alias("updated_at"))
    with pytest.raises(AssertionError, match="dimension cap"):
        _updated_category_ids(big, wm)


def test_guarded_semi_join_reviewers(tables):
    # 'reviewers,true' semantics: every sessions_scores row belongs to a
    # session; manual scores only exist where reviewers reviewed
    scored = tables["sessions_scores"].select("session_id").distinct()
    sess = tables["sessions"].select(F.col("id").alias("session_id"))
    orphans = scored.join(sess, "session_id", "left_anti")
    assert orphans.count() == 0
