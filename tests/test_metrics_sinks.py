"""Derived-metric recomputation (SURVEY §2.5) and file sinks (§2.1)."""

import os

from pyspark.sql import functions as F

from etl_ender_turing_spark.pipeline.metrics import (
    channel_map,
    recompute_average_score,
    recompute_comments_count,
    recompute_score_details,
)
from etl_ender_turing_spark.sources.sinks import sink_path, write_file


def _scores(spark):
    return spark.createDataFrame(
        [("s1", 1, 10, 100, 4), ("s1", 1, 10, 101, 2),
         ("s1", 2, 11, 200, 1), ("s2", 2, 11, 200, 5)],
        "session_id string, scorecard_id long, reviewer_id long,"
        " scorecard_point_id long, score int")


def test_average_score(spark):
    got = {r.session_id: r.average_score
           for r in recompute_average_score(_scores(spark)).collect()}
    assert got == {"s1": (4 + 2 + 1) / 3, "s2": 5.0}


def test_weighted_score_with_points(spark):
    points = spark.createDataFrame(
        [(100, 1, 5), (101, 1, 5), (200, 2, 10)],
        "id long, scorecard_id long, max_score int")
    got = {r.session_id: r.weighted_score
           for r in recompute_average_score(_scores(spark), points).collect()}
    assert got["s1"] == (4 + 2 + 1) / (5 + 5 + 10)
    assert got["s2"] == 5 / 10


def test_score_details_pivot(spark):
    scorecards = spark.createDataFrame(
        [(1, True), (2, False)], "id long, is_automated boolean")
    got = {r.session_id: (r.automated_score, r.manual_score)
           for r in recompute_score_details(_scores(spark), scorecards).collect()}
    assert got["s1"] == ((4 + 2) / 2, 1.0)
    assert got["s2"] == (None, 5.0)


def test_comments_count(spark):
    comments = spark.createDataFrame(
        [("s1", 7, "a"), ("s1", 8, "b"), ("s2", 7, "c")],
        "session_id string, author_id long, text string")
    got = {r.session_id: r.comments_count
           for r in recompute_comments_count(comments).collect()}
    assert got == {"s1": 2, "s2": 1}


def test_channel_map(spark):
    rows = spark.createDataFrame(
        [("s1", "client", 3.12), ("s1", "agent", 1.36), ("s2", "agent", 9.9)],
        "session_id string, channel string, overlap double")
    got = {r.session_id: r.overlaps_data
           for r in channel_map(rows, "session_id", "channel",
                                "overlap", "overlaps_data").collect()}
    assert got["s1"] == {"client": 3.12, "agent": 1.36}
    assert got["s2"] == {"agent": 9.9}


def test_transcript_metrics(spark):
    from etl_ender_turing_spark.pipeline.metrics import transcript_metrics
    rows = [
        # s1: agent(ch0) 2+3 words, client(ch1) 4; gaps: 1.0 (5->6) after
        # overlap-protected max-end; duration 10-0
        ("s1", [(0, 0.0, 2.0, "hello there"),
                (1, 1.5, 5.0, "hi how are you"),   # overlaps agent turn
                (0, 6.0, 10.0, "fine thanks bye")]),
        # s2: single utterance -> no gaps, silence 0
        ("s2", [(1, 2.0, 4.0, "just me")]),
    ]
    df = spark.createDataFrame(
        rows, "session_id string, utterances array<struct<"
              "channel:int, start:double, end:double, text:string>>")
    got = {r.session_id: r for r in transcript_metrics(df).collect()}
    s1 = got["s1"]
    assert (s1.words_count_agent, s1.words_count_client,
            s1.words_count_both) == (5, 4, 9)
    assert s1.silence == 1.0         # only the 5.0 -> 6.0 gap counts
    assert s1.duration == 10.0
    s2 = got["s2"]
    assert (s2.words_count_agent, s2.words_count_client) == (0, 2)
    assert s2.silence == 0.0 and s2.duration == 2.0


# ----------------------------------------------------------------------
# file sinks
# ----------------------------------------------------------------------

def test_sink_naming():
    assert sink_path("/o", "agents", "csv").endswith("dict-agents.csv")
    assert sink_path("/o", "sessions", "parquet", kind="fact",
                     start="2024-06-01", stop="2024-06-02") \
        .endswith("sessions-2024-06-01-2024-06-02.parquet")


def test_sink_roundtrips(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b\tc", None)], "id int, name string, v double")
    for fmt, reader in (
            ("parquet", lambda p: spark.read.parquet(p)),
            ("json", lambda p: spark.read.json(p)),
            ("csv", lambda p: spark.read.option("header", True).csv(p)),
            ("tsv", lambda p: spark.read.option("header", True)
                .option("sep", "\t").csv(p))):
        path = os.path.join(str(tmp_path), f"out_{fmt}")
        write_file(df, path, fmt)
        back = reader(path)
        assert back.count() == 2, fmt
        assert set(back.columns) == {"id", "name", "v"}, fmt
    # tsv embedded-tab value survives via quoting
    tsv = (spark.read.option("header", True).option("sep", "\t")
           .csv(os.path.join(str(tmp_path), "out_tsv")))
    assert tsv.filter(F.col("name") == "b\tc").count() == 1


def test_ep3_export_flow(spark, tmp_path):
    """EP3 (get-scores / get-summaries-to-file): sessions enriched with
    broadcast dims, date/time split, et_link, csv out."""
    import os

    from etl_ender_turing_spark.functions.derived import with_enrichment_columns
    from etl_ender_turing_spark.pipeline import raw_fixture_tables, transform_all
    from etl_ender_turing_spark.sources.sinks import write_file

    tables = transform_all(raw_fixture_tables(spark), spark)
    enriched = with_enrichment_columns(
        tables["sessions"].drop("start_date", "start_time", "et_link"),
        tables["agents"], tables["groups"], base_url="https://app")
    row = enriched.filter(F.col("agent_name").isNotNull()).first()
    assert row.et_link == f"https://app/main/conversations/view?session_id={row.id}"
    assert row.agent_name.startswith("Agent")
    assert row.group_name.startswith("Group")
    assert len(row.start_date) == 10 and len(row.start_time) == 5

    out = os.path.join(str(tmp_path), "export_csv")
    write_file(enriched.select("id", "agent_name", "group_name",
                               "start_date", "start_time", "et_link"), out, "csv")
    back = spark.read.option("header", True).csv(out)
    assert back.count() == enriched.count()


def test_xlsx_sink_gates(spark, tmp_path, monkeypatch):
    """xlsx is driver-side: row-capped, and gated on openpyxl presence."""
    import pytest

    from etl_ender_turing_spark.sources import sinks

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string")
    # cap enforcement fires before any collect-to-driver
    monkeypatch.setattr(sinks, "XLSX_ROW_CAP", 1)
    with pytest.raises(ValueError, match="refusing driver-side"):
        sinks.write_file(df, os.path.join(str(tmp_path), "x.xlsx"), "xlsx")
    monkeypatch.setattr(sinks, "XLSX_ROW_CAP", 1_000_000)
    path = os.path.join(str(tmp_path), "ok.xlsx")
    try:
        sinks.write_file(df, path, "xlsx")
        assert os.path.exists(path)
    except NotImplementedError:
        pass  # openpyxl absent in this container — documented gating


def test_debug_dump_gated(spark, tmp_path):
    from etl_ender_turing_spark.sources.sinks import debug_dump

    df = spark.createDataFrame([(1,)], "id int")
    off = os.path.join(str(tmp_path), "dbg_off")
    debug_dump({"t": df}, off, enabled=False)
    assert not os.path.exists(os.path.join(off, "t-debug"))
    on = os.path.join(str(tmp_path), "dbg_on")
    debug_dump({"t": df}, on, enabled=True)
    assert spark.read.parquet(os.path.join(on, "t-debug")).count() == 1


def test_pickle_sink_roundtrip(spark, tmp_path):
    import pandas as pd

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    path = str(tmp_path / "dict-agents.pkl")
    write_file(df, path, "pkl")
    back = pd.read_pickle(path)
    assert sorted(map(tuple, back.values.tolist())) == [(1, "a"), (2, "b")]


def test_read_any_roundtrips_every_ingestion_format(spark, tmp_path):
    from etl_ender_turing_spark.sources.readers import read_any
    from etl_ender_turing_spark.sources.sinks import write_file

    df = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta", None), (3, "gam,ma", -2.0)],
        "id long, name string, score double")
    want = sorted(map(tuple, df.collect()))
    schema = "id long, name string, score double"
    for fmt in ("parquet", "orc", "json", "csv", "tsv"):
        path = str(tmp_path / f"t_{fmt}.{fmt}")
        write_file(df, path, fmt)
        # csv/tsv need the explicit schema (no silent inference surprises);
        # columnar/json carry their own types
        back = read_any(spark, path,
                        schema=schema if fmt in ("csv", "tsv") else None)
        assert sorted(map(tuple, back.select("id", "name", "score")
                          .collect())) == want, fmt
    # format inference failure is a clear error, not a guess
    import pytest
    with pytest.raises(ValueError, match="cannot infer"):
        read_any(spark, str(tmp_path / "mystery.dat"))
