"""Regression: the delivered query contract must work under a SparkSession
that did NOT come from our own ``get_spark`` factory.

Round-1 bug: ``read_table`` relied on ``spark.sql.legacy.parquet.nanosAsLong``
being set at session-build time, so the external driver's vanilla session
failed on every events.parquet query with PARQUET_TYPE_ILLEGAL
TIMESTAMP(NANOS). ``read_table`` now sets the conf per-read; here we simulate
a vanilla session by unsetting it before running the queries.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tests.conftest import SF_SMOKE  # noqa: E402


def _simulate_vanilla(spark):
    try:
        spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    except Exception:
        pass


def test_events_query_survives_vanilla_session(spark):
    import __spark_entry__ as entry

    _simulate_vanilla(spark)
    qs = entry.queries()
    # An events-table query — the class that died round 1.
    df = qs["q_dedup_latest_event"](spark, SF_SMOKE)
    assert df.count() > 0

    _simulate_vanilla(spark)
    df2 = qs["q_count_pushdown"](spark, SF_SMOKE)
    assert df2.count() > 0


def test_entry_survives_vanilla_session(spark):
    import __spark_entry__ as entry

    _simulate_vanilla(spark)
    df = entry.entry(spark)
    assert df.count() >= 0


def test_read_table_handles_both_ts_encodings(spark, tmp_path):
    """FIXTURES.md ts contract: driver testdata flipped events.ts between
    TIMESTAMP(NANOS) (round 1) and timestamp[us]/NTZ (round 2+). The same
    reader must yield identical micros-truncated values from either file,
    by branching on the observed schema — never a pinned assumption."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_ender_turing_spark.sources.readers import read_table

    base = dt.datetime(2024, 6, 26, 10, 15, 44, 620796)
    stamps = [base + dt.timedelta(seconds=i, microseconds=137 * i)
              for i in range(5)]
    cols = {
        "event_id": pa.array(range(5), pa.int64()),
        "user_id": pa.array([7] * 5, pa.int64()),
        "event_type": pa.array(["click"] * 5),
        "value": pa.array([1.5] * 5, pa.float64()),
        "props": pa.array(["{}"] * 5),
    }
    for sub, ts_type in (("nanos", pa.timestamp("ns")),
                         ("micros", pa.timestamp("us"))):
        d = tmp_path / sub
        d.mkdir()
        t = pa.table({"event_id": cols["event_id"],
                      "ts": pa.array(stamps, ts_type), **{
                          k: v for k, v in cols.items() if k != "event_id"}})
        pq.write_table(t, d / "events.parquet", coerce_timestamps=None,
                       version="2.6", store_schema=False)
    read = {}
    for sub in ("nanos", "micros"):
        df = read_table(spark, str(tmp_path / sub), "events")
        read[sub] = sorted(
            (r.event_id, r.ts.replace(tzinfo=None) if r.ts.tzinfo else r.ts)
            for r in df.select("event_id", "ts").collect())
    assert read["nanos"] == read["micros"]
    assert read["nanos"][0][1] == base


def test_new_round3_queries_survive_vanilla_session(spark):
    import __spark_entry__ as entry

    qs = entry.queries()
    for name in ("q_training_set", "q_stream_session_windows",
                 "q_embed_outliers",
                 # round 5: HOF entropy fold, ordered-limit zipf, Arrow
                 # media decode — none may depend on engine-tuning confs
                 "q_char_entropy", "q_zipf_slope", "q_media_meta"):
        _simulate_vanilla(spark)
        assert qs[name](spark, SF_SMOKE).count() >= 0, name
