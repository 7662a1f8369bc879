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
