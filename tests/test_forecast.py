"""Holt forecasting (operators/forecast.py): hand-computed recurrence,
trend direction, short-series drop, cross-engine equality."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Row

from etl_ender_turing_spark.operators import forecast as fc


def _events(spark, counts_by_day, group="a"):
    rows = []
    eid = 0
    for day, n in enumerate(counts_by_day, start=1):
        for _ in range(n):
            rows.append(Row(event_type=group,
                            ts=datetime(2024, 1, day, 12, 0, 0),
                            event_id=eid))
            eid += 1
    return spark.createDataFrame(rows)


def _holt_py(vs, alpha=0.5, beta=0.25):
    lv, tr = float(vs[0]), float(vs[1] - vs[0])
    for v in vs[1:]:
        lv_new = alpha * v + (1 - alpha) * (lv + tr)
        tr = beta * (lv_new - lv) + (1 - beta) * tr
        lv = lv_new
    return lv, tr


def test_matches_hand_recurrence(spark):
    vs = [10, 12, 15, 13, 18, 20]
    r = fc.holt_forecast(_events(spark, vs), "event_type", "ts",
                         horizon=7).collect()[0]
    lv, tr = _holt_py(vs)
    assert r.n_days == 6
    assert abs(r.level6 - round(lv, 6)) < 1e-9
    assert abs(r.trend6 - round(tr, 6)) < 1e-9
    assert abs(r.fc7_6 - round(lv + 7 * tr, 6)) < 1e-9


def test_rising_series_has_positive_trend(spark):
    r = fc.holt_forecast(_events(spark, [5, 8, 11, 14, 17, 20, 23]),
                         "event_type", "ts").collect()[0]
    assert r.trend6 > 0 and r.fc7_6 > r.level6


def test_single_day_group_drops(spark):
    df = _events(spark, [4])
    assert fc.holt_forecast(df, "event_type", "ts").count() == 0


def test_matches_duckdb_on_real_series(spark):
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                "'/root/testdata/sf0.001/events.parquet'")
    got = sorted(map(tuple, fc.holt_forecast(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet"),
        "event_type", "ts").collect()))
    exp = sorted(map(tuple, con.execute(fc.holt_forecast_sql(
        "events", "event_type", "ts")).fetchall()))
    assert got == exp


def test_round6s_signed_halfway_matches_duckdb(spark):
    """Sign-aware 6dp rounding: exact-halfway and negative values agree
    cross-engine (plain ROUND half-up vs half-even diverges here)."""
    import duckdb

    from etl_ender_turing_spark.functions.rounding import (round6s,
                                                           round6s_sql)

    vals = [0.5203125, -0.5203125, 1.0000005, -1.0000005, 0.0, -0.0,
            2.25, -2.25, 1e-7, -1e-7]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r.r for r in df.select(round6s(df.x).alias("r"))
           .collect()]
    con = duckdb.connect()
    exp = [con.execute(
        f"SELECT {round6s_sql(f'CAST({v!r} AS DOUBLE)')}").fetchone()[0]
        for v in vals]
    assert got == exp
    # half-away-from-zero at the 6dp boundary, symmetric in sign
    assert got[vals.index(1.0000005)] == 1.000001
    assert got[vals.index(-1.0000005)] == -1.000001
    # no -0.0 leaks through either branch
    assert all(str(v) != "-0.0" for v in got)
