"""Holt linear-trend forecasting (Holt 1957 / exponential smoothing) —
per-group time-series extrapolation, the capacity-planning readout over
the engine's rollup tables.

Engine shape: the daily series aggregates once (uniform (group, day)
shuffle), then each group's smoothing recurrence folds INSIDE one
``aggregate`` HOF over its sorted observation array — per-group state
is two doubles, no window, no cross-group traffic, exactly the
unrolled-iteration discipline of the Viterbi/EM trainers but with the
iteration count data-driven per group instead of plan-unrolled.

Cross-engine: a smoothing recurrence is inherently ORDER-SENSITIVE
float arithmetic — which is fine, because both engines run it in the
same order (Spark as a sequential array fold, DuckDB as a recursive
CTE over the row-numbered series), and the new-level term inside the
trend update is deliberately RECOMPUTED on both sides rather than
bound, so the expression trees are token-identical. Smoothing
constants are dyadic (alpha = 0.5, beta = 0.25) and cast to DOUBLE
explicitly — bare decimal literals parse as DECIMAL on both engines
with different division/multiplication semantics (the q_hll_distinct
last-ulp trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.rounding import round6s, round6s_sql

ALPHA = "CAST(0.5 AS DOUBLE)"
ONE_MINUS_ALPHA = "CAST(0.5 AS DOUBLE)"
BETA = "CAST(0.25 AS DOUBLE)"
ONE_MINUS_BETA = "CAST(0.75 AS DOUBLE)"


def holt_forecast(df: DataFrame, group_col: str, ts_col: str,
                  horizon: int = 7) -> DataFrame:
    """(group, n_days, level6, trend6, fc{h}6): Holt's linear method
    over each group's daily count series — level/trend after the last
    observation and the h-step-ahead forecast level + h·trend. Groups
    with fewer than two observed days drop (no trend is estimable).
    Initialization: l0 = first value, b0 = second − first; the
    recurrence starts at the second observation."""
    daily = (df.groupBy(F.col(group_col).alias("g"),
                        F.date_trunc("day", F.col(ts_col)
                                     .cast("timestamp")).alias("d"))
             .agg(F.count(F.lit(1)).cast("double").alias("v")))
    series = (daily.groupBy("g")
              .agg(F.sort_array(F.collect_list(F.struct("d", "v")))
                   .alias("arr"))
              .filter(F.size("arr") >= 2))
    lv_new = (f"({ALPHA} * x.v"
              f" + {ONE_MINUS_ALPHA} * (acc.lv + acc.tr))")
    fold = F.expr(f"""
        aggregate(slice(arr, 2, size(arr) - 1),
          struct(element_at(arr, 1).v AS lv,
                 CAST(element_at(arr, 2).v - element_at(arr, 1).v
                      AS DOUBLE) AS tr),
          (acc, x) -> struct(
            {lv_new} AS lv,
            {BETA} * ({lv_new} - acc.lv)
              + {ONE_MINUS_BETA} * acc.tr AS tr))""")
    return (series.select(F.col("g").alias(group_col),
                          F.size("arr").cast("long").alias("n_days"),
                          fold.alias("st"))
            .select(group_col, "n_days",
                    round6s(F.col("st.lv")).alias("level6"),
                    round6s(F.col("st.tr")).alias("trend6"),
                    round6s(F.col("st.lv")
                            + F.lit(float(horizon)) * F.col("st.tr"))
                    .alias(f"fc{horizon}_6")))


def holt_forecast_sql(table: str, group_col: str, ts_col: str,
                      horizon: int = 7) -> str:
    """DuckDB oracle: the identical recurrence as a recursive CTE over
    the row-numbered series (sequential, same order, same recomputed
    new-level term)."""
    lv_new = (f"({ALPHA} * i.v"
              f" + {ONE_MINUS_ALPHA} * (r.lv + r.tr))")
    return f"""
    WITH RECURSIVE daily AS (
      SELECT {group_col} AS g, date_trunc('day', {ts_col}) AS d,
             CAST(COUNT(*) AS DOUBLE) AS v
      FROM {table} GROUP BY 1, 2
    ),
    idx AS (
      SELECT g, v, ROW_NUMBER() OVER (PARTITION BY g ORDER BY d) AS t
      FROM daily
    ),
    nn AS (SELECT g, MAX(t) AS n_days FROM idx GROUP BY 1
           HAVING MAX(t) >= 2),
    rec(g, t, lv, tr) AS (
      SELECT i1.g, CAST(1 AS BIGINT), i1.v,
             CAST(i2.v - i1.v AS DOUBLE)
      FROM idx i1 JOIN idx i2 ON i1.g = i2.g AND i1.t = 1 AND i2.t = 2
      UNION ALL
      SELECT r.g, r.t + 1,
             {ALPHA} * i.v + {ONE_MINUS_ALPHA} * (r.lv + r.tr),
             {BETA} * ({lv_new} - r.lv) + {ONE_MINUS_BETA} * r.tr
      FROM rec r JOIN idx i ON i.g = r.g AND i.t = r.t + 1
    )
    SELECT r.g AS {group_col}, CAST(nn.n_days AS BIGINT) AS n_days,
           {round6s_sql("r.lv")} AS level6,
           {round6s_sql("r.tr")} AS trend6,
           {round6s_sql(f"r.lv + CAST({horizon} AS DOUBLE) * r.tr")}
             AS fc{horizon}_6
    FROM rec r JOIN nn ON nn.g = r.g AND r.t = nn.n_days
    """


__all__ = ["holt_forecast", "holt_forecast_sql"]
