"""Datetime parsing/normalization — Spark-native, zero Python UDFs.

Reproduces the reference's pandas datetime stack (reference:
ET-ETL-DWH-PY312/ETL/Transform.py:131-139,243-266; ETL/utils.py:197-205)
with pinned, test-documented semantics:

- ISO-8601 microsecond strings -> timestamp ROUNDED to whole seconds.
  pandas uses ``.dt.round('s')`` (round-half-to-even); we pin
  round-half-up via ``timestamp_seconds(round(unix_micros/1e6))`` —
  documented delta: values exactly on .5 s with an even floor differ.
- Out-of-bounds / unparseable dates (e.g. '0001-01-01T00:00:00') fall back
  to the reference's default 1900-01-01 (utils.py:197-205 safe_to_datetime).
- Regex salvage: strings that fail a direct parse but contain an embedded
  'YYYY-MM-DDTHH:MM:SS' are rescued via regexp_extract
  (Transform.py:245-250).

All branches are built-in expressions -> whole-stage codegen, pushdown-safe.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

ISO_CORE = r"(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2})"
DEFAULT_TS = "1900-01-01 00:00:00"
# Spark happily parses year 0001; pandas Timestamp cannot (min 1677-09-21).
# Mirror pandas: anything below the pandas min becomes the 1900 default.
PANDAS_MIN_TS = "1677-09-22 00:00:00"


def parse_iso_ts(col: Column | str) -> Column:
    """Lenient ISO-8601 parse: direct try_to_timestamp, then regex salvage."""
    c = F.col(col) if isinstance(col, str) else col
    direct = F.try_to_timestamp(c)
    salvaged = F.try_to_timestamp(F.regexp_extract(c, ISO_CORE, 1))
    return F.coalesce(direct, salvaged)


def round_to_second(ts: Column) -> Column:
    """Round (not truncate) a timestamp to whole seconds, like pandas
    ``.dt.round('s')`` (half-up rather than pandas' half-even; pinned in
    tests/test_datetime_utils.py)."""
    return F.timestamp_seconds(F.round(F.unix_micros(ts) / F.lit(1_000_000.0)))


def safe_to_timestamp(col: Column | str, default: str = DEFAULT_TS) -> Column:
    """Parse → round to second → clamp out-of-pandas-range to ``default``.

    Equivalent of reference safe_to_datetime (utils.py:197-205) applied
    after to_datetime+round (Transform.py:131-139).
    """
    c = F.col(col) if isinstance(col, str) else col
    parsed = round_to_second(parse_iso_ts(c))
    too_old = parsed < F.lit(PANDAS_MIN_TS).cast("timestamp")
    fallback = F.lit(default).cast("timestamp")
    return F.when(parsed.isNull() & c.isNotNull(), fallback) \
            .when(too_old, fallback) \
            .otherwise(parsed)


def split_date_time(ts: Column) -> tuple[Column, Column]:
    """ISO date part and HH:MM time part, as strings.

    Reference splits the raw ISO string on 'T' and slices HH:MM
    (Transform.py:39-40; get-scores.py:58).
    """
    return F.date_format(ts, "yyyy-MM-dd"), F.date_format(ts, "HH:mm")
