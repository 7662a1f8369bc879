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

Two interchangeable services sit behind the reader:
``HttpSessionService`` speaks the reference's real wire protocol
(``GET /sessions?skip=&limit=&filters=<url-encoded DSL>`` with a Bearer
token — Extract.py:41-50, utils.py:121-131) over stdlib urllib, and
``FakeSessionService`` answers deterministically from the fixture rows
for tests. The ``endpoint`` option selects HTTP; without it the fake is
used (no external network in this environment).
"""

from __future__ import annotations

import json
from datetime import date, timedelta

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition,
                                    SimpleDataSourceStreamReader)

PAGE_LIMIT = 500  # Extract.py:28

# retry policy parity (ETL/utils.py:149-158: tenacity, 10 attempts,
# exponential backoff 5-30 s, reraise)
RETRY_ATTEMPTS = 10
RETRY_BASE_S = 5.0
RETRY_CAP_S = 30.0


def with_retry(fn, *args, attempts: int = RETRY_ATTEMPTS,
               base_s: float = RETRY_BASE_S, cap_s: float = RETRY_CAP_S,
               _sleep=None, **kwargs):
    """Call ``fn`` with exponential backoff; re-raise after the budget.

    Runs INSIDE partition readers, so each task retries its own pages
    independently; Spark task retries (spark.task.maxFailures) remain the
    outer layer for whole-task failures.
    """
    import time as _time

    sleep = _sleep or _time.sleep
    last: Exception | None = None
    for attempt in range(attempts):
        try:
            return fn(*args, **kwargs)
        except Exception as e:          # noqa: BLE001 — policy is retry-any
            last = e
            if attempt == attempts - 1:
                break
            sleep(min(base_s * (2 ** attempt), cap_s))
    raise last


class FakeSessionService:
    """Deterministic stand-in for the sessions API: filterable, paginated.

    ``extra`` carries pushed non-date DSL terms — (field, allowed values)
    conjuncts the "server" evaluates, like the reference's API does with
    its URL filter string."""

    def __init__(self):
        from ..pipeline.fixtures import raw_sessions
        self._rows = raw_sessions()

    def query(self, d1: str, d2: str, t1: str = "00:00", t2: str = "23:59",
              skip: int = 0, limit: int = PAGE_LIMIT,
              extra: list[tuple[str, tuple[str, ...]]] = ()) -> list[dict]:
        out = []
        for r in self._rows:
            sd = r["start_dt"][:10]
            st = r["start_dt"][11:16]
            if not (d1 <= sd <= d2 and t1 <= st <= t2):
                continue
            if any(str(r.get(name)) not in values for name, values in extra):
                continue
            out.append(r)
        return out[skip:skip + limit]


class HttpSessionService:
    """The reference's wire protocol over stdlib urllib.

    Builds ``GET {endpoint}/sessions?skip=S&limit=L&filters=<quoted DSL>``
    exactly as Extract.py:36-46 does (``date_range,{d1},{d2}||{t1},{t2}``
    plus '±'-joined extra terms) and authenticates with a Bearer token.
    The token comes from either of the reference's two auth modes
    (utils.py:108-131): a pre-provisioned PAT (``init_et_by_pat_token``)
    passed as ``token``, or user/password credentials (``init_et``'s
    ``https://{user}:{password}@{domain}`` Config) exchanged lazily for
    an access token via the OAuth2 password grant
    (``POST /login/access-token``, form-encoded username/password →
    ``{"access_token": ...}``). Expects the reference's response shape
    ``{"items": [...]}``.

    Instantiated INSIDE partition readers — one client per task, no
    driver-held connections, so the credential exchange also happens
    executor-side: one login per task, cached on the instance; combined
    with ``with_retry`` each task owns its own retry budget.
    """

    def __init__(self, endpoint: str, token: str | None = None,
                 user: str | None = None, password: str | None = None,
                 timeout_s: float = 30.0):
        self.endpoint = endpoint.rstrip("/")
        self.token = token
        self.user = user
        self.password = password
        self.timeout_s = timeout_s

    def _ensure_token(self) -> None:
        """Exchange user/password for a bearer token on first use.

        A ready ``token`` always wins (the PAT path is unchanged); with
        credentials only, the exchange runs once per client instance —
        i.e. once per Spark task, never per page.
        """
        if self.token is not None or self.user is None:
            return
        import urllib.parse
        import urllib.request

        body = urllib.parse.urlencode(
            {"username": self.user, "password": self.password or ""}
        ).encode("ascii")
        req = urllib.request.Request(
            f"{self.endpoint}/login/access-token", data=body,
            headers={"Content-Type": "application/x-www-form-urlencoded"},
            method="POST")
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            payload = json.loads(resp.read().decode("utf-8"))
        self.token = payload["access_token"]

    def query(self, d1: str, d2: str, t1: str = "00:00", t2: str = "23:59",
              skip: int = 0, limit: int = PAGE_LIMIT,
              extra: list[tuple[str, tuple[str, ...]]] = ()) -> list[dict]:
        import urllib.parse
        import urllib.request

        self._ensure_token()
        dsl = f"date_range,{d1},{d2}||{t1},{t2}"
        for name, values in extra:
            dsl += f"±{name},{','.join(values)}"
        url = (f"{self.endpoint}/sessions?skip={skip}&limit={limit}"
               f"&filters={urllib.parse.quote(dsl)}")
        req = urllib.request.Request(url)
        if self.token:
            req.add_header("Authorization", f"Bearer {self.token}")
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            payload = json.loads(resp.read().decode("utf-8"))
        return payload["items"]


def session_count(endpoint: str, d1: str, d2: str, t1: str = "00:00",
                  t2: str = "23:59",
                  extra: list[tuple[str, tuple[str, ...]]] = (),
                  token: str | None = None, timeout_s: float = 30.0) -> int:
    """Server-side session count for a filter DSL — the reference's
    count-reconciliation check that was left as a TODO and never
    implemented (reference ETL/Extract.py:158; endpoint shape from
    get-scores.py:31-37): ``GET /sessions/filter/number_of_sessions``
    with the same quoted filters as the extraction scan."""
    import urllib.parse
    import urllib.request

    dsl = f"date_range,{d1},{d2}||{t1},{t2}"
    for name, values in extra:
        dsl += f"±{name},{','.join(values)}"
    url = (f"{endpoint.rstrip('/')}/sessions/filter/number_of_sessions"
           f"?filters={urllib.parse.quote(dsl)}")
    req = urllib.request.Request(url)
    if token:
        req.add_header("Authorization", f"Bearer {token}")
    with urllib.request.urlopen(req, timeout=timeout_s) as resp:
        payload = json.loads(resp.read().decode("utf-8"))
    if isinstance(payload, dict):
        return int(payload["number_of_sessions"])
    return int(payload)


def reconcile_extraction(df, endpoint: str, start: str, stop: str,
                         token: str | None = None) -> dict:
    """Completes the reference's intended post-extraction validation:
    compare the extracted row count against the server's count endpoint
    for the same interval. Returns {extracted, reported, match} — wire it
    after a sync and alert on match=False (a mid-scan upstream mutation
    or pagination bug shows up here first)."""
    reported = with_retry(session_count, endpoint, start, stop, token=token)
    extracted = df.count()
    return {"extracted": extracted, "reported": reported,
            "match": extracted == reported}


def fetch_session_details(df, endpoint: str, suffix: str = "",
                          token: str | None = None, id_col: str = "id",
                          guard_col: str | None = None,
                          out_col: str | None = None,
                          retry_attempts: int = RETRY_ATTEMPTS,
                          retry_base_s: float = RETRY_BASE_S,
                          timeout_s: float = 30.0):
    """Live per-row detail lookup-join (reference ``get_et_session_details``,
    Extract.py:66-108: ``GET /sessions/{id}{suffix}``), distributed.

    The reference loops over all sessions on the driver, one request at a
    time. Here the fetch is an Arrow-batched ``mapInPandas`` stage: each
    partition fetches only ITS rows, so the lookup parallelizes across
    executors and composes with any upstream filter — the guarded-lookup
    shape. Parity semantics:

    - ``guard_col`` = the reference's ``column_should_contain_data``:
      falsy guard values skip the fetch (NULL detail);
    - per-row failures degrade to NULL after the retry budget, like the
      reference's log-and-continue;
    - the payload lands as a JSON string column named after the suffix
      (``/scores`` → ``scores``), ready for ``from_json`` + the flatten
      layer.

    At 100 TB this stage is rate-limited by the API, not Spark — cap
    parallelism by coalescing the guarded subset, not the whole frame.
    """
    from pyspark.sql import types as T

    out_col = out_col or (suffix.strip("/") or "details")
    # StructType.add mutates in place — build a fresh schema instead
    schema = T.StructType(list(df.schema.fields)
                          + [T.StructField(out_col, T.StringType())])
    base = endpoint.rstrip("/")

    def fetch_partition(batches):
        import urllib.request

        def one(sid):
            req = urllib.request.Request(f"{base}/sessions/{sid}{suffix}")
            if token:
                req.add_header("Authorization", f"Bearer {token}")
            with urllib.request.urlopen(req, timeout=timeout_s) as r:
                return r.read().decode("utf-8")

        for pdf in batches:
            vals = []
            guards = pdf[guard_col] if guard_col is not None else None
            for i, sid in enumerate(pdf[id_col]):
                if guards is not None:
                    g = guards.iloc[i]
                    empty = g is None or (isinstance(g, float) and g != g) \
                        or (hasattr(g, "__len__") and len(g) == 0) or g == 0
                    if empty:
                        vals.append(None)
                        continue
                try:
                    vals.append(with_retry(one, sid, attempts=retry_attempts,
                                           base_s=retry_base_s))
                except Exception:       # noqa: BLE001 — log-and-continue parity
                    vals.append(None)
            pdf = pdf.copy()
            pdf[out_col] = vals
            yield pdf

    return df.mapInPandas(fetch_partition, schema)


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
    """DSL pushdown: a ``filters`` option (the reference's URL DSL) is
    parsed here. Its ``date_range`` term replaces start/stop and clips
    the half-day windows — pruned intervals are never fetched at all —
    and every other term ships to the service as a server-side conjunct
    (Extract.py:34-46 semantics)."""

    def __init__(self, schema, options):
        self.schema_ = schema
        self.start = options.get("start", "2024-06-01")
        self.stop = options.get("stop", "2024-06-03")
        self.page_limit = int(options.get("pagelimit", PAGE_LIMIT))
        self.endpoint = options.get("endpoint")      # None -> fixture fake
        self.token = options.get("token")
        self.user = options.get("user")              # credential auth mode
        self.password = options.get("password")
        self.time_range: tuple[str, str] | None = None
        self.extra: list[tuple[str, tuple[str, ...]]] = []
        dsl = options.get("filters")
        if dsl:
            from ..functions.filter_dsl import parse_filter
            for term in parse_filter(dsl):
                if term.name == "date_range":
                    self.start, self.stop = term.values
                    self.time_range = term.time_range
                else:
                    self.extra.append((term.name, term.values))

    def partitions(self):
        ivs = []
        for d1, d2, t1, t2 in split_half_days(self.start, self.stop):
            if self.time_range:
                t1, t2 = max(t1, self.time_range[0]), min(t2, self.time_range[1])
                if t1 > t2:      # window entirely outside the pushed range
                    continue
            ivs.append(IntervalPartition(d1, d2, t1, t2))
        return ivs

    def read(self, partition: IntervalPartition):
        svc = (HttpSessionService(self.endpoint, self.token,
                                  self.user, self.password)
               if self.endpoint else FakeSessionService())
        skip = 0
        while True:
            page = with_retry(svc.query, partition.d1, partition.d2,
                              partition.t1, partition.t2, skip,
                              self.page_limit, extra=self.extra)
            for r in page:
                yield (r["id"], r["start_dt"], r["type"], r["agent_id"],
                       r["group_id"], r["duration"],
                       json.dumps(r["score_details"]))
            if len(page) < self.page_limit:   # short page -> done
                break
            skip += self.page_limit


class SessionApiStreamReader(SimpleDataSourceStreamReader):
    """STREAMING form of the session scan: the reference's cron loop
    (DOCS/README.MD:60-65 '*/5 * * * *' re-extract) expressed as a real
    Structured Streaming source with durable offsets.

    Offset = {"iv": n} — the number of half-day intervals fully ingested.
    Each micro-batch drains every not-yet-read interval (one page loop
    per interval, the same wire protocol as the batch reader); the
    checkpoint persists the offset, so a restart resumes from the next
    interval instead of re-fetching history — exactly what the
    reference's last_synced.json watermark file hand-rolls
    (ETL/utils.py:20-38), now with exactly-once semantics from Spark's
    offset log. ``readBetweenOffsets`` makes replay deterministic: a
    failed epoch re-reads THE SAME interval span.
    """

    def __init__(self, options):
        self.start = options.get("start", "2024-06-01")
        self.stop = options.get("stop", "2024-06-03")
        self.page_limit = int(options.get("pagelimit", PAGE_LIMIT))
        self.endpoint = options.get("endpoint")
        self.token = options.get("token")
        self.user = options.get("user")
        self.password = options.get("password")
        self.intervals = split_half_days(self.start, self.stop)

    def initialOffset(self) -> dict:
        return {"iv": 0}

    def _svc(self):
        return (HttpSessionService(self.endpoint, self.token,
                                   self.user, self.password)
                if self.endpoint else FakeSessionService())

    def _read_interval(self, iv: tuple[str, str, str, str]):
        d1, d2, t1, t2 = iv
        svc = self._svc()
        skip = 0
        while True:
            page = with_retry(svc.query, d1, d2, t1, t2, skip,
                              self.page_limit)
            for r in page:
                yield (r["id"], r["start_dt"], r["type"], r["agent_id"],
                       r["group_id"], r["duration"],
                       json.dumps(r["score_details"]))
            if len(page) < self.page_limit:
                break
            skip += self.page_limit

    def read(self, start: dict):
        lo, hi = start["iv"], len(self.intervals)
        rows = []
        for iv in self.intervals[lo:hi]:
            rows.extend(self._read_interval(iv))
        return iter(rows), {"iv": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows = []
        for iv in self.intervals[start["iv"]:end["iv"]]:
            rows.extend(self._read_interval(iv))
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass        # offsets live in the checkpoint; nothing to ack server-side


class SessionApiDataSource(DataSource):
    """spark.read.format("session_api").option("start", d).option("stop", d);
    spark.readStream.format("session_api") for the offset-tracked stream."""

    @classmethod
    def name(cls) -> str:
        return "session_api"

    def schema(self) -> str:
        return ("id string, start_dt string, type string, agent_id long,"
                " group_id long, duration double, score_details string")

    def reader(self, schema) -> SessionApiReader:
        return SessionApiReader(schema, self.options)

    def simpleStreamReader(self, schema) -> SessionApiStreamReader:
        return SessionApiStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SessionApiDataSource)


def read_sessions_api(spark, start: str, stop: str, page_limit: int = PAGE_LIMIT,
                      filters: str | None = None, endpoint: str | None = None,
                      token: str | None = None, user: str | None = None,
                      password: str | None = None):
    register(spark)
    r = (spark.read.format("session_api")
         .option("start", start).option("stop", stop)
         .option("pagelimit", str(page_limit)))
    if filters:
        r = r.option("filters", filters)
    if endpoint:
        r = r.option("endpoint", endpoint)
    if token:
        r = r.option("token", token)
    if user:
        r = r.option("user", user)
    if password:
        r = r.option("password", password)
    return r.load()


__all__ = ["SessionApiDataSource", "read_sessions_api", "register",
           "split_half_days", "FakeSessionService", "HttpSessionService",
           "session_count", "reconcile_extraction"]
