"""Custom DataSource: interval-parallel paginated scan (SURVEY §2.1 row 1)."""

import pytest

from etl_ender_turing_spark.sources.api_source import (
    read_sessions_api, split_half_days,
)


def test_split_half_days():
    ivs = split_half_days("2024-06-01", "2024-06-02")
    assert len(ivs) == 4
    assert ivs[0] == ("2024-06-01", "2024-06-01", "00:00", "12:00")
    assert ivs[3] == ("2024-06-02", "2024-06-02", "12:01", "23:59")


def test_api_source_reads_all_sessions(spark):
    df = read_sessions_api(spark, "2024-06-01", "2024-06-03")
    assert df.count() == 300          # all fixture sessions
    assert df.select("id").distinct().count() == 300


def test_api_source_interval_partitioning(spark):
    df = read_sessions_api(spark, "2024-06-01", "2024-06-03")
    # 3 days × 2 half-day windows = 6 input partitions (parallel scans)
    assert df.rdd.getNumPartitions() == 6


def test_api_source_date_pushdown(spark):
    df = read_sessions_api(spark, "2024-06-01", "2024-06-01")
    got = df.select("start_dt").collect()
    assert all(r.start_dt.startswith("2024-06-01") for r in got)
    assert 0 < len(got) < 300


def test_api_source_pagination_boundary(spark):
    # page size smaller than result set forces multi-page accumulation
    small = read_sessions_api(spark, "2024-06-01", "2024-06-03", page_limit=7)
    assert small.count() == 300       # same rows regardless of page size


def test_api_source_dsl_pushdown(spark):
    # date_range term overrides start/stop AND prunes intervals; the time
    # range kills every afternoon window before any fetch happens
    dsl = "date_range,2024-06-01,2024-06-02||00:00,12:00±type,call,chat|or"
    df = read_sessions_api(spark, "2024-06-01", "2024-06-03", filters=dsl)
    assert df.rdd.getNumPartitions() == 2     # 2 days x morning only
    rows = df.collect()
    assert rows
    for r in rows:
        assert r.start_dt[:10] in ("2024-06-01", "2024-06-02")
        assert r.start_dt[11:16] <= "12:00"
        assert r.type in ("call", "chat")
    # parity: pushed result == unpushed scan filtered client-side
    full = read_sessions_api(spark, "2024-06-01", "2024-06-03").collect()
    expect = {r.id for r in full
              if r.start_dt[:10] <= "2024-06-02" and r.start_dt[11:16] <= "12:00"
              and r.type in ("call", "chat")}
    assert {r.id for r in rows} == expect


class _StubApi:
    """In-process HTTP stub speaking the reference's /sessions protocol
    (Extract.py:41-50 URL shape, {"items": [...]} response)."""

    def __init__(self, rows):
        import http.server
        import json as _json
        import threading
        import urllib.parse

        self.requests = []
        stub = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 — stdlib naming
                parsed = urllib.parse.urlparse(self.path)
                qs = urllib.parse.parse_qs(parsed.query)
                if parsed.path.rstrip("/") == "/sessions/filter/number_of_sessions":
                    stub.requests.append({"path": parsed.path,
                                          "filters": qs["filters"][0]})
                    body = _json.dumps(
                        {"number_of_sessions": len(rows)}).encode()
                elif parsed.path.rstrip("/") != "/sessions":
                    # detail route /sessions/{id}[{suffix}]
                    stub.requests.append({"path": parsed.path})
                    parts = parsed.path.split("/")
                    payload = {"id": parts[2],
                               "suffix": "/".join(parts[3:]),
                               "additional_info": f"info-{parts[2]}"}
                    body = _json.dumps(payload).encode()
                else:
                    stub.requests.append({
                        "path": parsed.path,
                        "skip": int(qs["skip"][0]),
                        "limit": int(qs["limit"][0]),
                        "filters": qs["filters"][0],
                        "auth": self.headers.get("Authorization"),
                    })
                    skip, limit = int(qs["skip"][0]), int(qs["limit"][0])
                    body = _json.dumps(
                        {"items": rows[skip:skip + limit]}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):  # noqa: N802 — stdlib naming
                # OAuth2 password grant (reference utils.py:108-118
                # init_et's user:password@domain Config): form-encoded
                # username/password -> {"access_token": ...}; wrong
                # credentials -> 401
                parsed = urllib.parse.urlparse(self.path)
                n = int(self.headers.get("Content-Length", "0"))
                form = urllib.parse.parse_qs(self.rfile.read(n).decode())
                stub.requests.append({"path": parsed.path,
                                      "username": form.get("username",
                                                           [""])[0]})
                if (parsed.path.rstrip("/") == "/login/access-token"
                        and form.get("username") == ["alice"]
                        and form.get("password") == ["s3cret"]):
                    body = _json.dumps({"access_token": "xchg-tok-alice",
                                        "token_type": "bearer"}).encode()
                    self.send_response(200)
                else:
                    body = _json.dumps(
                        {"detail": "Incorrect email or password"}).encode()
                    self.send_response(401)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):      # silence stderr
                pass

        self.server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self.server.server_address[1]
        threading.Thread(target=self.server.serve_forever, daemon=True).start()

    def close(self):
        self.server.shutdown()
        self.server.server_close()


def test_http_service_pagination_filters_and_auth():
    from etl_ender_turing_spark.sources.api_source import HttpSessionService

    rows = [{"id": f"s{i}", "v": i} for i in range(12)]
    api = _StubApi(rows)
    try:
        svc = HttpSessionService(f"http://127.0.0.1:{api.port}", token="tok123")
        # manual pagination, page size 5 -> 5, 5, 2
        got, skip = [], 0
        while True:
            page = svc.query("2024-06-01", "2024-06-01", "00:00", "12:00",
                             skip=skip, limit=5,
                             extra=[("type", ("call", "chat"))])
            got.extend(page)
            if len(page) < 5:
                break
            skip += 5
        assert [r["id"] for r in got] == [r["id"] for r in rows]
        assert len(api.requests) == 3
        assert [r["skip"] for r in api.requests] == [0, 5, 10]
        # the DSL travels url-encoded and decodes to the reference grammar
        assert api.requests[0]["filters"] == \
            "date_range,2024-06-01,2024-06-01||00:00,12:00±type,call,chat"
        assert all(r["auth"] == "Bearer tok123" for r in api.requests)
        assert all(r["path"] == "/sessions" for r in api.requests)
    finally:
        api.close()


def test_http_service_password_token_exchange():
    """Credential auth mode (reference utils.py:108-118 init_et): the
    service exchanges user/password for a bearer token on FIRST use,
    then reuses it — one login per client instance (= per Spark task),
    never per page. A ready token always wins (PAT path unchanged)."""
    import urllib.error

    from etl_ender_turing_spark.sources.api_source import HttpSessionService

    rows = [{"id": f"s{i}", "v": i} for i in range(7)]
    api = _StubApi(rows)
    try:
        svc = HttpSessionService(f"http://127.0.0.1:{api.port}",
                                 user="alice", password="s3cret")
        got = svc.query("2024-06-01", "2024-06-01", limit=5)
        got += svc.query("2024-06-01", "2024-06-01", skip=5, limit=5)
        assert [r["id"] for r in got] == [r["id"] for r in rows]
        logins = [r for r in api.requests
                  if r["path"] == "/login/access-token"]
        pages = [r for r in api.requests if r["path"] == "/sessions"]
        assert len(logins) == 1 and logins[0]["username"] == "alice"
        assert all(r["auth"] == "Bearer xchg-tok-alice" for r in pages)
        # a pre-provisioned token suppresses the exchange entirely
        api.requests.clear()
        pat = HttpSessionService(f"http://127.0.0.1:{api.port}",
                                 token="pat9", user="alice",
                                 password="s3cret")
        pat.query("2024-06-01", "2024-06-01", limit=5)
        assert all(r["path"] == "/sessions" for r in api.requests)
        # wrong credentials surface as the server's 401, not a hang or
        # a silent unauthenticated scan
        bad = HttpSessionService(f"http://127.0.0.1:{api.port}",
                                 user="alice", password="wrong")
        with pytest.raises(urllib.error.HTTPError):
            bad.query("2024-06-01", "2024-06-01", limit=5)
    finally:
        api.close()


def test_api_source_reads_through_http_with_credentials(spark):
    """End-to-end: executor tasks perform their own token exchange (the
    client is built inside the partition reader) and paginate with the
    exchanged bearer token."""
    from etl_ender_turing_spark.pipeline.fixtures import raw_sessions

    rows = [r for r in raw_sessions()
            if r["start_dt"][:10] == "2024-06-01"][:10]
    api = _StubApi(rows)
    try:
        df = read_sessions_api(spark, "2024-06-01", "2024-06-01",
                               page_limit=7,
                               endpoint=f"http://127.0.0.1:{api.port}",
                               user="alice", password="s3cret")
        got = df.collect()
        assert len(got) == 2 * len(rows)   # stub ignores date windows
        pages = [r for r in api.requests if r["path"] == "/sessions"]
        logins = [r for r in api.requests
                  if r["path"] == "/login/access-token"]
        assert pages and all(
            r["auth"] == "Bearer xchg-tok-alice" for r in pages)
        # one exchange per partition task (2 half-day intervals), not per page
        assert 1 <= len(logins) <= 2
    finally:
        api.close()


def test_api_source_reads_through_http(spark):
    """End-to-end: the Spark DataSource paginates the HTTP stub from
    executor tasks (endpoint option switches off the fixture fake)."""
    from etl_ender_turing_spark.pipeline.fixtures import raw_sessions

    rows = [r for r in raw_sessions()
            if r["start_dt"][:10] == "2024-06-01"][:20]
    api = _StubApi(rows)
    try:
        df = read_sessions_api(spark, "2024-06-01", "2024-06-01",
                               page_limit=7,
                               endpoint=f"http://127.0.0.1:{api.port}",
                               token="t")
        got = df.collect()
        # the stub ignores date windows, so both half-day partitions return
        # all rows: 2 partitions x 20 rows, each paginated 7+7+6
        assert len(got) == 2 * len(rows)
        assert {r.id for r in got} == {r["id"] for r in rows}
        assert len(api.requests) == 6
    finally:
        api.close()


def test_detail_fetch_guarded_lookup_join(spark):
    """Per-row detail fetch (reference get_et_session_details): guarded
    rows skip the fetch, fetched payload lands as a JSON column, failures
    degrade to NULL — all executed inside executor tasks."""
    import json as _json

    from etl_ender_turing_spark.sources.api_source import fetch_session_details

    api = _StubApi([])
    try:
        df = spark.createDataFrame(
            [("s1", 2), ("s2", 0), ("s3", 1)],      # s2 guarded out
            "id string, comments_count int").repartition(2)
        out = fetch_session_details(
            df, f"http://127.0.0.1:{api.port}", suffix="/comments",
            guard_col="comments_count", retry_attempts=1)
        got = {r.id: r.comments for r in out.collect()}
        assert got["s2"] is None                    # guard skipped the fetch
        for sid in ("s1", "s3"):
            payload = _json.loads(got[sid])
            assert payload["id"] == sid and payload["suffix"] == "comments"
        fetched = {r["path"] for r in api.requests}
        assert fetched == {"/sessions/s1/comments", "/sessions/s3/comments"}

        # top-level meta fetch (no suffix) -> 'details' column
        meta = fetch_session_details(
            df.filter("id = 's1'"), f"http://127.0.0.1:{api.port}",
            retry_attempts=1)
        row = meta.collect()[0]
        assert _json.loads(row.details)["additional_info"] == "info-s1"
    finally:
        api.close()

    # dead endpoint: retry budget exhausts, row degrades to NULL
    dead = fetch_session_details(
        spark.createDataFrame([("sX", 1)], "id string, comments_count int"),
        "http://127.0.0.1:1", retry_attempts=2, retry_base_s=0.01)
    assert dead.collect()[0].details is None


def test_with_retry_backoff_and_reraise():
    from etl_ender_turing_spark.sources.api_source import with_retry

    sleeps = []
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 4:
            raise ConnectionError("transient")
        return "ok"

    assert with_retry(flaky, _sleep=sleeps.append) == "ok"
    assert calls["n"] == 4
    assert sleeps == [5.0, 10.0, 20.0]          # exp backoff, base 5

    def always_fails():
        raise TimeoutError("down")

    sleeps.clear()
    try:
        with_retry(always_fails, attempts=3, _sleep=sleeps.append)
        raise AssertionError("should have re-raised")
    except TimeoutError:
        pass
    assert len(sleeps) == 2                      # attempts-1 waits


def test_count_reconciliation_completes_the_reference_todo(spark):
    """reference Extract.py:158 left 'compare extracted count vs
    number_of_sessions endpoint' as a TODO — here it's implemented and
    must hold on a clean extraction."""
    from etl_ender_turing_spark.sources.api_source import (
        reconcile_extraction, session_count,
    )

    from etl_ender_turing_spark.pipeline.fixtures import raw_sessions

    rows = [r for r in raw_sessions()
            if r["start_dt"][:10] == "2024-06-01"][:20]
    api = _StubApi(rows)
    try:
        endpoint = f"http://127.0.0.1:{api.port}"
        assert session_count(endpoint, "2024-06-01", "2024-06-01") == 20
        df = read_sessions_api(spark, "2024-06-01", "2024-06-01",
                               endpoint=endpoint)
        # stub ignores windows: both half-day partitions return all rows
        out = reconcile_extraction(df, endpoint, "2024-06-01", "2024-06-01")
        assert out["reported"] == 20 and out["extracted"] == 40
        assert out["match"] is False       # which is exactly what the
        # reconciliation exists to surface on a double-read...
        dedup = df.dropDuplicates(["id"])
        out2 = reconcile_extraction(dedup, endpoint,
                                    "2024-06-01", "2024-06-01")
        assert out2 == {"extracted": 20, "reported": 20, "match": True}
        assert any(r["path"].endswith("number_of_sessions")
                   for r in api.requests)
    finally:
        api.close()


def test_streaming_session_source_matches_batch_and_resumes(spark, tmp_path):
    """The cron-loop-as-a-stream: readStream over the session API drains
    every half-day interval with durable offsets; the availableNow result
    equals the batch scan, and a SECOND run over the same checkpoint is a
    no-op (offset log remembers the ingested intervals)."""
    from etl_ender_turing_spark.sources.api_source import register

    register(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_once():
        q = (spark.readStream.format("session_api")
             .option("start", "2024-06-01").option("stop", "2024-06-02")
             .load()
             .writeStream.format("parquet")
             .outputMode("append")
             .option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return spark.read.parquet(out)

    got = run_once()
    want = read_sessions_api(spark, "2024-06-01", "2024-06-02")
    assert sorted(r.id for r in got.collect()) == \
        sorted(r.id for r in want.collect())
    n1 = got.count()
    assert n1 > 0
    got2 = run_once()       # same checkpoint: offsets say all ingested
    assert got2.count() == n1       # no re-fetch, no duplicates
