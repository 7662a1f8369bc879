"""CLI lifecycle parity (reference run-et-etl.py modes)."""

import os
import sqlite3

import run_etl


def test_historical_db_sync(spark, tmp_path):
    wh = str(tmp_path / "wh")
    counts = run_etl.main(["--load-to", "db", "--start-dt", "2024-06-01",
                           "--stop-dt", "2024-06-03", "--out", wh])
    assert counts["sessions"] == 300
    assert os.path.exists(os.path.join(wh, "sessions"))
    # historical mode must NOT write the incremental watermark
    assert not os.path.exists(os.path.join(wh, "_sync_state"))


def test_daily_mode_runs_incremental_and_watermark(spark, tmp_path):
    wh = str(tmp_path / "whd")
    counts = run_etl.main(["--load-to", "db", "--out", wh])
    assert 0 < counts["sessions"] < 300          # one fixture day only
    assert os.path.exists(os.path.join(wh, "_sync_state"))


def test_file_export_naming_parity(spark, tmp_path):
    out = str(tmp_path / "export")
    counts = run_etl.main(["--load-to", "json", "--start-dt", "2024-06-01",
                           "--stop-dt", "2024-06-03", "--out", out])
    files = set(os.listdir(out))
    assert "dict-agents.json" in files           # dim naming
    assert "sessions-2024-06-01-2024-06-03.json" in files   # fact naming
    assert counts["users"] == 11                 # 10 + injected default


def test_sqlite_export(spark, tmp_path):
    db = str(tmp_path / "wh.db")
    counts = run_etl.main(["--load-to", "sqlite", "--start-dt", "2024-06-01",
                           "--out", db])
    with sqlite3.connect(db) as con:
        n = con.execute("SELECT COUNT(*) FROM sessions").fetchone()[0]
        tables = {r[0] for r in con.execute(
            "SELECT name FROM sqlite_master WHERE type='table'")}
    assert n == counts["sessions"] == 300
    assert "agents" in tables and "sessions_transcripts" in tables


def test_test_mode_caps_sessions(spark, tmp_path):
    wh = str(tmp_path / "wht")
    counts = run_etl.main(["--load-to", "db", "--start-dt", "2024-06-01",
                           "--stop-dt", "2024-06-03", "--out", wh,
                           "--test-mode", "--test-mode-limit-sessions", "50"])
    assert counts["sessions"] <= 50


def test_curate_mode_writes_training_set(spark, tmp_path):
    import run_etl

    out = str(tmp_path / "train")
    counts = run_etl.main(["--curate", "/root/testdata/sf0.001",
                           "--out", out])
    assert counts["training_set"] > 0
    got = spark.read.parquet(out)
    assert set(got.columns) == {"doc_id", "source", "n_tokens"}
    assert got.filter("n_tokens < 40").count() == 0    # quality gate held


def test_audit_mode_reports_zero_violations(spark, tmp_path):
    import run_etl
    wh = str(tmp_path / "wh")
    counts = run_etl.main(["--load-to", "db", "--start-dt", "2024-06-01",
                           "--stop-dt", "2024-06-03", "--out", wh,
                           "--audit"])
    audit = counts["audit"]
    assert audit, "audit dict should not be empty"
    # registry-driven battery: unique + not-null per synced keyed table
    assert any(c.startswith("sessions.unique:") for c in audit)
    assert all(v == 0 for v in audit.values()), audit


def test_stream_mode_syncs_and_resumes_idempotently(spark, tmp_path):
    import run_etl
    wh = str(tmp_path / "wh")
    args = ["--load-to", "db", "--start-dt", "2024-06-01",
            "--stop-dt", "2024-06-02", "--out", wh, "--stream"]
    c1 = run_etl.main(args)
    assert c1["sessions_stream"] > 0
    c2 = run_etl.main(args)      # restart: offsets skip ingested intervals
    assert c2 == c1


def test_stream_compaction_bounds_files_and_preserves_rows(spark, tmp_path):
    from etl_ender_turing_spark.sources.maintenance import table_file_stats
    from etl_ender_turing_spark.streaming.stream import run_api_stream_sync

    plain = str(tmp_path / "wh_plain")
    compacted = str(tmp_path / "wh_compact")
    kw = dict(start="2024-06-01", stop="2024-06-03")
    a = run_api_stream_sync(spark, plain, str(tmp_path / "ck1"),
                            compact_every=0, **kw)
    b = run_api_stream_sync(spark, compacted, str(tmp_path / "ck2"),
                            compact_every=1, **kw)
    # identical rows (compaction is pure maintenance)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    import os
    n_plain, _ = table_file_stats(os.path.join(plain, "sessions_stream"))
    n_comp, bytes_comp = table_file_stats(
        os.path.join(compacted, "sessions_stream"))
    # the accreted table ends at the compaction target (~128 MB/file -> 1
    # file at fixture scale), bounded regardless of epoch count
    assert n_comp <= max(1, -(-bytes_comp // (128 * 1024 * 1024)))
    assert n_comp <= n_plain


def test_report_mode_writes_monitoring_tables(spark, tmp_path):
    import run_etl

    out = str(tmp_path / "report")
    counts = run_etl.main(["--report", "/root/testdata/sf0.001",
                           "--out", out])
    assert counts["attrition"] == 5          # one row per pipeline stage
    assert counts["manifest"] > 0
    assert counts["psi_drift"] > 0
    attr = {r.stage: r.docs_out
            for r in spark.read.parquet(out + "/attrition").collect()}
    assert attr["raw"] >= attr["stratified_sample"]
    psi = spark.read.parquet(out + "/psi_drift")
    assert {"source", "psi"} == set(psi.columns)
