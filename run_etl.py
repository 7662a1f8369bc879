#!/usr/bin/env python3
"""CLI mirroring the reference's ``run-et-etl.py`` lifecycle, Spark-native.

Reference modes (run-et-etl.py:119-204):
- daily sync (no args): base dicts → previous-day session sync →
  incremental re-sync passes → watermark write;
- historical sync (--start-dt [--stop-dt]): base dicts + period sync only;
- ``--load-to`` selects the sink: db (MERGE-upsert warehouse) or a file
  format; ``--test-mode`` caps the session count.

Spark mapping: ``db`` loads the parquet MERGE warehouse via
``pipeline.sync`` (the engine's primary sink), ``sqlite`` drives the
executed SQL-store sink (`sources/db_sink.py`), file formats export the
transformed star schema with the reference's naming parity
(``dict-{name}.{ext}`` dims, ``{name}-{start}-{stop}.{ext}`` facts).

Extraction here reads the deterministic fixture entities (the API double
— no external network in this environment); the HTTP session source
(`sources/api_source.py`, ``endpoint`` option) is the documented live
swap point.
"""

from __future__ import annotations

import argparse
import os

# fixture data lives in a 3-day window; "daily" mode defaults to its
# middle day — the fixture-world equivalent of "yesterday"
FIXTURE_START, FIXTURE_STOP = "2024-06-01", "2024-06-03"
FIXTURE_YESTERDAY = "2024-06-02"

# all 7 reference formats (run-et-etl.py:133-135 + Load.py:186-224) plus
# orc (the other native columnar container); xls writes OOXML content
# under the legacy name — see sinks.write_file
FILE_FORMATS = ("json", "csv", "tsv", "parquet", "orc", "xlsx", "xls", "pickle")


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Sync the star schema from raw entities to a warehouse "
                    "or file export (reference run-et-etl.py parity)")
    p.add_argument("--load-to", default="db",
                   choices=("db", "sqlite") + FILE_FORMATS)
    p.add_argument("--start-dt", default=None,
                   help="historical sync start (YYYY-MM-DD); omit for daily")
    p.add_argument("--stop-dt", default=None,
                   help="historical sync stop; defaults to start (one day)")
    p.add_argument("--out", default="./warehouse",
                   help="warehouse dir (db), sqlite file, or export dir")
    p.add_argument("--filters", default="",
                   help="extra filter-DSL terms for the period sync")
    p.add_argument("--test-mode", action="store_true")
    p.add_argument("--test-mode-limit-sessions", type=int, default=200)
    p.add_argument("--stream", action="store_true",
                   help="run the session sync as a Structured Streaming "
                        "query (custom session_api stream source, durable "
                        "interval offsets, foreachBatch MERGE) instead of "
                        "the batch period sync; writes "
                        "OUT/sessions_stream")
    p.add_argument("--audit", action="store_true",
                   help="after a db sync, run the constraint audit "
                        "(unique keys, not-null, FK integrity from the "
                        "schema registry) over the loaded tables and "
                        "include an 'audit' dict in the result")
    p.add_argument("--curate", default=None, metavar="SF_DIR",
                   help="run the training-set curation pipeline (quality "
                        "gate -> exact dedup -> decontamination -> "
                        "stratified mixture) over SF_DIR/documents.parquet "
                        "and write the kept set to --out as parquet")
    p.add_argument("--report", default=None, metavar="SF_DIR",
                   help="write the corpus ops-monitoring report over "
                        "SF_DIR/documents.parquet to --out: per-stage "
                        "curation attrition funnel, order-independent "
                        "corpus manifest checksums, and per-source PSI "
                        "drift between the id-median halves")
    return p.parse_args(argv)


def audit_warehouse(spark, out_dir: str) -> dict:
    """Post-load constraint audit driven by the schema registry: every
    synced table's unique key must be unique and non-null, every declared
    FK must resolve — the validation the reference's Load.py never does."""
    import os

    from etl_ender_turing_spark.operators import constraints as cn
    from etl_ender_turing_spark.schemas import TABLES

    frames = {}
    for name in TABLES:
        path = os.path.join(out_dir, name)
        if os.path.isdir(path):
            frames[name] = spark.read.parquet(path)
    from pyspark.sql import functions as F

    def named(chk, table):
        return chk.withColumn(
            "constraint", F.concat(F.lit(table + "."), F.col("constraint")))

    checks = []
    for name, df in frames.items():
        key = TABLES[name].unique_key
        if key:
            checks.append(named(cn.check_unique(df, list(key)), name))
            for k in key:
                checks.append(named(cn.check_not_null(df, k), name))
    if not checks:
        return {}
    return {f"{r['constraint']}": r["n_violations"]
            for r in cn.audit(checks).collect()}


def main(argv=None) -> dict:
    from etl_ender_turing_spark.pipeline import raw_fixture_tables, transform_all
    from etl_ender_turing_spark.pipeline.sync import sync_incremental, sync_period
    from etl_ender_turing_spark.schemas import TABLES
    from etl_ender_turing_spark.session import get_spark
    from etl_ender_turing_spark.sources.db_sink import upsert_sqlite
    from etl_ender_turing_spark.sources.sinks import sink_path, write_file

    args = parse_args(argv)
    daily = args.start_dt is None
    start = args.start_dt or FIXTURE_YESTERDAY
    stop = args.stop_dt or (FIXTURE_YESTERDAY if daily else start)

    spark = get_spark("run-etl")

    if args.stream:
        from etl_ender_turing_spark.streaming.stream import (
            run_api_stream_sync,
        )
        # checkpoint lives IN the warehouse so a restart resumes offsets
        ckpt = os.path.join(args.out, "_stream_ckpt")
        os.makedirs(args.out, exist_ok=True)
        got = run_api_stream_sync(spark, args.out, ckpt, start, stop)
        return {"sessions_stream": got.count()}

    if args.report is not None:
        from pyspark.sql import functions as F

        from etl_ender_turing_spark.operators.conform import (
            corpus_manifest, psi_drift,
        )
        from etl_ender_turing_spark.operators.curation import (
            curation_attrition,
        )
        from etl_ender_turing_spark.sources.readers import read_table

        docs = read_table(spark, args.report, "documents")
        # deterministic snapshot split for the drift monitor: in
        # production ref/cur are yesterday's and today's loads; the
        # fixture world splits at the id median (one driver scalar)
        mid = docs.agg(F.expr("percentile(doc_id, 0.5)")).first()[0]
        reports = {
            "attrition": curation_attrition(docs, rates={},
                                            default_rate=1.0),
            "manifest": corpus_manifest(docs),
            "psi_drift": psi_drift(docs.filter(F.col("doc_id") <= mid),
                                   docs.filter(F.col("doc_id") > mid)),
        }
        os.makedirs(args.out, exist_ok=True)
        counts = {}
        for name, df in reports.items():
            path = os.path.join(args.out, name)
            df.write.mode("overwrite").parquet(path)
            counts[name] = spark.read.parquet(path).count()
        return counts

    if args.curate is not None:
        from etl_ender_turing_spark.operators.curation import (
            prepare_training_set,
        )
        from etl_ender_turing_spark.sources.readers import read_table

        docs = read_table(spark, args.curate, "documents")
        kept = prepare_training_set(docs, rates={}, default_rate=1.0)
        kept.write.mode("overwrite").parquet(args.out)
        return {"training_set": spark.read.parquet(args.out).count()}

    raw = raw_fixture_tables(spark)
    if args.test_mode:
        raw["sessions"] = raw["sessions"].limit(args.test_mode_limit_sessions)

    if args.load_to == "db":
        counts = sync_period(spark, raw, args.out, start, stop, args.filters)
        if daily:
            sync_incremental(spark, raw, args.out, stop)
        if args.audit:
            counts["audit"] = audit_warehouse(spark, args.out)
        return counts

    tables = transform_all(raw, spark)
    if args.load_to == "sqlite":
        counts = {}
        for name, df in tables.items():
            counts[name] = upsert_sqlite(df, args.out, name,
                                         TABLES[name].unique_key)
        return counts

    fmt = {"pickle": "pkl"}.get(args.load_to, args.load_to)
    os.makedirs(args.out, exist_ok=True)
    counts = {}
    for name, df in tables.items():
        kind = "dim" if TABLES[name].kind in ("dim", "bridge") else "fact"
        path = sink_path(args.out, name, fmt, kind, start, stop)
        write_file(df, path, fmt)
        counts[name] = df.count()
    return counts


if __name__ == "__main__":
    out = main()
    print({k: v for k, v in sorted(out.items())})
