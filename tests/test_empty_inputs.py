"""Every batch catalog query must survive EMPTY input tables (0 rows,
full schema) — empty partitions and empty filter results are routine at
100 TB, and an operator that crashes on them (a bare .first()[...], a
partitioned write emitting no files) is a production incident.

This gate runs all non-streaming builders against a schema-only copy of
the testdata. It found and pinned two real bugs: kmeans_fit's
first()["d"] on an empty corpus, and build_ivf_index's partitionBy write
of an empty frame producing an unreadable (file-less) index.
"""

import pytest

from etl_ender_turing_spark.plans import CATALOG
from etl_ender_turing_spark.sources.readers import TESTDATA_TABLES

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("empty_sf"))
    for t in TESTDATA_TABLES:
        (spark.read.parquet(f"{SRC}/{t}.parquet").limit(0)
         .write.mode("overwrite").parquet(f"{d}/{t}.parquet"))
    return d


def test_all_batch_queries_survive_empty_tables(spark, empty_sf):
    failures = {}
    for name, spec in CATALOG.items():
        if name.startswith("q_stream"):
            continue     # streams spin checkpoints; covered by their tests
        try:
            spec.builder(spark, empty_sf).count()
        except Exception as exc:  # noqa: BLE001 — collected and asserted
            failures[name] = repr(exc)[:200]
    assert not failures, failures


@pytest.fixture(scope="module")
def null_sf(spark, tmp_path_factory):
    """Keys intact, every nullable value column all-NULL — the shape a
    schema-drifted upstream or a pruned fetch produces."""
    from pyspark.sql import functions as F

    keys = {"doc_id", "vec_id", "event_id", "o_orderkey", "l_orderkey",
            "l_linenumber", "c_custkey", "s_suppkey", "p_partkey",
            "n_nationkey", "r_regionkey", "user_id"}
    d = str(tmp_path_factory.mktemp("null_sf"))
    for t in TESTDATA_TABLES:
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        cols = [F.col(c) if c in keys
                else F.lit(None).cast(df.schema[c].dataType).alias(c)
                for c in df.columns]
        df.select(cols).write.mode("overwrite").parquet(f"{d}/{t}.parquet")
    return d


def test_all_batch_queries_survive_all_null_values(spark, null_sf):
    """Found 3 real bugs on first run: token-budget prefix sums += None,
    multimodal bytes(None), kmeans size(NULL) dimension probe."""
    failures = {}
    for name, spec in CATALOG.items():
        if name.startswith("q_stream"):
            continue
        try:
            spec.builder(spark, null_sf).count()
        except Exception as exc:  # noqa: BLE001
            failures[name] = repr(exc)[:200]
    assert not failures, failures


def test_text_queries_survive_adversarial_documents(spark, tmp_path):
    """Empty strings, whitespace-only, a 50 KB single token, mixed
    unicode/emoji/quotes/escapes, control chars, punct-only, heavy
    repetition — the text-operator battery must process all of them."""
    adv = ["", " ", "   ", "x" * 50_000,
           "ü míx 中文 🙂 'quote' \"dq\" \\back",
           "a\tb\nc", ".,;!?", "same same same same"]
    d = str(tmp_path / "adv_sf")
    for t in TESTDATA_TABLES:
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        if t == "documents":
            rows = [(i, adv[i % len(adv)], "en", f"src{i % 3}",
                     len(adv[i % len(adv)])) for i in range(64)]
            df = spark.createDataFrame(rows, df.schema)
        df.write.mode("overwrite").parquet(f"{d}/{t}.parquet")
    text_queries = [n for n, s in CATALOG.items()
                    if not n.startswith("q_stream")
                    and ("documents" in (s.oracle or "") or "dedup" in n
                         or "bm25" in n or "quality" in n)]
    failures = {}
    for name in text_queries:
        try:
            CATALOG[name].builder(spark, d).count()
        except Exception as exc:  # noqa: BLE001
            failures[name] = repr(exc)[:200]
    assert not failures, failures
