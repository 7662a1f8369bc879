"""Chunking / sequence-packing / TF-IDF semantics on tiny hand-built
inputs (catalog-level oracle checks cover the full data)."""

import math

import pytest
from pyspark.sql import functions as F

from etl_ender_turing_spark.operators import chunking as ck
from etl_ender_turing_spark.operators import terms as tm


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(1, "a b c d e f g h i j"),     # 10 tokens
         (2, "x y"),                     # shorter than one chunk
         (3, "solo")],
        "doc_id long, text string")


def test_chunk_windows_and_overlap(docs):
    # chunk=4, overlap=2 -> step=2: starts 0,2,4,6,8 for the 10-token doc
    out = (ck.chunk_documents(docs, chunk_tokens=4, overlap=2)
           .filter("doc_id = 1").orderBy("start").collect())
    assert [r.start for r in out] == [0, 2, 4, 6, 8]
    assert out[0].chunk_text == "a b c d"
    assert out[1].chunk_text == "c d e f"          # 2-token overlap
    assert out[-1].chunk_text == "i j"             # trailing remainder kept
    assert [r.n_tokens for r in out] == [4, 4, 4, 4, 2]
    assert [r.chunk_id for r in out] == [0, 1, 2, 3, 4]


def test_chunk_short_doc_single_chunk(docs):
    out = (ck.chunk_documents(docs, chunk_tokens=4, overlap=2)
           .filter("doc_id = 2").collect())
    assert len(out) == 1 and out[0].chunk_text == "x y" and out[0].n_tokens == 2


def test_chunk_rejects_bad_overlap(docs):
    with pytest.raises(ValueError):
        ck.chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_chunk_plan_has_no_shuffle(docs):
    plan = (ck.chunk_documents(docs)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_pack_sequences_budget_boundaries(spark):
    # one shard so the running sum is a single ordered stream
    df = spark.createDataFrame(
        [(i, " ".join(["t"] * 40)) for i in range(1, 6)],   # 5 docs x 40 toks
        "doc_id long, text string")
    out = (ck.pack_sequences(df, budget=100, n_shards=1)
           .orderBy("doc_id").collect())
    # cumulative: 40 80 120 160 200 -> preceding totals 0 40 80 120 160
    assert [r.seq for r in out] == [0, 0, 0, 1, 1]
    assert [r.cum_tokens for r in out] == [40, 80, 120, 160, 200]


def test_pack_sequences_deterministic_across_layout(spark):
    df = spark.createDataFrame(
        [(i, " ".join(["w"] * (5 + i % 7))) for i in range(60)],
        "doc_id long, text string")
    a = ck.pack_sequences(df, budget=64, n_shards=4)
    b = ck.pack_sequences(df.repartition(13), budget=64, n_shards=4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_tfidf_scores_and_ties(spark):
    df = spark.createDataFrame(
        [(1, "apple apple banana"),
         (2, "banana cherry"),
         (3, "cherry date date")],
        "doc_id long, text string")
    out = tm.tfidf_top_terms(df, k=2)
    rows = {(r.doc_id, r.term): (r.tf, r.tfidf) for r in out.collect()}
    # 'apple' appears twice in doc 1 and only in doc 1: tf=2, df=1, N=3
    assert rows[(1, "apple")] == (2, round(2 * math.log(3 / 1), 6))
    # 'banana' in 2 of 3 docs
    assert rows[(1, "banana")][1] == round(1 * math.log(3 / 2), 6)
    # every doc yields exactly k=2 rows here (>=2 distinct terms each)
    assert out.groupBy("doc_id").count().filter("count != 2").count() == 0


def test_tfidf_window_is_per_document(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "b c")],
                               "doc_id long, text string")
    plan = (tm.tfidf_top_terms(df)
            ._jdf.queryExecution().executedPlan().toString())
    # the ranking window must be partitioned by document (the only
    # SinglePartition exchange allowed is the 1-row n_docs count)
    assert "windowspecdefinition(doc_id" in plan
    # rank pushes the k-limit below the shuffle (WindowGroupLimit partial)
    assert "WindowGroupLimit" in plan


def test_bm25_index_parity_and_bucket_pruning(spark, tmp_path):
    from etl_ender_turing_spark.operators import terms as tm
    from etl_ender_turing_spark.sources.readers import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    terms = ("vector", "stream")
    tm.build_text_index(docs, "bm25_idx", n_buckets=16)
    try:
        inline = tm.bm25_topk(docs, terms, k=5).collect()
        served_df = tm.bm25_from_index(spark, "bm25_idx", terms, k=5)
        assert sorted(map(tuple, served_df.collect())) == \
            sorted(map(tuple, inline))
        # the postings scan must be bucket-pruned to the query terms'
        # buckets, not read the full inverted index
        plan = (served_df._jdf.queryExecution().executedPlan().toString())
        assert "SelectedBucketsCount" in plan, plan[:1200]
    finally:
        spark.sql("DROP TABLE IF EXISTS bm25_idx_postings")
        spark.sql("DROP TABLE IF EXISTS bm25_idx_stats")


def test_li_index_parity_with_inline(spark, tmp_path):
    """late_interaction_from_index must reproduce the inline
    late_interaction_topk result exactly (the q_li_from_index
    lifecycle), and serving must not touch the corpus text: the served
    plan reads only the two persisted index tables."""
    from etl_ender_turing_spark.operators import feature_hash as fh
    from etl_ender_turing_spark.sources.readers import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    terms = ("vector", "stream", "join", "window")
    fh.build_li_index(docs, "li_idx", n_buckets=8,
                      path=str(tmp_path / "li_idx"))
    try:
        inline = fh.late_interaction_topk(docs, terms, k=10).collect()
        served_df = fh.late_interaction_from_index(spark, "li_idx",
                                                   terms, k=10)
        assert sorted(map(tuple, served_df.collect())) == \
            sorted(map(tuple, inline))
        plan = served_df._jdf.queryExecution().executedPlan().toString()
        assert "documents.parquet" not in plan   # zero corpus-text work
    finally:
        spark.sql("DROP TABLE IF EXISTS li_idx_doc_toks")
        spark.sql("DROP TABLE IF EXISTS li_idx_vocab_emb")


def test_class_tfidf_surfaces_group_exclusive_terms(spark):
    from etl_ender_turing_spark.operators import terms as tm

    docs = spark.createDataFrame(
        [(1, "alpha alpha shared", "s1"), (2, "alpha shared shared", "s1"),
         (3, "beta beta shared", "s2"), (4, "beta gamma shared", "s2")],
        "doc_id long, text string, source string")
    out = tm.class_tfidf_keywords(docs, k=2).collect()
    top = {r.source: [x.term for x in sorted(
        [q for q in out if q.source == r.source], key=lambda q: q.rnk)]
        for r in out}
    # the group-exclusive term leads; 'shared' appears in both groups so
    # its smoothed idf ln((1+2)/(1+2)) = 0 -> weight 0, never rank 1
    assert top["s1"][0] == "alpha"
    assert top["s2"][0] == "beta"
    shared = [r for r in out if r.term == "shared"]
    assert all(r.wt == 0.0 for r in shared)
    assert all(r.rnk == 2 for r in shared)


def test_pack_efficiency_reports_both_regimes(spark):
    from etl_ender_turing_spark.operators import chunking as ck
    # 4 docs of 10 tokens each, budget 15, one shard: packing puts docs
    # at cumulative starts 0,10,20,30 -> seqs 0,0,1,2 (doc 2 spills over
    # the seq-0 boundary into seq 1)
    rows = [(i, " ".join(f"t{j}" for j in range(10))) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = ck.pack_efficiency(df, budget=15, n_shards=1).collect()[0]
    assert (r.n_docs, r.n_sequences, r.total_tokens) == (4, 3, 40)
    assert abs(r.mean_seq_tokens - round(40 / 3, 6)) < 2e-6
    # overflow regime on seq 0 (20 tokens in a 15 budget), padding on
    # seq 2 -> overall utilization 40 / 45
    assert abs(r.utilization - round(40 / 45, 6)) < 2e-6


def test_bm25_prf_expands_vocabulary_mismatch(spark):
    """A doc that never contains the query term but shares the feedback
    docs' vocabulary enters the top-k only via expansion."""
    from pyspark.sql import Row

    from etl_ender_turing_spark.operators.terms import bm25_prf_topk
    rows = (
        # docs about 'merge' that also say 'upsert' a lot; filler
        # tokens are CORPUS-COMMON so idf keeps them out of expansion
        [Row(doc_id=i, text="merge upsert upsert upsert scan filter")
         for i in range(5)]
        # the vocabulary-mismatch doc: upsert-only, never 'merge'
        + [Row(doc_id=50, text="upsert upsert upsert delta table")]
        # background noise sharing the filler vocabulary
        + [Row(doc_id=100 + i, text="scan filter project row group")
           for i in range(20)])
    df = spark.createDataFrame(rows)
    got = [r.doc_id for r in
           bm25_prf_topk(df, ("merge",), k=8, n_fb_docs=3,
                         n_fb_terms=2).collect()]
    assert 50 in got          # surfaced purely by expansion
    # ...and ranked above every background doc that leaks into the tail
    noise_ranks = [i for i, d in enumerate(got) if d >= 100]
    assert all(got.index(50) < i for i in noise_ranks)


def test_bm25_prf_deterministic_across_runs(spark):
    from etl_ender_turing_spark.operators.terms import bm25_prf_topk
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = [(r.doc_id, r.score6) for r in
         bm25_prf_topk(docs, ("vector", "stream"), k=10).collect()]
    b = [(r.doc_id, r.score6) for r in
         bm25_prf_topk(docs, ("vector", "stream"), k=10).collect()]
    assert a == b and len(a) == 10
