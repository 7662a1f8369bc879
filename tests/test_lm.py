"""Stupid-backoff n-gram LM: hand-computed branch arithmetic.

The oracle queries certify Spark==DuckDB; these tests pin Spark==MATH —
a tiny corpus where every backoff branch's score is computable on paper,
so a join-wiring bug that both engines shared would still be caught.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_ender_turing_spark.operators import lm


def _scores(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    counts = lm.train_ngram_counts(df, train_mod=5)
    out = lm.stupid_backoff_scores(df, counts)
    return {r.doc_id: r for r in out.collect()}


def _term(p: float) -> float:
    # the 6dp-floored surprisal the operator sums
    return math.floor(-math.log(p) * 1_000_000 + 0.5) / 1_000_000


def test_every_backoff_branch_matches_hand_math(spark):
    # train doc (id 0): tokens a b c a b d  -> trigrams {abc, bca, cab,
    # abd}, bigrams {ab:2, bc, ca, bd}, unigrams {a:2, b:2, c:1, d:1},
    # total 6
    rows = [
        (0, "a b c a b d"),
        # id 1: 'a b c' -> one position, trigram 'a b c' SEEN:
        #   p = c3(abc)/c2(ab) = 1/2
        (1, "a b c"),
        # id 2: 'c a b' -> trigram 'c a b' seen: p = 1/2? c3(cab)=1,
        #   c2(ca)=1 -> p = 1/1 = 1
        (2, "c a b"),
        # id 3: 'b c d' -> trigram 'b c d' UNSEEN, bigram 'c d' unseen,
        #   unigram 'd' seen: p = 0.4*(0.4*(1/6))
        (3, "b c d"),
        # id 4: 'a b d' -> trigram seen: p = c3(abd)/c2(ab) = 1/2
        (4, "a b d"),
        # id 6: 'a a b' -> tri 'a a b' unseen, bigram 'a b' seen:
        #   p = 0.4*(c2(ab)/c1(a)) = 0.4*(2/2)
        (6, "a a b"),
        # id 7: OOV tail -> tri/bi/uni all unseen: p = 0.4*(0.4*(1/6))
        (7, "a b zzz"),
        # id 8: too short -> no scored position, row absent
        (8, "a b"),
    ]
    got = _scores(spark, rows)

    assert 8 not in got
    assert got[1].n_scored == 1
    assert got[1].mean_nll == pytest.approx(_term(1 / 2), abs=1e-9)
    assert got[2].mean_nll == pytest.approx(_term(1.0), abs=1e-9)
    assert got[3].mean_nll == pytest.approx(
        _term(0.4 * (0.4 * (1 / 6))), abs=1e-9)
    assert got[4].mean_nll == pytest.approx(_term(1 / 2), abs=1e-9)
    assert got[6].mean_nll == pytest.approx(
        _term(0.4 * (2 / 2)), abs=1e-9)
    assert got[7].mean_nll == pytest.approx(
        _term(0.4 * (0.4 * (1 / 6))), abs=1e-9)
    # the train doc itself scores over 4 positions
    assert got[0].n_scored == 4


def test_counts_table_matches_hand_counts(spark):
    df = spark.createDataFrame([(0, "a b a b c")],
                               "doc_id long, text string")
    counts = {(r.ord, r.gram): r.cnt
              for r in lm.train_ngram_counts(df, train_mod=5).collect()}
    assert counts[(1, "a")] == 2 and counts[(1, "b")] == 2
    assert counts[(2, "a b")] == 2 and counts[(2, "b a")] == 1
    assert counts[(3, "a b a")] == 1 and counts[(3, "b a b")] == 1
    assert sum(c for (o, _), c in counts.items() if o == 1) == 5


def test_top_ngrams_is_deterministic_total_order(spark):
    df = spark.createDataFrame(
        [(0, "b a b a c")], "doc_id long, text string")
    top = lm.top_ngrams(lm.train_ngram_counts(df, train_mod=5), k=2)
    rows = [(r.ord, r.rn, r.gram) for r in top.collect()]
    # unigrams: a:2, b:2, c:1 -> ties broken gram-asc: a then b
    assert (1, 1, "a") in rows and (1, 2, "b") in rows
    assert all(rn <= 2 for _, rn, _ in rows)


def test_scoring_uses_windowgrouplimit_for_topk(spark):
    df = spark.createDataFrame([(0, "a b c d e")],
                               "doc_id long, text string")
    plan = lm.top_ngrams(lm.train_ngram_counts(df, train_mod=5),
                         k=3)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_multispace_and_short_docs_are_safe(spark):
    df = spark.createDataFrame(
        [(0, "a  b   c a b d"), (5, "  x  "), (10, "")],
        "doc_id long, text string")
    counts = lm.train_ngram_counts(df, train_mod=5)
    grams = {r.gram for r in counts.filter("ord = 2").collect()}
    assert "" not in {g for gr in grams for g in gr.split(" ")}
    out = lm.stupid_backoff_scores(df, counts)
    assert {r.doc_id for r in out.collect()} == {0}


def test_stream_scoring_equals_batch(spark, tmp_path):
    # the streaming map-fold scorer must reproduce the batch five-way
    # join scorer bit for bit (decimal addition is exact, so fold order
    # vs groupBy order cannot diverge)
    from etl_ender_turing_spark.streaming.stream import run_lm_gate_batch
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    counts = lm.train_ngram_counts(docs)
    batch = {r.doc_id: (r.n_scored, r.mean_nll)
             for r in lm.stupid_backoff_scores(docs, counts).collect()}
    got = {r.doc_id: (r.n_scored, r.mean_nll)
           for r in run_lm_gate_batch(
               spark, sf, str(tmp_path / "ckpt"), counts,
               glob_filter="documents.parquet").collect()}
    assert got == batch


def test_degenerate_repeated_token_doc_scores_low(spark):
    # a 5000-token "the the the ..." doc trained on itself: every
    # position scores p = c3/cbx = 4998/4999 (the final context bigram
    # has no successor, so the trigram count is one short of its
    # context count) -> near-zero surprisal, no blowup, no overflow
    df = spark.createDataFrame([(0, "the " * 5000)],
                               "doc_id long, text string")
    counts = lm.train_ngram_counts(df)
    r = lm.stupid_backoff_scores(df, counts).collect()[0]
    assert r.n_scored == 4998
    assert r.mean_nll == pytest.approx(_term(4998 / 4999), abs=1e-9)


def test_doremi_step_upweights_out_of_distribution_domain(spark):
    from etl_ender_turing_spark.operators import doremi, lm

    # domain A dominates the training split (fluent under the LM);
    # domain B is shuffled/rare text -> higher surprisal -> upweighted.
    # train_mod=5 trains on doc_id % 5 == 0.
    rows = []
    for i in range(40):
        rows.append((i * 5, "the quick brown fox jumps over the lazy dog",
                     "A"))
    for i in range(20):
        rows.append((i * 5 + 1,
                     "the quick brown fox jumps over the lazy dog", "A"))
    for i in range(20):
        rows.append((i * 5 + 2, "zymurgy qoph vext jackdaws nymph quiz",
                     "B"))
    docs = spark.createDataFrame(rows, "doc_id long, text string,"
                                       " source string")
    out = {r.source: r for r in
           doremi.doremi_step(docs, lm.train_ngram_counts(docs),
                              eta=0.1).collect()}
    assert set(out) == {"A", "B"}
    assert out["B"].mean_nll > out["A"].mean_nll
    assert out["B"].excess_nll > 0.0
    assert out["A"].excess_nll == 0.0          # at/below the corpus mean
    assert out["B"].weight > out["A"].weight
    assert abs(out["A"].weight + out["B"].weight - 1.0) < 1e-5
    # eta=0 collapses to the uniform mixture
    uni = {r.source: r.weight for r in
           doremi.doremi_step(docs, lm.train_ngram_counts(docs),
                              eta=0.0).collect()}
    assert uni["A"] == uni["B"] == 0.5


def test_quality_ensemble_ranks_garbled_text_lowest(spark):
    from etl_ender_turing_spark.operators import ensemble, lm

    fluent = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i * 5, fluent) for i in range(20)]           # training split
    rows += [(i * 5 + 1, fluent) for i in range(10)]      # held-out fluent
    rows += [(i * 5 + 2, "qoph zyx vext wub jilt nach prax") # garbled
             for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = ensemble.quality_ensemble(
        docs, lm.train_ngram_counts(docs)).collect()
    got = {r.doc_id: r for r in out}
    garbled = [r for r in out if r.doc_id % 5 == 2]
    fluent_rows = [r for r in out if r.doc_id % 5 != 2]
    assert garbled and fluent_rows
    # every garbled doc scores below every fluent doc on the ensemble
    assert max(r.quality for r in garbled) < min(
        r.quality for r in fluent_rows)
    # garbled docs are high-surprisal (positive z) and rare-token
    # (negative z) simultaneously — the two lenses agree
    for r in garbled:
        assert r.z_mean_nll > 0 and r.z_log_token_freq < 0
    # standardization: z-means are ~0 across the corpus
    n = len(out)
    for col in ("z_mean_nll", "z_mean_transition_p", "z_log_token_freq"):
        assert abs(sum(getattr(r, col) for r in out) / n) < 0.05
    assert got  # determinism sanity below
    again = ensemble.quality_ensemble(
        docs, lm.train_ngram_counts(docs)).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_unigram_lm_vocab_worked_example(spark):
    """Hand-derived 2-round Viterbi-EM: corpus 'xy xy xy z' seeds
    {x:3, y:3, xy:3, z:1}; round 1 segments 'xy' as the whole piece
    (1.203973 < 2.407946), so x/y fall off every path and floor at
    count 1 (the coverage rule); round 2 re-scores under total 6 —
    nll(xy) = ln 2, nll(singles) = ln 6."""
    from etl_ender_turing_spark.operators import unigram as ug

    df = spark.createDataFrame(
        [(1, "xy xy"), (2, "xy z")], "doc_id long, text string")
    got = {r.piece: (r.cnt, r.nll)
           for r in ug.unigram_lm_vocab(df, rounds=2, v_multi=10).collect()}
    assert got == {"xy": (3, 0.693147),
                   "x": (1, 1.791759), "y": (1, 1.791759),
                   "z": (1, 1.791759)}


def test_unigram_lm_segments_shared_morphemes(spark):
    """banana/bandana share 'an'/'ana' — hard-EM must keep the shared
    morphemes on the paths and drop multis that fall off every path,
    and the Spark plan must agree with the DuckDB oracle exactly."""
    import duckdb

    from etl_ender_turing_spark.operators import unigram as ug

    rows = [(1, "abab abab cd"), (2, "abab cd cd xyz"),
            (3, "banana bandana")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.piece: (r.cnt, r.nll)
           for r in ug.unigram_lm_vocab(df, rounds=2, v_multi=6).collect()}
    # whole-word piece for the frequent word; shared morphemes for the
    # banana family; every seed multi not on a path is gone
    assert got["abab"][0] == 3 and got["an"][0] == 2 and got["ana"][0] == 2
    assert "ba" not in got and "nan" not in got
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES "
                + ", ".join(f"({i}, '{t}')" for i, t in rows)
                + ") v(doc_id, text)")
    want = {r[0]: (r[1], r[2]) for r in con.execute(
        ug.unigram_lm_vocab_sql("documents", rounds=2,
                                v_multi=6)).fetchall()}
    assert got == want
