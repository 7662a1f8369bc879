"""BPE tokenizer training: the merge rule, pinned against hand-traced
BPE. The oracle queries certify Spark==DuckDB; these pin Spark==BPE —
in particular the greedy left-to-right run semantics that a string
``replace`` implementation gets wrong in BOTH engines at once.
"""

from __future__ import annotations

from etl_ender_turing_spark.operators import bpe


def _learn(spark, texts, rounds):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    return [(r.round, r.pair, r.cnt)
            for r in bpe.bpe_learn(df, rounds=rounds).collect()]


def test_runs_merge_left_to_right_nonoverlapping(spark):
    # word "aaaa": pair (a,a) occurs 3 times; after merging it the BPE
    # symbolization is [aa, aa] — round 2's best pair must be "aa aa".
    # A replace()-based merge yields [aa, a, a] (it rescans the original
    # string) and round 2 would pick "a a" instead — this test is the
    # tripwire for that bug.
    got = _learn(spark, ["aaaa"], rounds=2)
    assert got == [(1, "a a", 3), (2, "aa aa", 1)]


def test_odd_run_keeps_the_tail_symbol(spark):
    # "aaa" -> [aa, a] (greedy from the left), so round 2 sees "aa a",
    # never "a aa"
    got = _learn(spark, ["aaa"], rounds=2)
    assert got == [(1, "a a", 2), (2, "aa a", 1)]


def test_pair_counts_are_word_frequency_weighted(spark):
    df = spark.createDataFrame([(0, "ab ab ab"), (1, "Ab  cd")],
                               "doc_id long, text string")
    counts = {r.pair: r.cnt for r in bpe.bpe_pair_counts(df).collect()}
    # 'ab' appears 4 times total (case-folded, multi-space safe)
    assert counts["a b"] == 4
    assert counts["c d"] == 1


def test_learn_matches_hand_traced_bpe(spark):
    # the Sennrich worked example: low×5 lower×2 newest×6 widest×3.
    # Pair counts: 'e s' = newest(6)+widest(3) = 9, 's t' = 9,
    # 'w e' = lower(2)+newest(6) = 8, 'l o' = 'o w' = 7.
    # Round 1: 9-9 tie between 'e s' and 's t' breaks pair-asc -> 'e s';
    # round 2: 'es t' now counts 9 (newest+widest) and wins over 'w e' 8.
    got = _learn(spark, ["low " * 5 + "lower " * 2
                         + "newest " * 6 + "widest " * 3], rounds=2)
    assert got == [(1, "e s", 9), (2, "es t", 9)]


def test_argmax_is_heap_shaped_and_merges_broadcast(spark):
    df = spark.createDataFrame([(0, "abc abd")], "doc_id long, text string")
    plan = (bpe.bpe_learn(df, rounds=1)
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan


def test_encode_counts_match_hand_trace(spark):
    # corpus "aaaa": merges r1 = (a,a), r2 = (aa,aa); encoding "aaaa"
    # under 1 round -> [aa, aa] = 2 tokens, under 2 rounds -> 1 token
    df = spark.createDataFrame([(0, "aaaa")], "doc_id long, text string")
    one = bpe.bpe_encode_counts(df, rounds=1).collect()[0]
    two = bpe.bpe_encode_counts(df, rounds=2).collect()[0]
    assert (one.n_words, one.n_tokens) == (1, 2)
    assert (two.n_words, two.n_tokens) == (1, 1)


def test_encode_folds_once_per_distinct_word(spark):
    # same word repeated across docs: counts multiply, never diverge
    df = spark.createDataFrame([(0, "abab abab"), (1, "abab")],
                               "doc_id long, text string")
    got = {r.doc_id: (r.n_words, r.n_tokens)
           for r in bpe.bpe_encode_counts(df, rounds=1).collect()}
    # round 1 best pair: 'a b' (3) vs 'b a' (3) -> 'a b' wins pair-asc;
    # abab -> [ab, ab] after merging -> 2 tokens per occurrence
    assert got[0] == (2, 4)
    assert got[1] == (1, 2)


# -- property tests: the fold invariants that must hold on ANY corpus -----

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_word = st.text(alphabet="abc", min_size=1, max_size=8)
_corpus = st.lists(st.lists(_word, min_size=1, max_size=12), min_size=1,
                   max_size=4)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_corpus)
def test_property_merges_never_change_word_content(spark, corpus):
    # folding merges into a word regroups its characters; it must NEVER
    # create, drop or reorder them — joining the final symbols of each
    # word must reproduce the word exactly
    from pyspark.sql import functions as F
    rows = [(i, " ".join(ws)) for i, ws in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    _, words = bpe._merge_rounds(df, rounds=3, text_col="text")
    bad = (words.select("word", F.expr("replace(trim(w), ' ', '')")
                        .alias("joined"))
           .filter(F.col("word") != F.col("joined"))).collect()
    assert bad == []


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_corpus)
def test_property_token_counts_decrease_monotonically(spark, corpus):
    # each merge round can only shrink (or hold) every doc's token count
    rows = [(i, " ".join(ws)) for i, ws in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    prev = None
    for r in (0, 1, 2):
        cur = {x.doc_id: x.n_tokens
               for x in bpe.bpe_encode_counts(df, rounds=r).collect()} \
            if r else {x.doc_id: sum(len(w) for w in ws)
                       for x, ws in zip(
                           df.orderBy("doc_id").collect(), corpus)}
        if prev is not None:
            assert all(cur[k] <= prev[k] for k in cur)
        prev = cur


def test_tokenizer_fertility_aggregates_encode_counts_by_lang(spark):
    from etl_ender_turing_spark.operators import bpe

    docs = spark.createDataFrame(
        [(1, "aa aa bb", "x"), (2, "aa bb", "x"), (3, "cc cc cc", "y")],
        "doc_id long, text string, lang string")
    enc = {r.doc_id: r for r in
           bpe.bpe_encode_counts(docs, rounds=1).collect()}
    out = {r.lang: r for r in
           bpe.tokenizer_fertility(docs, rounds=1).collect()}
    assert set(out) == {"x", "y"}
    for lang, ids in (("x", (1, 2)), ("y", (3,))):
        n_words = sum(enc[i].n_words for i in ids)
        n_tokens = sum(enc[i].n_tokens for i in ids)
        assert out[lang].n_docs == len(ids)
        assert out[lang].n_words == n_words
        assert out[lang].n_tokens == n_tokens
        import math
        assert out[lang].fertility == math.floor(
            n_tokens / n_words * 1e6 + 0.5) / 1e6
    # single-char words can never merge below 1 token/word
    assert out["y"].fertility >= 1.0


def test_encode_from_merges_matches_inline_encoder(spark, tmp_path):
    # the persisted-artifact lifecycle: learn once, write the merge
    # table to parquet, encode FROM the artifact — bit-identical to the
    # inline train-and-encode at the same rounds
    docs = spark.createDataFrame(
        [(1, "low lower lowest"), (2, "new newest news"),
         (3, "wide widest wider aa aaaa")],
        "doc_id long, text string")
    path = str(tmp_path / "merges")
    bpe.bpe_learn(docs, rounds=3).write.mode("overwrite").parquet(path)
    served = {r.doc_id: (r.n_words, r.n_tokens) for r in
              bpe.bpe_encode_from_merges(
                  docs, spark.read.parquet(path)).collect()}
    inline = {r.doc_id: (r.n_words, r.n_tokens) for r in
              bpe.bpe_encode_counts(docs, rounds=3).collect()}
    assert served == inline and len(served) == 3
    # the artifact applies in ROUND order even when the parquet read
    # returns rows shuffled — shuffle the artifact rows explicitly
    from pyspark.sql import functions as F
    shuffled = spark.read.parquet(path).orderBy(F.desc("pair"))
    reshuffled = {r.doc_id: (r.n_words, r.n_tokens) for r in
                  bpe.bpe_encode_from_merges(docs, shuffled).collect()}
    assert reshuffled == inline
