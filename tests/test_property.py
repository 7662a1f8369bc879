"""Property-based tests (SURVEY §5.4): random nested sessions with
adversarial null-ness/emptiness must uphold the transform invariants —
no row loss through explodes, no crash on malformed datetimes,
deterministic re-runs.

Each hypothesis example costs a Spark job, so examples are few but each
carries a whole batch of generated rows.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_ender_turing_spark.pipeline.fixtures import _SESSIONS_DDL
from etl_ender_turing_spark.pipeline.transform import transform_sessions

# -- generators ------------------------------------------------------------

_dt = st.one_of(
    st.just("2024-06-01T10:15:44.620796"),
    st.just("0001-01-01T00:00:00"),            # out-of-bounds -> 1900 default
    st.just("2024-06-02T09:00:00+03:00junk"),  # regex-salvage path
    st.just(""), st.none(),
    st.text(max_size=12),                      # arbitrary garbage
)

_match = st.fixed_dictionaries({
    "score": st.one_of(st.none(), st.floats(0, 1, allow_nan=False)),
    "matched_corpus_text": st.one_of(st.none(), st.text(max_size=8)),
    "is_agent": st.one_of(st.none(), st.booleans()),
    "transcript_id": st.integers(1, 50),
    "matched_query_text": st.none(),
    "meta": st.none(),
})

_tag = st.fixed_dictionaries({
    "id": st.integers(1, 9),
    "match": st.one_of(st.none(), st.lists(_match, max_size=3)),
})

_point = st.fixed_dictionaries({
    "scorecard_point_id": st.integers(1, 99),
    "score": st.one_of(st.none(), st.integers(0, 5)),
    "comment": st.none(),
})

_score = st.fixed_dictionaries({
    "scorecard_id": st.integers(1, 5),
    "reviewer_id": st.integers(1, 9),
    "point_scores": st.one_of(st.none(), st.lists(_point, max_size=3)),
})


def _session(i: int, draw) -> dict:
    base = {k: None for k in (
        "type caller_id source language_code asr_size filename destination_id "
        "end_dt created_at updated_at direction agent_id group_id duration "
        "silence silence_percent agent_channel comments_count "
        "default_scorecard_id average_score is_processed overlaps_data "
        "duration_details score_details queue_name campaign_name term_reason "
        "waiting_time fcr csi nps list_id words_count_agent "
        "words_count_client words_count_both caller_prev_session_id "
        "additional_info emotions sentiments activity compliance_matches "
        "ptp_kept_prediction comment_author_ids category_ids low_quality "
        "events_call_id").split()}
    base.update({
        "id": f"prop-{i}",
        "start_dt": draw["start_dt"],
        "tags": draw["tags"],
        "categories": draw["categories"],
        "reviewers": None,
        "scores": draw["scores"],
        "crm_statuses": None,
        "comments": None,
        "summary": None,
    })
    return base


_session_draw = st.fixed_dictionaries({
    "start_dt": _dt,
    "tags": st.one_of(st.none(), st.lists(_tag, max_size=3)),
    "categories": st.one_of(st.none(), st.lists(st.fixed_dictionaries({
        "id": st.integers(1, 9), "is_verified": st.one_of(st.none(), st.booleans()),
    }), max_size=2)),
    "scores": st.one_of(st.none(), st.lists(_score, max_size=2)),
})

_batches = st.lists(_session_draw, min_size=1, max_size=12)

_SLOW = settings(max_examples=8, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow])


# -- invariants ------------------------------------------------------------

@given(_batches)
@_SLOW
def test_explode_row_conservation(spark, draws):
    rows = [_session(i, d) for i, d in enumerate(draws)]
    raw = spark.createDataFrame(rows, _SESSIONS_DDL)
    out = transform_sessions(raw)

    # sessions: one output row per input row, always
    assert out["sessions"].count() == len(rows)

    # two-level tags explode: exactly sum(len(match)) rows
    expect_tags = sum(len(m["match"] or []) for d in draws
                      for m in (d["tags"] or []))
    assert out["sessions_tags"].count() == expect_tags

    # one-level categories explode
    expect_cats = sum(len(d["categories"] or []) for d in draws)
    assert out["sessions_categories"].count() == expect_cats

    # two-level scores explode (None scores filtered by broken-scores guard)
    expect_pts = sum(len(s["point_scores"] or []) for d in draws
                     for s in (d["scores"] or []))
    assert out["sessions_scores"].count() == expect_pts


@given(_batches)
@_SLOW
def test_datetime_never_raises_and_in_bounds(spark, draws):
    rows = [_session(i, d) for i, d in enumerate(draws)]
    raw = spark.createDataFrame(rows, _SESSIONS_DDL)
    sess = transform_sessions(raw)["sessions"]
    # any start_dt input parses, salvages, or falls back — never throws,
    # and never yields a pre-1900 timestamp
    bad = sess.filter(F.col("start_dt") < F.lit("1900-01-01").cast("timestamp"))
    assert bad.count() == 0


@given(_batches)
@_SLOW
def test_transform_deterministic(spark, draws):
    rows = [_session(i, d) for i, d in enumerate(draws)]
    raw = spark.createDataFrame(rows, _SESSIONS_DDL)
    a = transform_sessions(raw)["sessions_tags"]
    b = transform_sessions(raw)["sessions_tags"]
    ka = [tuple(r) for r in a.select("session_id", "tag_id", "transcript_id")
          .orderBy("session_id", "tag_id", "transcript_id").collect()]
    kb = [tuple(r) for r in b.select("session_id", "tag_id", "transcript_id")
          .orderBy("session_id", "tag_id", "transcript_id").collect()]
    assert ka == kb


# -- LLM-operator properties ----------------------------------------------

_word = st.text(alphabet="abcde", min_size=1, max_size=4)


@given(st.lists(st.lists(_word, min_size=1, max_size=30),
                min_size=1, max_size=20))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_repetition_signals_match_python_reference(spark, token_lists):
    """Spark's HOF formulas == a plain-Python reference on arbitrary
    token streams (short docs, heavy repetition, single tokens)."""
    from etl_ender_turing_spark.operators.textstats import repetition_signals

    rows = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    got = {r.doc_id: r for r in repetition_signals(
        spark.createDataFrame(rows, "doc_id long, text string")).collect()}

    for i, toks in enumerate(token_lists):
        def top_frac(seq):
            return (round(max(seq.count(x) for x in set(seq)) / len(seq), 6)
                    if seq else 0.0)
        bigrams = [" ".join(toks[j:j + 2]) for j in range(len(toks) - 1)]
        trigrams = [" ".join(toks[j:j + 3]) for j in range(len(toks) - 2)]
        dup_tri = (round(1 - len(set(trigrams)) / len(trigrams), 6)
                   if trigrams else 0.0)
        assert abs(got[i].top1_frac - top_frac(toks)) < 1e-9, toks
        assert abs(got[i].top_bigram_frac - top_frac(bigrams)) < 1e-9, toks
        assert abs(got[i].dup_trigram_frac - dup_tri) < 1e-9, toks


@given(st.floats(0.0, 1.0), st.integers(1, 500))
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_deterministic_sample_is_stable_subset(spark, fraction, n):
    """Sampling twice yields the SAME set; a smaller fraction is always a
    subset of a larger one (nested samples — the property that makes
    hash-based sampling auditable)."""
    from etl_ender_turing_spark.operators import sampling as sp

    df = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    a = {r.doc_id for r in sp.deterministic_sample(df, fraction).collect()}
    b = {r.doc_id for r in sp.deterministic_sample(df, fraction).collect()}
    assert a == b
    half = {r.doc_id for r in sp.deterministic_sample(
        df, fraction / 2).collect()}
    assert half <= a


@given(st.lists(st.sampled_from(["alpha beta gamma delta epsilon",
                                 "alpha beta gamma delta zeta",
                                 "one two three four five",
                                 "six seven eight nine ten"]),
                min_size=2, max_size=10))
@settings(max_examples=8, deadline=None)
def test_bucket_cap_preserves_candidate_connectivity(spark, texts):
    """The max_bucket star expansion must yield the SAME connected
    components over candidate pairs as the full quadratic expansion —
    star edges keep every bucket member attached to the bucket's min id."""
    from etl_ender_turing_spark.operators import dedup as dd

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    sigs = dd.minhash_signatures_inline(docs)

    def components(pairs_df):
        cl = dd.duplicate_clusters(pairs_df)
        return {(r.doc_id, r.cluster_id) for r in cl.collect()}

    full = components(dd.minhash_band_pairs(sigs, max_bucket=10**9))
    capped = components(dd.minhash_band_pairs(sigs, max_bucket=2))
    assert full == capped


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=st.lists(
    st.tuples(st.integers(0, 4),                 # user
              st.integers(0, 3_600_000),         # offset seconds
              st.sampled_from(["view", "click", "purchase"])),
    min_size=1, max_size=40))
def test_scd2_intervals_partition_events(spark, events):
    """SCD2 invariants on random event streams: interval n_events sum to
    the row count; per user, exactly one open interval (valid_to NULL);
    intervals never overlap (next valid_from == this valid_to)."""
    from etl_ender_turing_spark.plans.catalog import CATALOG
    import datetime as dt

    rows = [(i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=off),
             u, t, 1.0, "{}")
            for i, (u, off, t) in enumerate(events)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    import tempfile, os
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = CATALOG["q_scd2_intervals"].builder(spark, d).collect()
    assert sum(r.n_events for r in out) == len(rows)
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    for u, ivs in by_user.items():
        ivs.sort(key=lambda r: r.valid_from)
        assert sum(iv.valid_to is None for iv in ivs) == 1
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from


# -- round-5 operators vs plain-Python references --------------------------

_seq = st.lists(st.sampled_from(["a", "b", "c", None]), min_size=0,
                max_size=12)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=_seq)
def test_consecutive_dedup_matches_python_reference(spark, vals):
    from etl_ender_turing_spark.operators.dedup import consecutive_dedup

    rows = [(1, i, v) for i, v in enumerate(vals)]
    ref = [v for i, v in enumerate(vals) if i == 0 or v != vals[i - 1]]
    if not rows:
        ref = []
    df = spark.createDataFrame(
        rows, "user_id long, ts long, event_type string") if rows else \
        spark.createDataFrame([], "user_id long, ts long, event_type string")
    got = [r.event_type for r in consecutive_dedup(
        df, order_cols=("ts",)).orderBy("ts").collect()]
    assert got == ref


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(old=st.dictionaries(st.integers(0, 9), st.integers(0, 3), max_size=8),
       new=st.dictionaries(st.integers(0, 9), st.integers(0, 3), max_size=8))
def test_snapshot_diff_matches_python_reference(spark, old, new):
    from etl_ender_turing_spark.operators.conform import snapshot_diff

    ref = {}
    for k in set(old) | set(new):
        if k not in new:
            ref[k] = "removed"
        elif k not in old:
            ref[k] = "added"
        elif old[k] != new[k]:
            ref[k] = "changed"
    sch = "k long, v long"
    odf = spark.createDataFrame(list(old.items()) or [], sch)
    ndf = spark.createDataFrame(list(new.items()) or [], sch)
    got = {r.k: r.change_type
           for r in snapshot_diff(odf, ndf, ["k"]).collect()}
    assert got == ref
