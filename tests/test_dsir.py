"""DSIR importance resampling: hand-computable semantics.

The oracle queries certify Spark==DuckDB; these tests pin Spark==MATH
and the selection behavior the paper promises — target-like raw docs
outrank out-of-domain ones — so a sign flip or swapped target/raw model
that both engines shared would still be caught.
"""

from __future__ import annotations

import math

import pytest

from etl_ender_turing_spark.operators import dsir


def _weights(spark, rows, n_buckets=4096):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dsir.dsir_weights(df, n_buckets=n_buckets, train_mod=5)
    return {r.doc_id: r for r in out.collect()}


def test_target_like_docs_outrank_out_of_domain(spark):
    # target split (ids % 5 == 0) speaks "alpha beta"; raw doc 1 repeats
    # the target vocabulary, raw doc 2 is disjoint — DSIR must rank 1
    # above 2 (that is the entire point of the method)
    rows = [
        (0, "alpha beta alpha beta alpha"),
        (5, "beta alpha beta alpha beta"),
        (1, "alpha beta alpha beta"),
        (2, "zebra quux corge grault"),
    ]
    got = _weights(spark, rows)
    assert set(got) == {1, 2}
    assert got[1].logw > got[2].logw


def test_weight_is_sum_of_quantized_bucket_lambdas(spark):
    # single-token docs, large B so the two grams cannot collide:
    # target corpus = {"aa"}, raw pool = {"aa", "bb"}.
    #   totals: tt = 1, rt = 2;  B = 4096
    #   lam(aa) = ln(2/(1+B)) - ln(2/(2+B))  [t_cnt=1, r_cnt=1]
    #   lam(bb) = ln(1/(1+B)) - ln(2/(2+B))  [t_cnt=0, r_cnt=1]
    b = 4096
    rows = [(0, "aa"), (1, "aa"), (2, "bb")]
    got = _weights(spark, rows, n_buckets=b)

    def lam(t_cnt, r_cnt, tt=1, rt=2):
        raw = (math.log((t_cnt + 1) / (tt + b))
               - math.log((r_cnt + 1) / (rt + b)))
        return math.floor(raw * 1_000_000 + 0.5) / 1_000_000

    assert got[1].n_feats == 1
    assert got[1].logw == pytest.approx(lam(1, 1), abs=1e-9)
    assert got[2].logw == pytest.approx(lam(0, 1), abs=1e-9)
    # doc repeating a gram contributes cnt copies of the SAME quantized
    # term (decimal sum): "aa aa" -> unigram aa ×2 + bigram "aa aa" ×1
    rows2 = [(0, "aa"), (3, "aa aa")]
    got2 = _weights(spark, rows2, n_buckets=b)
    lam_aa = lam(1, 2, tt=1, rt=3)      # aa: t=1, r=2 (two raw copies)
    lam_bi = lam(0, 1, tt=1, rt=3)      # "aa aa": target never saw it
    assert got2[3].n_feats == 3
    assert got2[3].logw == pytest.approx(2 * lam_aa + lam_bi, abs=1e-9)


def test_topk_is_deterministic_and_heap_shaped(spark):
    rows = ([(0, "alpha beta gamma")]
            + [(i, "alpha beta gamma") for i in range(1, 10) if i % 5]
            + [(i, "unrelated words entirely") for i in range(11, 20)
               if i % 5])
    df = spark.createDataFrame(rows, "doc_id long, text string")
    top = dsir.dsir_topk(df, k=5, n_buckets=4096)
    got = [r.doc_id for r in top.collect()]
    # the 5 kept docs are target-like ones, id-ascending within ties
    assert len(got) == 5
    assert all(i < 10 for i in got)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_empty_and_tokenless_docs_drop_out(spark):
    rows = [(0, "alpha beta"), (1, ""), (2, "   "), (3, "alpha")]
    got = _weights(spark, rows)
    assert set(got) == {3}
    assert got[3].n_feats == 1  # one unigram, no bigram
