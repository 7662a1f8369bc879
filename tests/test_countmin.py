"""Count-min sketch (operators/countmin.py): never-undercount
invariant, collision overcounting, cell-wise mergeability."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from etl_ender_turing_spark.operators import countmin as cm


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])


def test_estimates_never_undercount(spark):
    docs = _docs(spark, [f"w{i % 37} w{i % 11} common" for i in range(200)])
    rows = cm.cms_heavy_hitters(docs, k=15).collect()
    assert len(rows) == 15
    assert all(r.cms_est >= r.exact_cnt for r in rows)
    assert all(r.overcount == r.cms_est - r.exact_cnt for r in rows)
    top = max(rows, key=lambda r: r.exact_cnt)
    assert top.token == "common" and top.exact_cnt == 200


def test_overcount_appears_under_collision_pressure(spark):
    """5000 distinct tokens into 1024 slots/row force collisions: some
    probe must overcount, none may undercount."""
    docs = _docs(spark, [" ".join(f"t{i * 50 + j}" for j in range(50))
                         for i in range(100)])
    rows = cm.cms_heavy_hitters(docs, k=20).collect()
    assert all(r.cms_est >= r.exact_cnt for r in rows)
    assert any(r.overcount > 0 for r in rows)


def test_cellwise_merge_equals_union_sketch(spark):
    """CMS of (A ∪ B) == cell-wise sum of CMS(A) and CMS(B) — the
    property that makes per-shard / per-microbatch sketches foldable."""
    a = _docs(spark, [f"x{i % 13} shared" for i in range(60)])
    b = _docs(spark, [f"y{i % 7} shared" for i in range(40)])
    sk = lambda d: {(r.row, r.slot): r.cell for r in
                    cm.cms_build(cm.token_counts(d)).collect()}
    sa, sb = sk(a), sk(b)
    merged = {key: sa.get(key, 0) + sb.get(key, 0)
              for key in set(sa) | set(sb)}
    union = sk(a.unionByName(b))
    assert merged == union


def test_sketch_size_is_bounded(spark):
    docs = _docs(spark, [" ".join(f"v{i * 30 + j}" for j in range(30))
                         for i in range(100)])
    n_cells = cm.cms_build(cm.token_counts(docs)).count()
    assert n_cells <= cm.CMS_D * cm.CMS_W
