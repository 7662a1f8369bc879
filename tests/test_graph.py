"""graph.pagerank — semantics pinned against an independent reference.

The certified fixture graph (q_domain_pagerank) has no dangling nodes,
so the dangling-redistribution branch is pinned HERE, on hand graphs,
against a pure-Python reference that mirrors the engine's quantization
exactly (ranks as integer micro-units: decimal sums == integer sums).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_ender_turing_spark.operators.graph import pagerank


def _ref_pagerank(edges, iters, d=0.85):
    """Integer-micros mirror of the engine arithmetic: contributions
    quantized to 6dp (floor(x*1e6+0.5)), summed exactly as integers
    (== the decimal SUM), rank re-quantized per iteration."""
    nodes = sorted({s for s, _, _ in edges} | {t for _, t, _ in edges})
    n = len(nodes)
    outw: dict[str, int] = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0) + w
    r = {v: math.floor(1.0 / n * 1e6 + 0.5) for v in nodes}  # micro-units
    for _ in range(iters):
        inflow = dict.fromkeys(nodes, 0)
        for s, t, w in edges:
            inflow[t] += math.floor((r[s] / 1e6) * w / outw[s] * 1e6 + 0.5)
        dang = sum(r[v] for v in nodes if v not in outw)
        r = {v: math.floor(((1.0 - d) / n + d * (inflow[v] / 1e6
                                                 + (dang / 1e6) / n))
                           * 1e6 + 0.5)
             for v in nodes}
    return {v: r[v] / 1e6 for v in nodes}


def _run(spark, edges, iters):
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    out = pagerank(df, iters=iters)
    return {row["domain"]: row["rank"] for row in out.collect()}


def test_pagerank_matches_reference_with_dangling_node(spark):
    # c has NO outlinks: its rank must recirculate uniformly, not vanish
    edges = [("a", "b", 1), ("b", "c", 1), ("a", "c", 3)]
    for iters in (1, 3):
        got = _run(spark, edges, iters)
        want = _ref_pagerank(edges, iters)
        assert got == want, (iters, got, want)


def test_pagerank_conserves_total_mass(spark):
    edges = [("a", "b", 2), ("b", "a", 1), ("b", "c", 1), ("c", "a", 5),
             ("d", "a", 1)]   # d: no inlinks -> floor rank (1-d)/N + dang
    got = _run(spark, edges, iters=4)
    # total mass conserved up to N half-ulp quantization steps/iteration
    assert abs(sum(got.values()) - 1.0) < 4 * 4e-6
    # a is the most-linked node; d has no inlinks at all
    assert max(got, key=got.get) == "a"
    assert min(got, key=got.get) == "d"


def test_pagerank_uniform_on_symmetric_cycle(spark):
    # a->b->c->a with equal weights: ranks stay exactly uniform
    edges = [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)]
    got = _run(spark, edges, iters=5)
    assert len(set(got.values())) == 1


def test_extract_links_ignores_relative_and_anchors(spark):
    from etl_ender_turing_spark.operators import web as wb

    df = spark.createDataFrame([(1,)], "doc_id long")
    html = ('<a href="/rel">r</a> <a name="x">n</a> '
            '<A HREF="https://b.co.uk/y">u</A> '
            "<a href='http://sq.example.com/'>single-quoted</a> "
            '<a href="HTTPS://c.github.io/z">caps scheme</a>')
    links = wb.extract_links(df.select("doc_id", F.lit(html).alias("html")))
    got = {r["href"]: r["dst_domain"] for r in links.collect()}
    # PSL: b.co.uk is already an eTLD+1; c.github.io is a private-section
    # registered site
    assert got == {"https://b.co.uk/y": "b.co.uk",
                   "http://sq.example.com/": "example.com",
                   "HTTPS://c.github.io/z": "c.github.io"}


def test_extract_anchors_text_attribution(spark):
    from etl_ender_turing_spark.operators import web as wb

    df = spark.createDataFrame([(1,)], "doc_id long")
    html = ('<a href="/rel">never attributed</a> '
            '<a class="x" href="https://b.co.uk/y">Read The Docs</a> '
            '<A HREF="http://sq.example.com/">mixed <b>inner</b></A>')
    got = {(r["dst_domain"], r["anchor"])
           for r in wb.extract_anchors(
               df.select("doc_id", F.lit(html).alias("html"))).collect()}
    # relative-href text is dropped; inline markup truncates the anchor
    # at the first nested tag (conservative read)
    assert got == {("b.co.uk", "Read The Docs"),
                   ("example.com", "mixed ")}


def test_anchor_domain_terms_topk(spark):
    from etl_ender_turing_spark.operators import web as wb

    anchors = spark.createDataFrame(
        [("d.com", "fast spark engine"), ("d.com", "fast engine"),
         ("d.com", "SPARK guide"), ("e.org", "one")],
        "dst_domain string, anchor string")
    out = wb.anchor_domain_terms(anchors, k=2).collect()
    top = {(r["dst_domain"], r["rnk"]): (r["term"], r["n"]) for r in out}
    # lowercased counts: fast=2 engine=2 spark=2 guide=1 → ties break
    # alphabetically (engine, fast) at k=2
    assert top[("d.com", 1)] == ("engine", 2)
    assert top[("d.com", 2)] == ("fast", 2)
    assert top[("e.org", 1)] == ("one", 1)


def test_robots_rules_and_prefix_filter(spark):
    from etl_ender_turing_spark.operators import web as wb

    robots = ("User-agent: *\nAllow: /open\nDisallow: /priv\n"
              "# note\nDisallow: /tmp/x\n")
    rules = wb.parse_robots(spark.createDataFrame(
        [("d.com", robots)], "reg_domain string, robots string"))
    assert {(r.reg_domain, r.dis_prefix) for r in rules.collect()} == \
        {("d.com", "/priv"), ("d.com", "/tmp/x")}
    urls = spark.createDataFrame(
        [(1, "d.com", "/open/a"), (2, "d.com", "/priv"),
         (3, "d.com", "/private/x"),      # prefix match, not exact
         (4, "d.com", "/tmp/"),           # NOT under /tmp/x
         (5, "e.org", "/priv/y")],        # other domain: rules don't apply
        "doc_id long, reg_domain string, path string")
    kept = {r.doc_id for r in wb.robots_filter(urls, rules).collect()}
    assert kept == {1, 4, 5}


def test_extract_sitemap_urls_trims_and_ignores_lastmod(spark):
    from etl_ender_turing_spark.operators import web as wb

    xml = ('<urlset><url><loc>https://a.co.uk/x</loc>'
           '<lastmod>2024-05-05</lastmod></url>'
           '<url><loc>\n  http://b.example.com/y </loc></url></urlset>')
    df = spark.createDataFrame([(1,)], "doc_id long")
    got = {(r.loc, r.reg_domain) for r in wb.extract_sitemap_urls(
        df.select("doc_id", F.lit(xml).alias("sitemap"))).collect()}
    assert got == {("https://a.co.uk/x", "a.co.uk"),
                   ("http://b.example.com/y", "example.com")}


def test_crawl_budget_largest_remainder(spark):
    from etl_ender_turing_spark.operators import graph as gr

    ranks = spark.createDataFrame(
        [("a", 0.5), ("b", 0.5), ("c", 0.5)], "domain string, rank double")
    quality = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 1)], "domain string, qsum long")
    got = {r.domain: r.budget
           for r in gr.crawl_budget(ranks, quality, n_slots=100).collect()}
    # 100/3: floors are 33 each, the single leftover slot goes to the
    # smallest domain name (deterministic remainder tie-break)
    assert got == {"a": 34, "b": 33, "c": 33}
    assert sum(got.values()) == 100
    # proportionality: 3x the weight -> ~3x the slots, still exact-sum
    quality2 = spark.createDataFrame(
        [("a", 3), ("b", 1), ("c", 1)], "domain string, qsum long")
    got2 = {r.domain: r.budget
            for r in gr.crawl_budget(ranks, quality2, n_slots=100).collect()}
    assert got2 == {"a": 60, "b": 20, "c": 20}


def test_crawl_budget_survives_100tb_scale_qsums(spark):
    # 100 TB-corpus char sums: qsum ~1e13 per domain. The raw
    # rank*qsum*1e6 spelling reached ~5e18 per weight and n_slots*w6
    # wrapped BIGINT silently (Spark non-ANSI); max-normalized weights
    # stay ≤1e12, so the apportionment is exact at any corpus size.
    from etl_ender_turing_spark.operators import graph as gr

    ranks = spark.createDataFrame(
        [("a", 0.5), ("b", 0.3), ("c", 0.2)], "domain string, rank double")
    quality = spark.createDataFrame(
        [("a", 10_000_000_000_000), ("b", 10_000_000_000_000),
         ("c", 5_000_000_000_000)], "domain string, qsum long")
    got = {r.domain: (r.weight6, r.budget)
           for r in gr.crawl_budget(ranks, quality, n_slots=1000).collect()}
    # shares 0.5 : 0.3 : 0.1 → 5/9, 3/9, 1/9 of 1000 with largest-remainder
    assert all(0 < w <= 10**12 for w, _ in got.values()), got
    assert sum(b for _, b in got.values()) == 1000
    assert got["a"][1] == 556 and got["b"][1] == 333 and got["c"][1] == 111


def test_personalized_pagerank_concentrates_on_seeds(spark):
    from pyspark.sql import Row

    from etl_ender_turing_spark.operators.graph import (
        pagerank, personalized_pagerank,
    )
    # two communities bridged by one edge; seeds = the 'a' side
    edges = [("a1", "a2"), ("a2", "a1"), ("a1", "a3"), ("a3", "a1"),
             ("b1", "b2"), ("b2", "b1"), ("b1", "b3"), ("b3", "b1"),
             ("a3", "b1")]
    df = spark.createDataFrame(
        [Row(src=s, dst=d, w=1) for s, d in edges])
    ppr = {r.domain: r.rank for r in
           personalized_pagerank(df, "d LIKE 'a%'", iters=4).collect()}
    # seeds and their neighborhood dominate; the far community is
    # reachable only via the bridge and gets no teleport mass
    assert ppr["a1"] > ppr["b2"] and ppr["a1"] > ppr["b3"]
    assert sum(ppr.values()) > 0.9          # mass conserved (quantized)
    # global pagerank ranks b1 highly (3 in-links); PPR demotes it
    # below the seed hub
    gpr = {r.domain: r.rank for r in pagerank(df, iters=4).collect()}
    assert gpr["b1"] >= gpr["a1"] or ppr["a1"] > ppr["b1"]
    assert ppr["a1"] > ppr["b1"]


def test_bucketed_range_pairs_equals_naive(spark):
    """Bucketed equi-join candidates == brute-force range self-join,
    including boundary gaps (exactly max_gap) and equal timestamps."""
    from pyspark.sql import Row, functions as F

    from etl_ender_turing_spark.operators.skew import bucketed_range_pairs

    rows = [Row(k="u1", t=t, i=i) for i, t in enumerate(
        [0, 3, 5, 10, 10, 11, 29, 30, 31, 100, 104, 105])] \
        + [Row(k="u2", t=t, i=100 + j) for j, t in enumerate([2, 7, 50])]
    df = spark.createDataFrame(rows)
    got = {(r.k, r.i_a, r.i_b, r.gap) for r in
           bucketed_range_pairs(df, "k", F.col("t"), "i", 5).collect()}
    want = set()
    data = [(r.k, r.t, r.i) for r in rows]
    for (ka, ta, ia) in data:
        for (kb, tb, ib) in data:
            if ka == kb and ((ta, ia) < (tb, ib)) and tb - ta <= 5:
                want.add((ka, ia, ib, tb - ta))
    assert got == want and len(want) > 5
