"""URL / domain operators for web-corpus curation.

A crawled training corpus is curated as much by WHERE text came from as
by what it says: domain blocklists (spam/SEO farms), per-domain caps,
domain-level dedup and quality priors all key on the URL. This module
keeps the parsing JVM-side (`parse_url`, `substring_index` — no Python,
no UDFs) so the extraction is a narrow projection at any scale.

Certification pattern (same as multimodal.synthesize_planted_media):
fixtures PLANT urls derived arithmetically from doc_id, Spark PARSES
them back with `parse_url`, and the DuckDB oracle recomputes the
planted components directly — a parsing-semantics bug hash-mismatches;
parser and builder share no code path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.barrier import lineage_cut

# --------------------------------------------------------------------------
# eTLD+1 via a trimmed static snapshot of the Public Suffix List
# (publicsuffix.org — public data). A naive "last two host labels" breaks
# every multi-label registry: bbc.co.uk would collapse to co.uk and ALL of
# .co.uk would look like one registered domain to per-domain caps, domain
# stats and blocklists. The snapshot below covers the common ccTLD
# registries plus the big hosted-platform (private-section) suffixes; the
# full list drops in as data, not code.
#
# Evaluation is a literal IN over the last-2/last-3 host labels — Catalyst
# compiles a large IN to an InSet hash probe inside codegen: zero joins,
# zero shuffles, scale-free (the full ~9k-entry PSL would still be an
# InSet; a broadcast join only becomes preferable if the list must be
# swapped without redeploy).
# --------------------------------------------------------------------------

_PSL_2LABEL: tuple[str, ...] = (
    # ICANN section — common 2-label public suffixes
    "co.uk", "org.uk", "me.uk", "ac.uk", "gov.uk", "net.uk", "ltd.uk",
    "plc.uk", "sch.uk", "nhs.uk", "police.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp", "gr.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au", "asn.au",
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "art.br", "blog.br",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz", "geek.nz",
    "co.za", "org.za", "net.za", "gov.za", "ac.za", "web.za",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in", "ac.in",
    "edu.in", "gov.in", "res.in", "nic.in",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    "com.my", "net.my", "org.my", "edu.my", "gov.my", "name.my",
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr", "pe.kr",
    "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar", "int.ar",
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "nom.co",
    "com.pe", "net.pe", "org.pe", "edu.pe", "gob.pe",
    "com.cl", "com.ec", "com.uy", "com.py", "com.bo", "com.ve",
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "web.tr",
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa",
    "com.eg", "com.ng", "edu.ng", "gov.ng", "com.gh",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "info.ke",
    "com.pk", "net.pk", "org.pk", "edu.pk", "gov.pk",
    "com.bd", "net.bd", "org.bd", "edu.bd", "gov.bd",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph",
    "co.th", "in.th", "ac.th", "go.th", "or.th", "net.th",
    "co.id", "net.id", "or.id", "ac.id", "go.id", "web.id", "sch.id",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    "co.il", "net.il", "org.il", "ac.il", "gov.il", "muni.il",
    "com.pl", "net.pl", "org.pl", "edu.pl", "waw.pl", "gda.pl",
    "com.ru", "net.ru", "org.ru", "msk.ru", "spb.ru",
    "co.at", "or.at", "ac.at", "gv.at",
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "com.pt", "edu.pt", "gov.pt", "org.pt", "net.pt",
    "co.ir", "net.ir", "org.ir", "ac.ir", "gov.ir",
    "com.kw", "com.qa", "com.om", "com.bh", "com.jo", "com.lb",
    # private section — hosted platforms whose subdomains are
    # independently registered sites
    "github.io", "gitlab.io", "blogspot.com", "herokuapp.com",
    "appspot.com", "azurewebsites.net", "cloudfront.net",
    "amazonaws.com", "firebaseapp.com", "netlify.app", "vercel.app",
    "web.app", "pages.dev", "workers.dev", "wordpress.com", "weebly.com",
    "wixsite.com", "fastly.net", "ngrok.io", "onrender.com",
)

_PSL_3LABEL: tuple[str, ...] = (
    # US K-12 / community-college / library registries (k12.<state>.us …)
    "k12.ak.us", "k12.al.us", "k12.ca.us", "k12.co.us", "k12.fl.us",
    "k12.ga.us", "k12.il.us", "k12.ma.us", "k12.mi.us", "k12.ny.us",
    "k12.oh.us", "k12.pa.us", "k12.tx.us", "k12.va.us", "k12.wa.us",
    "cc.ca.us", "cc.ny.us", "lib.ca.us", "lib.ny.us", "lib.tx.us",
    # Australian state education registries
    "act.edu.au", "nsw.edu.au", "nt.edu.au", "qld.edu.au", "sa.edu.au",
    "tas.edu.au", "vic.edu.au", "wa.edu.au",
    # Japanese prefecture-city domains (sampled)
    "city.sapporo.jp", "city.sendai.jp", "city.yokohama.jp",
    "city.nagoya.jp", "city.kyoto.jp", "city.osaka.jp", "city.kobe.jp",
    # private section
    "s3.amazonaws.com", "compute.amazonaws.com", "elb.amazonaws.com",
)


def reg_domain_expr(host: Column) -> Column:
    """eTLD+1 of a host: longest matching public suffix + one label.

    Two InSet probes on the last-3 / last-2 label strings (longest match
    wins), falling back to last-2 for ordinary gTLDs — a pure narrow
    projection, no UDF, no join. A host that IS a bare suffix, or has
    fewer labels than the suffix, degrades to itself (substring_index
    returns the whole string when there are fewer separators).
    """
    last2 = F.substring_index(host, ".", -2)
    last3 = F.substring_index(host, ".", -3)
    return (F.when(last3.isin(*_PSL_3LABEL), F.substring_index(host, ".", -4))
            .when(last2.isin(*_PSL_2LABEL), F.substring_index(host, ".", -3))
            .otherwise(last2))


def synthesize_planted_urls(docs: DataFrame,
                            id_col: str = "doc_id") -> DataFrame:
    """Deterministic URL per doc: subdomain/registered-domain/TLD/path/
    query all derived from doc_id (every third doc carries a query
    string; the TLD cycles through com / co.uk / com.au / k12.ak.us so
    single-, two- and three-label public suffixes are all planted)."""
    did = F.col(id_col)
    tld = (F.when(did % 4 == 1, "co.uk")
           .when(did % 4 == 2, "com.au")
           .when(did % 4 == 3, "k12.ak.us")
           .otherwise("com"))
    url = F.concat(
        F.lit("https://w"), (did % 97).cast("string"),
        F.lit(".example-"), (did % 7).cast("string"),
        F.lit("."), tld,
        F.lit("/path/"), did.cast("string"),
        F.when(did % 3 == 0,
               F.concat(F.lit("?q="), (did % 5).cast("string")))
        .otherwise(F.lit("")))
    return docs.select(id_col, url.alias("url"))


def parse_urls(df: DataFrame, url_col: str = "url",
               id_col: str = "doc_id") -> DataFrame:
    """(id, host, reg_domain, path, query) — JVM `parse_url` projection.

    ``reg_domain`` is the true eTLD+1 via the embedded public-suffix
    snapshot (:func:`reg_domain_expr`): bbc.co.uk → bbc.co.uk, not
    co.uk — the granularity per-domain caps and blocklists key on.
    """
    u = F.col(url_col)
    return df.select(
        F.col(id_col),
        F.parse_url(u, F.lit("HOST")).alias("host"),
        reg_domain_expr(F.parse_url(u, F.lit("HOST"))).alias("reg_domain"),
        F.parse_url(u, F.lit("PATH")).alias("path"),
        F.parse_url(u, F.lit("QUERY")).alias("query"))


def domain_stats(parsed: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Docs + distinct subdomains per registered domain — the corpus
    composition report a crawl curation run starts from. One partial+
    final aggregation; output is domain-cardinality-sized."""
    return (parsed.groupBy("reg_domain")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.countDistinct("host").alias("n_hosts")))


def domain_blocklist_filter(parsed: DataFrame, blocked: DataFrame,
                            id_col: str = "doc_id") -> DataFrame:
    """Drop every doc whose registered domain is blocklisted — broadcast
    anti-join (blocklists are domain-cardinality, tiny next to the
    corpus; AQE broadcasts from observed size, no hint needed)."""
    return parsed.join(blocked, "reg_domain", "left_anti")


def synthesize_noisy_url_variants(docs: DataFrame,
                                  id_col: str = "doc_id") -> DataFrame:
    """Planted fixture for URL dedup: every group of 4 consecutive ids
    points at the SAME logical page, dressed four different ways —
    bare, ?utm_source= tracking param, UPPERCASE host, trailing slash —
    the noise profile crawl frontiers actually emit."""
    did = F.col(id_col)
    page = (did / F.lit(4)).cast("bigint")
    host = F.concat(F.lit("site.example-"), (page % 7).cast("string"),
                    F.lit(".com"))
    base = F.concat(F.lit("https://"), host,
                    F.lit("/page/"), page.cast("string"))
    url = (F.when(did % 4 == 1, F.concat(base, F.lit("?utm_source=feed")))
           .when(did % 4 == 2, F.concat(
               F.lit("https://"), F.upper(host),
               F.lit("/page/"), page.cast("string")))
           .when(did % 4 == 3, F.concat(base, F.lit("/")))
           .otherwise(base))
    return docs.select(id_col, url.alias("url"))


def canonical_url(url_col: str = "url"):
    """Canonical form: lowercase host, tracking params dropped, trailing
    slash stripped — all JVM built-ins (parse_url + regexp), one narrow
    projection. Query params other than the tracking family survive."""
    u = F.col(url_col)
    host = F.lower(F.parse_url(u, F.lit("HOST")))
    path = F.regexp_replace(F.parse_url(u, F.lit("PATH")), "/$", "")
    q = F.parse_url(u, F.lit("QUERY"))
    # drop utm_*/fbclid/gclid params; then drop the '?' if nothing is left
    q_clean = F.regexp_replace(
        F.coalesce(q, F.lit("")),
        "(^|&)(utm_[a-z]+|fbclid|gclid)=[^&]*", "")
    q_clean = F.regexp_replace(q_clean, "^&", "")
    canon = F.concat(
        F.lit("https://"), host, path,
        F.when(q_clean != "", F.concat(F.lit("?"), q_clean))
        .otherwise(F.lit("")))
    # a malformed/relative URL makes HOST or PATH NULL and concat
    # propagates it — without a fallback every unparseable URL would
    # collapse into ONE all-NULL dedup group (silent doc loss on real
    # crawls); degrade to the raw string so each stays its own key
    return F.coalesce(canon, u)


def url_dedup_groups(df: DataFrame, url_col: str = "url",
                     id_col: str = "doc_id") -> DataFrame:
    """Exact dedup on the CANONICAL url — the same one-shuffle
    hash-groupBy shape as content exact-dedup, keyed on the canonical
    string (uniform keys at corpus scale): keeper id + copy count per
    logical page."""
    return (df.select(F.col(id_col), canonical_url(url_col).alias("canon"))
            .groupBy("canon")
            .agg(F.min(id_col).alias("keep_id"),
                 F.count(F.lit(1)).alias("n_copies")))


# --------------------------------------------------------------------------
# outbound-link extraction → domain link graph (feeds graph.pagerank)
# --------------------------------------------------------------------------


def _tld_cycle(k: Column) -> Column:
    """The URL-family's planted TLD cycle (com / co.uk / com.au /
    k12.ak.us by ``k % 4``) — 1-, 2- and 3-label public suffixes."""
    return (F.when(k % 4 == 1, "co.uk")
            .when(k % 4 == 2, "com.au")
            .when(k % 4 == 3, "k12.ak.us")
            .otherwise("com"))


def synthesize_planted_links(docs: DataFrame,
                             id_col: str = "doc_id") -> DataFrame:
    """(doc_id, html) link fixture: two ABSOLUTE hrefs whose target
    domains derive arithmetically from doc_id (TLDs cycle through the
    1/2/3-label suffixes), plus a relative href and a bare ``<a name>``
    anchor that extraction must ignore — and one of the two real links
    is spelled ``<A HREF=`` to pin case-insensitive matching."""
    did = F.col(id_col)
    u1 = F.concat(F.lit("https://w"), (did % 5).cast("string"),
                  F.lit(".example-"), ((did + 1) % 7).cast("string"),
                  F.lit("."), _tld_cycle(did + 1),
                  F.lit("/p/"), did.cast("string"))
    u2 = F.concat(F.lit("http://example-"), ((did * 3) % 7).cast("string"),
                  F.lit("."), _tld_cycle(did + 2), F.lit("/q"))
    html = F.concat(
        F.lit('<p>see <a href="'), u1,
        F.lit('">a</a> and <a href="/rel/'), did.cast("string"),
        F.lit('">rel</a> or <a name="x">anchor</a> <A HREF="'), u2,
        F.lit('">b</A></p>'))
    return docs.select(id_col, html.alias("html"))


def extract_links(df: DataFrame, html_col: str = "html",
                  id_col: str = "doc_id") -> DataFrame:
    """(id, href, dst_domain): every absolute http(s) ``href`` in the
    page, with the target's PSL eTLD+1.

    `regexp_extract_all` + explode + `parse_url` — a narrow projection
    with per-row fan-out (links per page), no shuffle: at 100 TB this
    runs inside the scan stage and only the DOMAIN-aggregated edge list
    (see :func:`domain_edges`) ever shuffles. Relative hrefs are
    dropped, not resolved — base-URL resolution is a crawl-frontier
    concern, and counting them as same-page links would self-inflate
    every domain's rank."""
    # either quote style; the backreference closes the one that opened
    hrefs = F.regexp_extract_all(
        F.col(html_col),
        F.lit("(?i)href\\s*=\\s*([\"'])(https?://[^\"']+)\\1"), 2)
    ex = df.select(F.col(id_col), F.explode(hrefs).alias("href"))
    host = F.parse_url(F.col("href"), F.lit("HOST"))
    return ex.select(id_col, "href", reg_domain_expr(host).alias("dst_domain"))


def domain_edges(parsed: DataFrame, links: DataFrame,
                 id_col: str = "doc_id") -> DataFrame:
    """Weighted domain→domain edge list: each doc's registered domain
    (``parsed``: id → reg_domain, from :func:`parse_urls`) linked to
    every extracted target domain (``links``, from
    :func:`extract_links`); self-loops dropped; one aggregation down to
    domain²-bounded output. This is the single corpus-scale shuffle of
    the whole PageRank family — everything after it is domain-sized."""
    return (parsed.select(id_col, F.col("reg_domain").alias("src"))
            .join(links.select(id_col, F.col("dst_domain").alias("dst")),
                  id_col)
            .filter(F.col("src") != F.col("dst"))
            .groupBy("src", "dst").agg(F.count(F.lit(1)).alias("w")))


# --------------------------------------------------------------------------
# HTML main-content extraction
# --------------------------------------------------------------------------

# block-level elements whose CLOSE marks a line boundary; everything else
# (<a>, <b>, <span>…) is inline and strips to nothing
_BLOCK_CLOSE = (r"(?i)</(p|div|h[1-6]|li|tr|td|th|title|nav|footer|header|"
                r"article|section|ul|ol|table|blockquote|pre)>|<br\s*/?>")

# decode order matters: &amp; LAST, so planted "&amp;lt;" does not
# double-decode into "<"
_ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""),
             ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"))


def main_content_expr(html: Column, min_words: int = 4) -> Column:
    """Readable text out of raw HTML — JVM regexp/array built-ins only.

    jusText/CCNet-shaped heuristic: (1) drop script/style/comment
    subtrees wholesale, (2) turn block-element closes into line breaks,
    (3) strip remaining tags, decode the common entities, (4) keep only
    lines with >= ``min_words`` words (short lines are nav/footer/button
    chrome on real pages). One narrow projection per row: no shuffle, no
    Python — at 100 TB this runs inside the scan stage.
    """
    # regexp passes are the cost here (measured ~1 ms/doc with one pass
    # per pattern): fold script/style/comment subtrees into ONE
    # alternation (backreference closes the right tag), decode entities
    # with LITERAL replace (no regex engine), and collapse intra-line
    # whitespace in one whole-string pass instead of per line
    s = F.regexp_replace(
        html, r"(?is)<(script|style)\b[^>]*>.*?</\1>|<!--.*?-->", " ")
    s = F.regexp_replace(s, _BLOCK_CLOSE, "\n")
    s = F.regexp_replace(s, r"<[^>]*>", " ")
    for ent, rep in _ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(rep))
    s = F.regexp_replace(s, r"[^\S\n]+", " ")
    lines = F.transform(F.split(s, "\n"), lambda x: F.trim(x))
    kept = F.filter(
        lines,
        lambda x: (x != "") & (F.size(F.split(x, " ")) >= min_words))
    return F.array_join(kept, "\n")


def extract_main_content(df: DataFrame, html_col: str = "html",
                         id_col: str = "doc_id",
                         min_words: int = 4) -> DataFrame:
    """(id, main_text) via :func:`main_content_expr`."""
    return df.select(F.col(id_col),
                     main_content_expr(F.col(html_col), min_words)
                     .alias("main_text"))


def _page_html(did: Column, content: Column, sect: Column) -> Column:
    """Full page skeleton around ``content``: head with title/style/
    script, a comment, nav chrome, an h1, the content paragraph, a
    second paragraph (with an &amp; entity), a short tag-cloud div and
    a footer — the boilerplate profile extraction must strip."""
    return F.concat(
        F.lit("<html><head><title>d "), did.cast("string"),
        F.lit("</title><style>p{margin:0}</style>"
              "<script>var x=1;</script></head><body><!-- build "),
        (did % 13).cast("string"),
        F.lit(' --><nav><a href="/">home</a> <a href="/x">about</a></nav>'
              "<h1>doc "), did.cast("string"),
        F.lit("</h1><p>"), content,
        F.lit("</p><p>section "), sect,
        F.lit(" alpha &amp; beta gamma</p><div>tags "),
        (did % 3).cast("string"),
        F.lit(" pages</div><footer>footer text</footer></body></html>"))


def synthesize_planted_html(docs: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """Planted-markup fixture for :func:`extract_main_content`: each
    doc's REAL text wrapped in the page skeleton. The oracle recomputes
    the expected extraction directly from ``text`` and doc_id —
    extractor and builder share no code, so a stripping/entity/
    line-filter bug hash-mismatches."""
    did = F.col(id_col)
    html = _page_html(did, F.col(text_col), (did % 7).cast("string"))
    return docs.select(id_col, html.alias("html"))


# --------------------------------------------------------------------------
# composed web-curation pipeline
# --------------------------------------------------------------------------

# planted duplicate content: 10% of pages share this text verbatim, so
# the MinHash stage of the composed pipeline provably drops rows
_DUP_TEXT = ("key value table row scan fast merge batch part hash "
             "window sort")


def synthesize_web_fixture(docs: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Unified crawl fixture (doc_id, lang, url, html) for the composed
    pipeline — every stage's input is planted arithmetically:

    - ``page = doc_id // 2``: two URL variants per logical page (bare /
      ?utm_source= tracking), so canonical-URL dedup keeps the even id;
    - TLD cycles com / co.uk / com.au / k12.ak.us by page, exercising
      1-, 2- and 3-label public suffixes in ``reg_domain``;
    - pages with ``page % 10 == 3`` carry identical content (and a
      pinned section number), so MinHash dedup finds real duplicates;
    - html wraps the content in the :func:`_page_html` skeleton.
    """
    did = F.col(id_col)
    page = (did / F.lit(2)).cast("bigint")
    dup = (page % 10) == 3
    content = F.when(dup, F.lit(_DUP_TEXT)).otherwise(F.col(text_col))
    sect = F.when(dup, F.lit("9")).otherwise((did % 7).cast("string"))
    tld = (F.when(page % 4 == 1, "co.uk")
           .when(page % 4 == 2, "com.au")
           .when(page % 4 == 3, "k12.ak.us")
           .otherwise("com"))
    host = F.concat(F.lit("w"), (page % 13).cast("string"),
                    F.lit(".example-"), (page % 7).cast("string"),
                    F.lit("."), tld)
    url = F.concat(
        F.lit("https://"), host, F.lit("/page/"), page.cast("string"),
        F.when(did % 2 == 1, F.lit("?utm_source=feed")).otherwise(F.lit("")))
    return docs.select(id_col, "lang", url.alias("url"),
                       _page_html(did, content, sect).alias("html"))


def curate_web_corpus(docs: DataFrame, blocked: DataFrame,
                      threshold: float = 0.6,
                      min_words: int = 4) -> DataFrame:
    """The composed web-curation pipeline — what a crawl-to-corpus run
    actually executes, built from the engine's certified stages:

    URL parse (PSL eTLD+1) → domain blocklist (broadcast anti-join) →
    canonical-URL dedup (one hash shuffle) → HTML main-content
    extraction (narrow projection) → CCNet-style per-language quality
    buckets (exact discrete percentiles, broadcast threshold join) →
    MinHash-LSH + exact-Jaccard content dedup (banded candidates, keep
    the lower id of each verified pair) → per-(lang, bucket) corpus
    composition stats.

    No stage adds a shuffle beyond its certified single-op shape; the
    bucket label is kept through dedup so the output certifies every
    stage's values (dropping the 'tail' bucket is a one-line filter of
    this result — policy, not plumbing).
    """
    from . import dedup as dd
    from .textstats import bigram_coherence

    fx = synthesize_web_fixture(docs)
    # blocklist + canonical dedup FUSED into one linear chain: reg_domain
    # is a derived column on the crawl frame (no separate parsed frame +
    # join-back, which would evaluate the fixture subtree twice), and the
    # keep-min-doc_id-per-canonical rule is ONE window instead of a
    # groupBy + self-join (same semantics as url_dedup_groups, one fewer
    # pass over the crawl). The single-op builders stay as the certified
    # per-stage forms.
    fx2 = (fx.withColumn(
               "reg_domain",
               reg_domain_expr(F.parse_url(F.col("url"), F.lit("HOST"))))
           .join(blocked, "reg_domain", "left_anti")
           .drop("reg_domain"))
    w = Window.partitionBy(canonical_url("url")).orderBy("doc_id")
    kept = (fx2.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))
    # Materialize the post-extraction corpus ONCE: every downstream
    # branch (bigram stats ×3 internal passes, threshold agg, bucket
    # join, shingles, final anti-join) re-reads this frame, and without
    # a barrier Spark recomputes the regexp-heavy extraction chain per
    # branch (measured 12 s -> ~5 s at sf0.1). At 100 TB this is the
    # standard pipeline break: write the extracted corpus to parquet
    # and fan the curation stages out from storage (lineage_cut's
    # conf-switched storage mode IS that write — functions/barrier.py).
    # localCheckpoint, not persist: persist dedups EXECUTION but keeps the full lineage,
    # so Catalyst re-analyzes the whole extraction tree once per
    # consumer branch (the analyzed plan was ~10.8k formatted lines;
    # driver-side planning dominated the floor — guide §3.3/§7.3), and
    # the per-call cache entries leak in the CacheManager since an
    # operator can't know when its caller is done. The checkpoint
    # truncates the logical plan at this barrier (plan shrank ~20x,
    # floor 5.30 -> 3.69 s at sf0.1) and its RDD is GC-scoped to
    # the returned frame — no unpersist bookkeeping.
    ext = lineage_cut(kept.select(
        "doc_id", "lang",
        main_content_expr(F.col("html"), min_words).alias("main_text")
    ))
    scored = bigram_coherence(ext, text_col="main_text")
    # scored is itself a corpus aggregation consumed by two branches
    # (threshold agg + bucket join): cut the skinny (doc_id, score)
    # frame so the bigram join tree runs once
    scored = lineage_cut(scored)
    sl = ext.join(scored, "doc_id")
    # discrete tercile thresholds by EXPLICIT integer-index selection
    # (sorted 1-based index ceil(p*n), computed with integer div): both
    # engines' builtin discrete percentiles pick float-arithmetic-
    # dependent indexes that disagree for some group sizes — spelling
    # the rule out makes the threshold bit-identical cross-engine.
    # Memory class equals exact percentile_disc (per-group buffer);
    # approx_percentile swaps in at 100 TB unchanged.
    th = (sl.groupBy("lang")
          .agg(F.sort_array(F.collect_list("mean_transition_p"))
               .alias("l"))
          .select("lang",
                  F.expr("element_at(l, CAST((size(l) + 2) div 3 AS INT))")
                  .alias("t1"),
                  F.expr("element_at(l, CAST((2 * size(l) + 2) div 3"
                         " AS INT))").alias("t2")))
    # the bucketed frame feeds TWO branches (the shingle/dedup chain and
    # the final anti-join + rollup): cut it so the tercile agg and the
    # threshold join run once (substep-profiled ~0.2 s per extra
    # evaluation at sf0.1; guide §3.3)
    b = lineage_cut(
        sl.join(F.broadcast(th), "lang")
        .withColumn(
            "bucket",
            F.when(F.col("mean_transition_p") > F.col("t2"), "head")
            .when(F.col("mean_transition_p") > F.col("t1"), "middle")
            .otherwise("tail")))
    # the shingle frame feeds FOUR subtrees (minhash signatures, both
    # sides of the intersection join, the size agg) — cut it so the
    # explode runs once
    sh = lineage_cut(dd.shingle_select(
        b.select("doc_id", F.col("main_text").alias("text"))))
    ver = dd.jaccard_on_pairs(
        sh, dd.minhash_band_pairs(dd.minhash_signatures(sh)),
        threshold=threshold)
    drop = ver.select(F.col("doc_b").alias("doc_id")).distinct()
    final = b.join(drop, "doc_id", "left_anti")
    n_tokens = F.size(F.split(
        F.regexp_replace("main_text", "\n", " "), " "))
    return (final.withColumn("n_tokens", n_tokens)
            .groupBy("lang", "bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("n_tokens").cast("long").alias("n_tokens")))


def curate_web_corpus_sql(table: str = "documents",
                          threshold: float = 0.6,
                          min_words: int = 4,
                          blocked: tuple[str, ...] = (
                              "example-1.com", "example-2.co.uk")) -> str:
    """DuckDB oracle for :func:`curate_web_corpus`.

    Stages 1-3 (parse → blocklist → canonical dedup) are recomputed
    ARITHMETICALLY from the planted fixture (the oracle never parses a
    URL — a parse_url/PSL/canonicalization bug on the Spark side
    hash-mismatches); extraction is the planted-line truth; scoring,
    bucketing and MinHash dedup compose the same SQL builders the
    single-op oracles certify. ``blocked`` must be the SAME domain list
    the Spark side is called with, and the canonical-dedup keep rule is
    DERIVED (min doc_id per fixture page — the fixture maps canonical
    URL 1:1 to ``doc_id // 2``) rather than assuming id contiguity, so
    a non-default blocklist or a gappy id range certifies correctly."""
    from . import dedup as dd
    from .textstats import bigram_coherence_sql

    blocked_list = ", ".join("'" + d.replace("'", "''") + "'"
                             for d in blocked)
    dup = "((doc_id // 2) % 10 = 3)"
    tld = ("CASE WHEN (doc_id // 2) % 4 = 1 THEN 'co.uk' "
           "WHEN (doc_id // 2) % 4 = 2 THEN 'com.au' "
           "WHEN (doc_id // 2) % 4 = 3 THEN 'k12.ak.us' ELSE 'com' END")
    reg = (f"('example-' || CAST((doc_id // 2) % 7 AS VARCHAR)"
           f" || '.' || {tld})")
    return rf"""
    WITH unblocked AS (
      SELECT doc_id, lang, text FROM {table}
      WHERE {reg} NOT IN ({blocked_list})
    ),
    kept AS (
      SELECT doc_id, lang,
             regexp_replace(trim(CASE WHEN {dup} THEN '{_DUP_TEXT}'
                                 ELSE text END), '\s+', ' ', 'g') AS cc,
             CASE WHEN {dup} THEN '9'
                  ELSE CAST(doc_id % 7 AS VARCHAR) END AS sect
      FROM (SELECT *, MIN(doc_id) OVER (PARTITION BY doc_id // 2) AS _m
            FROM unblocked)
      WHERE doc_id = _m
    ),
    ext AS (
      SELECT doc_id, lang,
             CASE WHEN len(string_split(cc, ' ')) >= {min_words}
                  THEN cc || chr(10) ELSE '' END
               || 'section ' || sect || ' alpha & beta gamma' AS main_text
      FROM kept
    ),
    scored AS (SELECT * FROM ({bigram_coherence_sql("ext", "main_text")})),
    sl AS (
      SELECT e.doc_id, e.lang, e.main_text, s.mean_transition_p
      FROM ext e JOIN scored s USING (doc_id)
    ),
    th AS (
      -- same explicit integer-index tercile rule as the Spark side
      -- (sorted 1-based index ceil(p*n) via integer div): builtin
      -- discrete percentiles disagree across engines for some sizes
      SELECT lang,
             l[(len(l) + 2) // 3] AS t1,
             l[(2 * len(l) + 2) // 3] AS t2
      FROM (SELECT lang, list_sort(list(mean_transition_p)) AS l
            FROM sl GROUP BY lang)
    ),
    b AS (
      SELECT sl.doc_id, sl.lang, sl.main_text,
             CASE WHEN sl.mean_transition_p > th.t2 THEN 'head'
                  WHEN sl.mean_transition_p > th.t1 THEN 'middle'
                  ELSE 'tail' END AS bucket
      FROM sl JOIN th USING (lang)
    ),
    ver AS (SELECT * FROM (
      {dd.lsh_jaccard_sql(dd.shingle_sql("b", "main_text"), threshold)}
    )),
    fin AS (
      SELECT * FROM b WHERE doc_id NOT IN (SELECT doc_b FROM ver)
    )
    SELECT lang, bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(string_split(
                 regexp_replace(main_text, chr(10), ' ', 'g'), ' ')))
             AS BIGINT) AS n_tokens
    FROM fin GROUP BY lang, bucket
    """


# --------------------------------------------------------------------------
# Anchor-text profiles per target domain
# --------------------------------------------------------------------------

# an <a> whose href is ABSOLUTE http(s), capturing (2) the url and (3) the
# plain inner text; the backreference closes whichever quote opened. The
# text group ends at the FIRST nested tag ([^<]* — the conservative read:
# "mixed <b>inner</b>" attributes only "mixed "), so no literal </a> is
# required after it (requiring one would silently drop every anchor with
# inline markup).
_ANCHOR_RE = (r"(?i)<a\s[^>]*?href\s*=\s*([\"'])(https?://[^\"']+)\1"
              r"[^>]*>([^<]*)")


def synthesize_planted_anchors(docs: DataFrame,
                               id_col: str = "doc_id") -> DataFrame:
    """(doc_id, html) anchor fixture: two absolute-href anchors whose
    target domains AND anchor words derive arithmetically from doc_id,
    plus a relative-href anchor ("skip me") whose text must NOT be
    attributed to any domain, and a second-anchor ``<A HREF`` spelling
    pinning case-insensitivity (same planting discipline as
    :func:`synthesize_planted_links`)."""
    did = F.col(id_col)
    u1 = F.concat(F.lit("https://w"), (did % 5).cast("string"),
                  F.lit(".example-"), ((did + 1) % 7).cast("string"),
                  F.lit("."), _tld_cycle(did + 1),
                  F.lit("/p/"), did.cast("string"))
    t1 = F.concat(F.lit("visit example site "), (did % 3).cast("string"))
    u2 = F.concat(F.lit("http://example-"), ((did * 3) % 7).cast("string"),
                  F.lit("."), _tld_cycle(did + 2), F.lit("/q"))
    t2 = F.concat(F.lit("download data "), (did % 2).cast("string"))
    html = F.concat(
        F.lit('<p><a href="'), u1, F.lit('">'), t1,
        F.lit('</a> <a href="/rel/'), did.cast("string"),
        F.lit('">skip me</a> <A HREF="'), u2, F.lit('">'), t2,
        F.lit("</A></p>"))
    return docs.select(id_col, html.alias("html"))


def extract_anchors(df: DataFrame, html_col: str = "html",
                    id_col: str = "doc_id") -> DataFrame:
    """(id, dst_domain, anchor): the visible text of every absolute
    http(s) link, keyed by the target's PSL eTLD+1.

    Anchor text is the strongest off-page description of a target domain
    a crawl owns — search stacks and link-spam classifiers aggregate it
    per domain (TrustRank-adjacent signals), and a curation pipeline uses
    the same profile to give or deny a domain a quality prior. Two
    `regexp_extract_all` passes over the same pattern (url group, text
    group) are zipped positionally — one narrow projection with per-row
    fan-out, no shuffle, no Python; at 100 TB this stays inside the scan
    stage and only the domain-aggregated term table ever shuffles."""
    urls = F.regexp_extract_all(F.col(html_col), F.lit(_ANCHOR_RE), 2)
    txts = F.regexp_extract_all(F.col(html_col), F.lit(_ANCHOR_RE), 3)
    pair = F.zip_with(urls, txts,
                      lambda u, t: F.struct(u.alias("href"),
                                            t.alias("anchor")))
    ex = df.select(F.col(id_col), F.explode(pair).alias("l"))
    host = F.parse_url(F.col("l.href"), F.lit("HOST"))
    return ex.select(id_col, reg_domain_expr(host).alias("dst_domain"),
                     F.col("l.anchor").alias("anchor"))


def anchor_domain_terms(anchors: DataFrame, k: int = 5) -> DataFrame:
    """Top-``k`` anchor terms per target domain: (dst_domain, term, n,
    rnk) — the domain's inbound-text profile.

    Shape at scale: explode to (domain, term) → ONE partial+final count
    on uniform keys → per-domain top-k via a row_number window whose
    ``<= k`` filter Catalyst rewrites to two-phase WindowGroupLimit
    (map-side prune before the exchange, the repo's certified top-k
    discipline)."""
    terms = (anchors
             .select("dst_domain",
                     F.explode(F.split(F.lower(F.col("anchor")),
                                       r"\s+")).alias("term"))
             .filter(F.col("term") != ""))
    counts = (terms.groupBy("dst_domain", "term")
              .agg(F.count(F.lit(1)).alias("n")))
    w = Window.partitionBy("dst_domain").orderBy(F.desc("n"),
                                                 F.asc("term"))
    return (counts.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k))


def anchor_domain_terms_sql(table: str = "documents", k: int = 5,
                            id_col: str = "doc_id") -> str:
    """DuckDB oracle for :func:`anchor_domain_terms` over the planted
    anchor fixture: both (domain, anchor-text) rows are regenerated
    arithmetically — extractor and oracle share no code path — then the
    identical explode/count/top-k."""
    tld1 = (f"CASE WHEN ({id_col} + 1) % 4 = 1 THEN 'co.uk' "
            f"WHEN ({id_col} + 1) % 4 = 2 THEN 'com.au' "
            f"WHEN ({id_col} + 1) % 4 = 3 THEN 'k12.ak.us' "
            f"ELSE 'com' END")
    tld2 = (f"CASE WHEN ({id_col} + 2) % 4 = 1 THEN 'co.uk' "
            f"WHEN ({id_col} + 2) % 4 = 2 THEN 'com.au' "
            f"WHEN ({id_col} + 2) % 4 = 3 THEN 'k12.ak.us' "
            f"ELSE 'com' END")
    return f"""
    WITH anchors AS (
      SELECT 'example-' || CAST(({id_col} + 1) % 7 AS VARCHAR) || '.'
               || {tld1} AS dst_domain,
             'visit example site ' || CAST({id_col} % 3 AS VARCHAR)
               AS anchor
      FROM {table}
      UNION ALL
      SELECT 'example-' || CAST(({id_col} * 3) % 7 AS VARCHAR) || '.'
               || {tld2},
             'download data ' || CAST({id_col} % 2 AS VARCHAR)
      FROM {table}
    ),
    terms AS (
      SELECT dst_domain, unnest(string_split(lower(anchor), ' ')) AS term
      FROM anchors
    ),
    counts AS (
      SELECT dst_domain, term, COUNT(*) AS n FROM terms
      WHERE term <> '' GROUP BY dst_domain, term
    )
    SELECT dst_domain, term, n, rnk FROM (
      SELECT dst_domain, term, n,
             ROW_NUMBER() OVER (PARTITION BY dst_domain
                                ORDER BY n DESC, term ASC) AS rnk
      FROM counts
    ) WHERE rnk <= {k}
    """


# --------------------------------------------------------------------------
# robots.txt: Disallow-rule extraction + prefix filtering
# --------------------------------------------------------------------------


def synthesize_planted_robots(docs: DataFrame,
                              id_col: str = "doc_id") -> DataFrame:
    """(reg_domain, robots) fixture: one robots.txt per planted domain,
    whose Disallow path derives arithmetically from the domain index —
    plus an ``Allow:`` line, a comment and a second rule the parser must
    handle (extract Disallow only, all of them)."""
    did = F.col(id_col)
    domain = F.concat(F.lit("example-"), (did % 7).cast("string"),
                      F.lit("."), _tld_cycle(did))
    robots = F.concat(
        F.lit("User-agent: *\nAllow: /open\nDisallow: /path/"),
        (did % 7).cast("string"),
        F.lit("\nDisallow: /admin\n# crawl politely"))
    return (docs.select(domain.alias("reg_domain"),
                        robots.alias("robots"))
            .distinct())


def parse_robots(df: DataFrame, domain_col: str = "reg_domain",
                 robots_col: str = "robots") -> DataFrame:
    """(reg_domain, dis_prefix): every ``Disallow:`` path in the file.

    Single-group semantics (rules under ``User-agent: *`` — the
    dataset-construction reading: respect any disallow); ``Allow:``
    lines and comments are ignored. One multiline-regexp projection over
    a DOMAIN-cardinality table — parsing is never corpus-scale work."""
    prefixes = F.regexp_extract_all(
        F.col(robots_col), F.lit(r"(?m)^Disallow:\s*(\S+)"), 1)
    return df.select(F.col(domain_col),
                     F.explode(prefixes).alias("dis_prefix"))


def robots_filter(parsed: DataFrame, rules: DataFrame,
                  domain_col: str = "reg_domain",
                  path_col: str = "path") -> DataFrame:
    """Drop every URL whose path starts with a Disallow prefix for its
    registered domain — the robots-respect gate a responsible corpus
    build runs before fetching or keeping a page.

    Rules are domain-cardinality → broadcast; the prefix match is a
    non-equi condition inside a broadcast LEFT ANTI join (domain
    equality narrows first, `startswith` decides), so the corpus-side
    pass stays narrow at any scale."""
    r = rules.select(F.col(domain_col).alias("_r_dom"),
                     F.col("dis_prefix"))
    cond = ((F.col(domain_col) == F.col("_r_dom"))
            & F.col(path_col).startswith(F.col("dis_prefix")))
    return parsed.join(F.broadcast(r), cond, "left_anti")


# --------------------------------------------------------------------------
# sitemap.xml: <loc> URL extraction
# --------------------------------------------------------------------------


def synthesize_planted_sitemaps(docs: DataFrame,
                                id_col: str = "doc_id") -> DataFrame:
    """(doc_id, sitemap) fixture: two ``<loc>`` entries per sitemap with
    arithmetically-derived URLs — the second padded with whitespace
    (extraction must trim) — plus ``<lastmod>`` noise the extractor must
    ignore."""
    did = F.col(id_col)
    u1 = F.concat(F.lit("https://example-"), (did % 7).cast("string"),
                  F.lit("."), _tld_cycle(did), F.lit("/s/"),
                  did.cast("string"))
    u2 = F.concat(F.lit("http://mirror-"), ((did + 2) % 5).cast("string"),
                  F.lit("."), _tld_cycle(did + 3), F.lit("/t"))
    xml = F.concat(
        F.lit('<?xml version="1.0"?><urlset><url><loc>'), u1,
        F.lit("</loc><lastmod>2024-01-01</lastmod></url><url><loc>  "),
        u2, F.lit("  </loc></url></urlset>"))
    return docs.select(id_col, xml.alias("sitemap"))


def extract_sitemap_urls(df: DataFrame, xml_col: str = "sitemap",
                         id_col: str = "doc_id") -> DataFrame:
    """(id, loc, reg_domain): every ``<loc>`` URL in a sitemap, trimmed,
    keyed by the target's PSL eTLD+1 — the crawl-frontier seed stream
    (sitemaps are how a site TELLS the crawler what exists; a frontier
    seeded from them reaches content the link graph alone misses).
    One regexp projection + per-row fan-out, no shuffle — the
    extract_links shape; at corpus scale only whatever aggregates the
    seeds (per-domain counts, frontier dedup) ever shuffles."""
    locs = F.regexp_extract_all(
        F.col(xml_col), F.lit(r"(?s)<loc>\s*([^<]*?)\s*</loc>"), 1)
    ex = df.select(F.col(id_col), F.explode(locs).alias("loc"))
    host = F.parse_url(F.col("loc"), F.lit("HOST"))
    return ex.select(id_col, "loc", reg_domain_expr(host).alias("reg_domain"))
