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

from pyspark.sql import DataFrame, functions as F


def synthesize_planted_urls(docs: DataFrame,
                            id_col: str = "doc_id") -> DataFrame:
    """Deterministic URL per doc: subdomain/registered-domain/path/query
    all derived from doc_id (every third doc carries a query string)."""
    did = F.col(id_col)
    url = F.concat(
        F.lit("https://w"), (did % 97).cast("string"),
        F.lit(".example-"), (did % 7).cast("string"),
        F.lit(".com/path/"), did.cast("string"),
        F.when(did % 3 == 0,
               F.concat(F.lit("?q="), (did % 5).cast("string")))
        .otherwise(F.lit("")))
    return docs.select(id_col, url.alias("url"))


def parse_urls(df: DataFrame, url_col: str = "url",
               id_col: str = "doc_id") -> DataFrame:
    """(id, host, reg_domain, path, query) — JVM `parse_url` projection.

    ``reg_domain`` is the last two host labels (the eTLD+1 approximation
    that works for .com-style registries; a production system swaps in
    the public-suffix list as a broadcast lookup — the dataflow is the
    same narrow projection + broadcast join).
    """
    u = F.col(url_col)
    return df.select(
        F.col(id_col),
        F.parse_url(u, F.lit("HOST")).alias("host"),
        F.substring_index(F.parse_url(u, F.lit("HOST")), ".", -2)
        .alias("reg_domain"),
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
    return F.concat(
        F.lit("https://"), host, path,
        F.when(q_clean != "", F.concat(F.lit("?"), q_clean))
        .otherwise(F.lit("")))


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
