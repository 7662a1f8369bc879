"""Text-analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.

These extend the reference's text surface (transcript word counts,
sessions.words_count_* ETL/schema.py:336-338; tag matching sessions_tags)
into the operators a training-data pipeline runs over every document.
Everything is built-in expressions (regexp/array/map functions) — exact
integers or single IEEE divisions, so the DuckDB oracles hash-match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# n-gram-free heuristic language ID: score = count of language-marker
# stopwords. Markers chosen per-language; ties broken by fixed priority
# order (the declaration order below).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "los"),
    "fr": ("le", "les", "des", "et", "une"),
    "de": ("der", "die", "und", "das", "ist"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),  # pinyin-romanized markers
}

# BPE-ish tokenizer: runs of word chars OR single non-space symbols —
# approximates subword pre-tokenization (reference has whitespace only).
TOKEN_REGEX = r"[a-z0-9]+|[^a-z0-9\s]"


def token_count(text_col: str = "text") -> Column:
    """Whitespace token count — the reference's words_count semantics."""
    return F.size(F.split(F.trim(F.col(text_col)), r"\s+"))


def regex_token_count(text_col: str = "text") -> Column:
    """BPE-ish token count via regexp_extract_all."""
    return F.size(F.regexp_extract_all(F.lower(F.col(text_col)),
                                       F.lit(TOKEN_REGEX), 0))


def lang_scores(text_col: str = "text") -> list[Column]:
    """Per-language marker-stopword hit counts (token-exact, not substring)."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    cols = []
    for lang, words in STOPWORDS.items():
        arr = "array(" + ", ".join(f"'{w}'" for w in words) + ")"
        cols.append(F.expr(
            f"size(filter(split(lower({text_col}), ' '),"
            f" t -> array_contains({arr}, t)))").alias(f"score_{lang}"))
    _ = toks
    return cols


def lang_guess_expr(text_col: str = "text") -> Column:
    """argmax over language scores with declaration-order tie-break."""
    scores = {lang: F.expr(
        f"size(filter(split(lower({text_col}), ' '),"
        f" t -> array_contains(array({', '.join(repr(w) for w in words)}), t)))")
        for lang, words in STOPWORDS.items()}
    langs = list(STOPWORDS)
    best = F.lit(langs[0])
    best_score = scores[langs[0]]
    for lang in langs[1:]:
        is_better = scores[lang] > best_score
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_score = F.when(is_better, scores[lang]).otherwise(best_score)
    return best


def lang_guess_sql(text_col: str = "text") -> str:
    """DuckDB rendering of the same argmax (same tie-break order)."""
    score = {lang: (f"len(list_filter(string_split(lower({text_col}), ' '),"
                    f" t -> list_contains([{', '.join(repr(w) for w in words)}], t)))")
             for lang, words in STOPWORDS.items()}
    langs = list(STOPWORDS)
    expr, sexpr = f"'{langs[0]}'", score[langs[0]]
    for lang in langs[1:]:
        expr = f"CASE WHEN {score[lang]} > {sexpr} THEN '{lang}' ELSE {expr} END"
        sexpr = f"CASE WHEN {score[lang]} > {sexpr} THEN {score[lang]} ELSE {sexpr} END"
    return expr


def quality_columns(text_col: str = "text") -> dict[str, Column]:
    """Deterministic quality features: token count, distinct ratio,
    mean token length, stopword ratio (all-language markers)."""
    toks = f"split(lower({text_col}), ' ')"
    all_stop = sorted({w for ws in STOPWORDS.values() for w in ws})
    arr = "array(" + ", ".join(f"'{w}'" for w in all_stop) + ")"
    return {
        "n_tokens": F.expr(f"size({toks})"),
        "n_distinct_tokens": F.expr(f"size(array_distinct({toks}))"),
        "ttr": F.round(F.expr(f"size(array_distinct({toks}))")
                       / F.expr(f"size({toks})"), 6),
        "mean_token_len": F.round(
            F.expr(f"aggregate({toks}, 0, (a, t) -> a + length(t))")
            / F.expr(f"size({toks})"), 6),
        "stopword_ratio": F.round(
            F.expr(f"size(filter({toks}, t -> array_contains({arr}, t)))")
            / F.expr(f"size({toks})"), 6),
    }


def quality_sql_columns(text_col: str = "text") -> dict[str, str]:
    toks = f"string_split(lower({text_col}), ' ')"
    all_stop = sorted({w for ws in STOPWORDS.values() for w in ws})
    arr = "[" + ", ".join(f"'{w}'" for w in all_stop) + "]"
    return {
        "n_tokens": f"len({toks})",
        "n_distinct_tokens": f"len(list_distinct({toks}))",
        "ttr": f"ROUND(len(list_distinct({toks})) * 1.0 / len({toks}), 6)",
        "mean_token_len":
            f"ROUND(list_sum(list_transform({toks}, t -> len(t))) * 1.0"
            f" / len({toks}), 6)",
        "stopword_ratio":
            f"ROUND(len(list_filter({toks}, t -> list_contains({arr}, t)))"
            f" * 1.0 / len({toks}), 6)",
    }


def fingerprint(text_col: str = "text") -> Column:
    """Content fingerprint: md5 of whitespace-normalized lowercase text.
    (The rolling-hash variant for shift-tolerant matching is the simhash
    op in dedup.py.)"""
    return F.md5(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full stat battery — one narrow projection, no shuffle."""
    cols = quality_columns(text_col)
    out = df
    for name, c in cols.items():
        out = out.withColumn(name, c)
    return (out.withColumn("lang_guess", lang_guess_expr(text_col))
            .withColumn("fingerprint", fingerprint(text_col))
            .withColumn("n_regex_tokens", regex_token_count(text_col)))
