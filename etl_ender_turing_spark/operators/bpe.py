"""Distributed BPE tokenizer training (Sennrich et al. 2016,
arXiv:1508.07909): word-frequency compression, weighted pair counts,
and plan-unrolled greedy merge rounds.

Classic BPE trains on the DISTINCT-WORD frequency table, not the raw
token stream — the only corpus-scale stage is therefore the one
``word_freqs`` aggregation (a single partial+final count whose output
is vocabulary-scale, Zipf-bounded far below the corpus). Every merge
round after that is vocab-scale work:

- pair statistics: one aggregation over the current symbolizations,
  weighted by word frequency;
- the argmax pair: ORDER BY cnt DESC LIMIT 1 → TakeOrderedAndProject
  (per-partition heads, no global sort), broadcast as a 1-row frame;
- merge application: a greedy left-to-right fold over each word's
  symbol array. String ``replace`` is NOT correct here — it rescans the
  original string, so a run like ``a a a a`` merges to ``aa a a``
  instead of BPE's ``aa aa``; the fold carries the merged prefix and
  gets runs right (pinned by test + both engines' fold agree).

At 100 TB the honest production recipe is: run ``word_freqs``
distributed (the corpus pass), then COLLECT the vocab table — it is
metadata-sized, like the IVF centroids this repo already collects — and
iterate the 30k merge rounds driver-side. The plan-unrolled distributed
rounds here exist so the whole learn loop is certifiable against the
DuckDB oracle; both shapes share the same per-round SQL.

Cross-engine exactness: all-integer arithmetic (counts and string
surgery only — no floats anywhere), so the driver hash needs no
rounding contract at all.

Reference parity note: the reference engine has no tokenizer operator —
this family belongs to the training-data-pipeline mandate (SURVEY.md
§6), alongside the n-gram LM and DSIR.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.barrier import lineage_cut

# --- shared dialect snippets ------------------------------------------------

# word -> sentinel-spaced initial symbolization " h e l l o "
_INIT_SPARK = ("concat(' ', array_join(filter(split(word, ''),"
               " c -> c <> ''), ' '), ' ')")
_INIT_DUCK = ("' ' || array_to_string(list_filter(string_split(word, ''),"
              " c -> c <> ''), ' ') || ' '")

# adjacent symbol pairs of the current symbolization w (single-spaced)
_PAIRS_SPARK = ("CASE WHEN size(_s) >= 2 THEN"
                " transform(sequence(1, size(_s) - 1),"
                " i -> concat(element_at(_s, i), ' ',"
                " element_at(_s, i + 1))) ELSE array() END")
_PAIRS_DUCK = ("list_transform(generate_series(2, len(_s)),"
               " i -> _s[i - 1] || ' ' || _s[i])")

# greedy left-to-right merge of (p1, p2) over the symbol array: the
# accumulator is the sentinel-spaced merged prefix; a symbol merges iff
# the prefix currently ends with " p1 " — the merged token p1p2 differs
# from p1, so runs merge in non-overlapping left-to-right order, exactly
# the BPE application rule.
_FOLD_BODY = """CASE
      WHEN length(acc) >= length(p1) + 2
           AND substr(acc, length(acc) - length(p1) - 1)
               = ' ' || p1 || ' '
           AND x = p2
      THEN substr(acc, 1, length(acc) - length(p1) - 1)
           || p1 || p2 || ' '
      ELSE acc || x || ' ' END"""
_MERGE_SPARK = (f"aggregate(_s, CAST(' ' AS STRING),"
                f" (acc, x) -> {_FOLD_BODY})")
_MERGE_DUCK = (f"list_reduce(list_prepend(' ', _s),"
               f" (acc, x) -> {_FOLD_BODY})")


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq): the corpus-scale pass — one partial+final count,
    vocabulary-scale output. Everything downstream trains on this."""
    return (df.select(F.explode(F.expr(
                f"filter(split(lower(trim({text_col})), ' '),"
                f" x -> x <> '')")).alias("word"))
            .groupBy("word")
            .agg(F.count(F.lit(1)).cast("long").alias("freq")))


def bpe_pair_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Frequency-weighted adjacent character-pair counts over the
    initial symbolizations — the statistic the first merge maximizes."""
    words = word_freqs(df, text_col)
    w0 = words.select(F.expr(_INIT_SPARK).alias("w"), "freq")
    return _pair_counts(w0)


def _pair_counts(words: DataFrame) -> DataFrame:
    return (words
            .select("freq", F.expr("split(trim(w), ' ')").alias("_s"))
            .select("freq", F.explode(F.expr(_PAIRS_SPARK)).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("freq").cast("long").alias("cnt")))


def _merge_rounds(df: DataFrame, rounds: int, text_col: str):
    """Shared learn/apply loop: per round aggregate pair stats, argmax
    the pair, broadcast it, fold it into every word. Returns the merge
    table (round, pair, cnt) and the final (word, w, freq)
    symbolizations — both lazy plans over the same round chain.

    Lineage growth: each round references the previous round's words
    TWICE (the pair-count argmax and the merge fold) and best twice
    (step + the merge-table union), so the uncut plan re-executes
    2^rounds-ish copies of the upstream subtree. Interleaved A/B at
    sf0.1: per-round cuts win ~30% at rounds=4 (2.4 -> 1.4-1.9 s via
    the encode tail) but LOSE at rounds=2 (0.89-1.16 -> 1.15-1.31 s —
    the r12 finding: a 31-word symbolization table is cheaper to
    recompute than to materialize), so the cuts engage from rounds >= 3
    where the growth outruns the barrier cost."""
    cut = (lambda f: lineage_cut(f)) if rounds >= 3 else (lambda f: f)
    words = cut(word_freqs(df, text_col)
                .select("word", F.expr(_INIT_SPARK).alias("w"), "freq"))
    merges = None
    for r in range(1, rounds + 1):
        best = cut(_pair_counts(words)
                   .orderBy(F.desc("cnt"), F.asc("pair")).limit(1)
                   .select(F.lit(r).cast("int").alias("round"), "pair",
                           "cnt"))
        step = (best.select(F.expr("split_part(pair, ' ', 1)").alias("p1"),
                            F.expr("split_part(pair, ' ', 2)").alias("p2")))
        merges = best if merges is None else merges.unionByName(best)
        words = cut(words.crossJoin(F.broadcast(step))
                    .select("word",
                            F.expr("split(trim(w), ' ')").alias("_s"),
                            "freq", "p1", "p2")
                    .select("word", F.expr(_MERGE_SPARK).alias("w"),
                            "freq"))
    return merges, words


def bpe_learn(df: DataFrame, rounds: int = 3,
              text_col: str = "text") -> DataFrame:
    """Learn the first ``rounds`` BPE merges, fully in-plan. Returns the
    merge table (round, pair, cnt) — the tokenizer-training artifact."""
    merges, _ = _merge_rounds(df, rounds, text_col)
    return merges


def bpe_encode_counts(df: DataFrame, rounds: int = 3,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Apply the learned merges corpus-wide: per-document token counts
    under the trained BPE vocabulary — the number every budget/packing
    operator actually needs (whitespace counts over-estimate it).

    The fold work happens ONCE PER DISTINCT WORD (vocab-scale), then the
    per-word token counts join back onto the document word stream (AQE
    broadcasts the vocab side while it fits) and reduce per doc — the
    same skinny-frame re-join shape as SemDeDup's cell assignment.
    Documents with no tokens drop out (both engines agree).

    Returns (id, n_words, n_tokens)."""
    _, words = _merge_rounds(df, rounds, text_col)
    return _encode_tail(df, words, text_col, id_col)


def _encode_tail(df: DataFrame, words: DataFrame, text_col: str,
                 id_col: str) -> DataFrame:
    """Shared encode tail: per-word token counts from the final
    symbolizations, re-joined onto the document word stream."""
    vt = words.select("word", F.expr("size(split(trim(w), ' '))")
                      .cast("long").alias("n_tok"))
    stream = (df.select(F.col(id_col), F.explode(F.expr(
                  f"filter(split(lower(trim({text_col})), ' '),"
                  f" x -> x <> '')")).alias("word")))
    return (stream.join(vt, "word")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_words"),
                 F.sum("n_tok").cast("long").alias("n_tokens")))


def bpe_encode_from_merges(df: DataFrame, merges: DataFrame,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Encode a batch under a PERSISTED merge table — the production
    tokenizer lifecycle (train once, apply for months): ``bpe_learn``
    writes (round, pair, cnt) to parquet; this reads it back and
    applies the merges in round order WITHOUT re-deriving them, the
    ``lm.stupid_backoff_scores(counts=...)`` /
    ``dsir.dsir_weights(model=...)`` pattern for the tokenizer family.

    Only the round ids are collected (merge-table-sized metadata, like
    the IVF centroid count); each round's (p1, p2) stays a DataFrame —
    a 1-row broadcast read from the artifact — so the apply chain is
    plan-for-plan the same greedy fold as the inline encoder, minus
    every training aggregation. At a production 30k-merge vocabulary
    the same loop runs driver-side over the collected merge list (see
    the module docstring); the unrolled form here keeps the serving
    path oracle-certifiable end to end.

    Returns (id, n_words, n_tokens) — bit-identical to
    :func:`bpe_encode_counts` trained at the same ``rounds`` (encode
    parity is pinned by test and by the shared DuckDB oracle)."""
    rounds = sorted(r["round"] for r in
                    merges.select("round").distinct().collect())
    words = (word_freqs(df, text_col)
             .select("word", F.expr(_INIT_SPARK).alias("w"), "freq"))
    for r in rounds:
        step = (merges.filter(F.col("round") == r)
                .select(F.expr("split_part(pair, ' ', 1)").alias("p1"),
                        F.expr("split_part(pair, ' ', 2)").alias("p2")))
        words = (words.crossJoin(F.broadcast(step))
                 .select("word", F.expr("split(trim(w), ' ')").alias("_s"),
                         "freq", "p1", "p2")
                 .select("word", F.expr(_MERGE_SPARK).alias("w"), "freq"))
    return _encode_tail(df, words, text_col, id_col)


# --- DuckDB oracles ----------------------------------------------------------

def _word_freqs_sql(table: str, text_col: str) -> str:
    return f"""
    WITH wf AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT unnest(list_filter(
                     string_split(lower(trim({text_col})), ' '),
                     x -> x <> '')) AS word FROM {table})
      GROUP BY word
    ),
    w0 AS (SELECT word, {_INIT_DUCK} AS w, freq FROM wf)
    """


def _pair_counts_sql(src: str) -> str:
    """SELECT body: (pair, cnt) over symbolization CTE ``src``."""
    return f"""
      SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt
      FROM (SELECT freq, unnest({_PAIRS_DUCK}) AS pair
            FROM (SELECT freq, string_split(trim(w), ' ') AS _s
                  FROM {src}))
      GROUP BY pair"""


def bpe_pair_counts_sql(table: str, text_col: str = "text") -> str:
    return (_word_freqs_sql(table, text_col)
            + _pair_counts_sql("w0"))


def _rounds_sql(table: str, rounds: int, text_col: str) -> str:
    """WITH chain: wf/w0 plus per-round pair stats pc{r}, argmax b{r}
    and merged symbolizations w{r}."""
    parts = [_word_freqs_sql(table, text_col)]
    for r in range(1, rounds + 1):
        prev = f"w{r - 1}"
        parts.append(f""",
    pc{r} AS ({_pair_counts_sql(prev)}),
    b{r} AS (SELECT {r} AS round, pair, cnt,
                    split_part(pair, ' ', 1) AS p1,
                    split_part(pair, ' ', 2) AS p2
             FROM pc{r} ORDER BY cnt DESC, pair ASC LIMIT 1),
    w{r} AS (SELECT word, {_MERGE_DUCK} AS w, freq
             FROM (SELECT word, string_split(trim(w), ' ') AS _s, freq,
                          p1, p2
                   FROM {prev} CROSS JOIN b{r}))""")
    return "".join(parts)


def bpe_learn_sql(table: str, rounds: int = 3,
                  text_col: str = "text") -> str:
    union = "\n      UNION ALL ".join(
        f"SELECT CAST(round AS INT) AS round, pair, cnt FROM b{r}"
        for r in range(1, rounds + 1))
    return _rounds_sql(table, rounds, text_col) + f"\n    {union}"


def bpe_encode_counts_sql(table: str, rounds: int = 3,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> str:
    tok = (f"list_filter(string_split(lower(trim({text_col})), ' '),"
           f" x -> x <> '')")
    return _rounds_sql(table, rounds, text_col) + f""",
    vt AS (SELECT word,
                  CAST(len(string_split(trim(w), ' ')) AS BIGINT) AS n_tok
           FROM w{rounds}),
    stream AS (SELECT {id_col}, unnest({tok}) AS word FROM {table})
    SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM stream JOIN vt USING (word)
    GROUP BY {id_col}"""


def tokenizer_fertility(df: DataFrame, rounds: int = 3,
                        text_col: str = "text", id_col: str = "doc_id",
                        lang_col: str = "lang") -> DataFrame:
    """Per-language tokenizer fertility: BPE tokens per whitespace word.

    THE standard multilingual-tokenizer diagnostic (e.g. the XLM-R and
    NLLB tokenizer analyses): a language whose fertility is far above
    the corpus norm is under-served by the learned vocabulary — its
    documents cost proportionally more sequence length per word, which
    skews token budgets, packing efficiency and effective epoch counts
    for that language. Run after ``bpe_learn``/before committing a
    vocab.

    Rides :func:`bpe_encode_counts` (fold once per DISTINCT word, then
    the vocab-scale token-count table joins back onto the doc stream),
    adds one language-cardinality aggregation; the ratio is
    floor-6dp-quantized (``round6u`` — ratios of counts can land on
    exact halfway points).
    """
    from ..functions.rounding import round6u

    enc = bpe_encode_counts(df, rounds, text_col, id_col)
    return (enc.join(df.select(id_col, lang_col), id_col)
            .groupBy(lang_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("n_words").cast("long").alias("n_words"),
                 F.sum("n_tokens").cast("long").alias("n_tokens"),
                 round6u(F.sum("n_tokens").cast("double")
                         / F.sum("n_words")).alias("fertility")))


def tokenizer_fertility_sql(table: str, rounds: int = 3,
                            text_col: str = "text",
                            id_col: str = "doc_id",
                            lang_col: str = "lang") -> str:
    from ..functions.rounding import round6u_sql

    ratio = "CAST(SUM(enc.n_tokens) AS DOUBLE) / SUM(enc.n_words)"
    return f"""
    WITH enc AS (SELECT * FROM (
      {bpe_encode_counts_sql(table, rounds, text_col, id_col)}
    ))
    SELECT d.{lang_col},
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(enc.n_words) AS BIGINT) AS n_words,
           CAST(SUM(enc.n_tokens) AS BIGINT) AS n_tokens,
           {round6u_sql(ratio)} AS fertility
    FROM enc JOIN {table} d USING ({id_col})
    GROUP BY d.{lang_col}
    """
