"""Unigram-LM tokenizer training (Kudo 2018, arXiv:1804.10959 — the
SentencePiece unigram model): seed-vocabulary extraction + fixed
plan-unrolled Viterbi hard-EM rounds, the complement of merge-based BPE
(``operators/bpe.py`` trains bottom-up; this trains top-down by
segmenting against a probabilistic piece inventory).

Algorithm (hard-EM = Viterbi-EM, the k=1 special case of Kudo §3.2's
EM; soft expected counts need forward-backward sums whose floats cannot
be made bit-reproducible across engines, while the Viterbi path is an
ARGMIN over exactly-compared quantized decimals — deterministic
everywhere):

1. seed: every substring of length 1..``max_piece`` of every distinct
   word, frequency-weighted by occurrence; the vocabulary keeps ALL
   single characters (segmentation coverage — SentencePiece's required-
   character constraint) plus the top ``v_multi`` multi-char pieces
   (cnt desc, piece asc — a total order);
2. E-step: segment each distinct word with the current piece surprisals
   via Viterbi DP over cut positions (an in-plan ``aggregate`` fold —
   best[i] = min over covering pieces of best[j] + s(piece), ties to
   the smallest start, then a cut-list backtrack fold);
3. M-step: piece counts = frequency-weighted counts along the best
   paths; multi-char pieces that fell off every path are dropped,
   single characters floor at count 1 (coverage again);
4. repeat for ``rounds`` fixed rounds; emit (piece, cnt, nll).

Scale shape (100 TB): everything after the one corpus-scale
``word_freqs`` aggregation runs on the DISTINCT-WORD table — the same
volume-invariance argument as BPE (the corpus grows, the vocabulary
doesn't). Per round: one vocab-scale join (edge grid × piece table),
one vocab-scale groupBy, per-row DP folds bounded by
O(word_len · max_piece), and a 1-row broadcast total. No windows over
anything corpus-sized; the only top-k (seed pruning) is an
ORDER BY + LIMIT → TakeOrderedAndProject.

Cross-engine exactness: surprisals are 6dp-floored immediately after
``ln`` (the ``lm.py`` discipline) and accumulated as DECIMAL(28,6)
re-cast each fold step (Spark's aggregate() is type-strict); path
choice compares those decimals exactly, so both engines pick identical
segmentations. DuckDB's ``list_reduce`` has no separate accumulator
type — iteration elements are encoded AS the accumulator type
(``list_prepend(init, …)``), and the backtrack deliberately uses a
plain integer cut-list accumulator: a STRUCT accumulator whose fields
are read in several ``struct_pack`` fields mis-binds in DuckDB 1.0
(observed: ``st.pos`` resolving to the element inside one field and
the accumulator inside another).

Reference parity note: the reference engine has no tokenizer operator —
training-data-pipeline mandate (SURVEY.md §6), alongside BPE/LM/DSIR.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from ..functions.barrier import lineage_cut

from .bpe import word_freqs, _word_freqs_sql

MAX_PIECE = 4
# Words longer than this never enter training or token accounting: the
# Viterbi DP is O(len·max_piece) per word with an O(len)-per-step array
# accumulator, so a single 50 KB junk token (base64 blob, minified JS)
# would dominate the whole job — and no natural-language word is this
# long (SentencePiece's trainer applies the same kind of cap). Excluded
# words also drop from encode counts: the encoder joins the vocab-scale
# per-word table INNER, so both engines exclude them identically.
MAX_WORD = 64

# 6dp-floored surprisal of a piece under (cnt, total) — non-negative
# (cnt <= total), so the shared half-up FLOOR contract applies. ONE text
# for both engines.
_SURPRISAL = ("CAST(FLOOR(-ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE))"
              " * 1000000 + 0.5) / 1000000 AS DECIMAL(28,6))")

# Viterbi DP over cut positions: best[k+1] = min-(score, start) over
# edges ending at k. es = array<struct<j:int, i:int, s:decimal(28,6)>>.
_DP_SPARK = """aggregate(sequence(1, length(word)),
  array(named_struct('s', CAST(0 AS DECIMAL(28,6)), 'bp', 0)),
  (acc, i) -> concat(acc, array(
    element_at(array_sort(transform(filter(es, e -> e.i = i),
      e -> named_struct(
        's', CAST(element_at(acc, e.j + 1).s + e.s AS DECIMAL(28,6)),
        'bp', e.j))), 1))))"""

# backtrack: walk bp from n, collecting ascending cut positions
_CUTS_SPARK = """aggregate(sequence(1, length(word)),
  array(CAST(length(word) AS INT)),
  (acc, k) -> CASE WHEN element_at(acc, 1) > 0
      THEN concat(array(element_at(best, element_at(acc, 1) + 1).bp), acc)
      ELSE acc END)"""

_PIECES_SPARK = """transform(sequence(1, size(cuts) - 1),
  k -> substring(word, element_at(cuts, k) + 1,
                 element_at(cuts, k + 1) - element_at(cuts, k)))"""


def _seed_candidates(wf: DataFrame, max_piece: int) -> DataFrame:
    """(piece, cnt): frequency-weighted substring occurrence counts."""
    grid = (f"flatten(transform(sequence(1, length(word)), j ->"
            f" transform(sequence(1, least({max_piece},"
            f" length(word) - j + 1)), l -> substring(word, j, l))))")
    return (wf.select("freq", F.explode(F.expr(grid)).alias("piece"))
            .groupBy("piece")
            .agg(F.sum("freq").cast("long").alias("cnt")))


def _prune(cand: DataFrame, v_multi: int) -> DataFrame:
    """All single chars + top-``v_multi`` multi-char pieces."""
    singles = cand.filter(F.length("piece") == 1)
    multis = (cand.filter(F.length("piece") >= 2)
              .orderBy(F.desc("cnt"), F.asc("piece")).limit(v_multi))
    return singles.unionByName(multis)


def _segment(wf: DataFrame, vocab: DataFrame,
             max_piece: int) -> DataFrame:
    """Viterbi-segment every distinct word against ``vocab`` (piece,
    cnt): returns (word, freq, cuts) — ascending cut positions of the
    min-surprisal path."""
    total = vocab.agg(F.sum("cnt").cast("long").alias("total"))
    scored = (vocab.crossJoin(F.broadcast(total))
              .select("piece", F.expr(_SURPRISAL).alias("s")))
    grid = (f"flatten(transform(sequence(1, length(word)), j ->"
            f" transform(sequence(1, least({max_piece},"
            f" length(word) - j + 1)), l -> named_struct("
            f"'j', j - 1, 'i', j + l - 1,"
            f" 'piece', substring(word, j, l)))))")
    edges = (wf.select("word", F.explode(F.expr(grid)).alias("e"))
             .select("word", "e.j", "e.i", "e.piece")
             .join(scored, "piece"))
    es = (edges.groupBy("word")
          .agg(F.collect_list(F.struct("j", "i", "s")).alias("es")))
    # bind best as a column with a Filter barrier between projections so
    # CollapseProject cannot re-inline the whole DP into each backtrack
    # reference (no CSE inside HOF lambdas)
    return (wf.join(es, "word")
            .select("word", "freq", "es", F.expr(_DP_SPARK).alias("best"))
            .filter(F.col("best").isNotNull())
            .select("word", "freq", F.expr(_CUTS_SPARK).alias("cuts")))


def _viterbi_counts(wf: DataFrame, vocab: DataFrame,
                    max_piece: int) -> DataFrame:
    """One hard-EM round: the path-piece counts (piece, cnt)."""
    return (_segment(wf, vocab, max_piece)
            .select("freq",
                    F.explode(F.expr(_PIECES_SPARK)).alias("piece"))
            .groupBy("piece")
            .agg(F.sum("freq").cast("long").alias("cnt")))


def unigram_lm_vocab(df: DataFrame, rounds: int = 2, v_multi: int = 200,
                     max_piece: int = MAX_PIECE,
                     text_col: str = "text") -> DataFrame:
    """Train the unigram-LM piece inventory: (piece, cnt, nll) after
    ``rounds`` Viterbi-EM rounds (counts from the final E-step paths;
    nll = 6dp surprisal under those counts, the serving artifact a
    segmenter consumes)."""
    wf = word_freqs(df, text_col).filter(
        F.length("word") <= MAX_WORD)
    # wf feeds the seed AND every EM round; localCheckpoint cuts the
    # corpus-scale lineage so each round reuses the materialized
    # distinct-word table (no cross-consumer CSE in Spark plans)
    wf = lineage_cut(wf, eager=True)
    vocab = _prune(_seed_candidates(wf, max_piece), v_multi)
    for _ in range(rounds):
        nc = _viterbi_counts(wf, vocab, max_piece)
        # nc is referenced twice below (singles join + multis filter)
        # and vocab twice inside _viterbi_counts (total agg + scored) +
        # once in singles: without per-round cuts each reference
        # re-evaluates the ENTIRE previous round's subtree, so the plan
        # (and the executed work) grows multiplicatively per EM round —
        # interleaved A/B at sf0.1: 3.0-4.8 s -> 1.44 s with both cuts,
        # identical rows (guide §3.3; the frames are vocab-scale, a few
        # hundred rows)
        nc = lineage_cut(nc)
        singles = (vocab.filter(F.length("piece") == 1)
                   .select("piece")
                   .join(nc, "piece", "left")
                   .select("piece",
                           F.greatest(F.coalesce(F.col("cnt"), F.lit(0)),
                                      F.lit(1)).cast("long").alias("cnt")))
        multis = nc.filter(F.length("piece") >= 2)
        vocab = lineage_cut(singles.unionByName(multis))
    total = vocab.agg(F.sum("cnt").cast("long").alias("total"))
    return (vocab.crossJoin(F.broadcast(total))
            .select("piece", "cnt",
                    F.expr(f"CAST({_SURPRISAL} AS DOUBLE)").alias("nll")))


def unigram_encode_counts(df: DataFrame, rounds: int = 2,
                          v_multi: int = 200,
                          max_piece: int = MAX_PIECE,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Segment the corpus under the trained unigram vocabulary: per-
    document piece counts, (id, n_words, n_pieces) — the budget/packing
    number under THIS tokenizer (the ``bpe_encode_counts`` twin).

    Same skinny-frame shape as the BPE encoder: the Viterbi work happens
    once per DISTINCT word (vocabulary-scale), the per-word piece count
    joins back onto the document word stream (AQE broadcasts the vocab
    side while it fits) and reduces per doc. Documents with no tokens
    drop out (both engines agree).
    """
    wf = lineage_cut(word_freqs(df, text_col)
                     .filter(F.length("word") <= MAX_WORD), eager=True)
    vocab = _prune(_seed_candidates(wf, max_piece), v_multi)
    for _ in range(rounds):
        nc = lineage_cut(_viterbi_counts(wf, vocab, max_piece))
        # same per-round cuts as unigram_lm_vocab (see the comment
        # there): nc and vocab are multiply-referenced vocab-scale
        # frames whose uncut lineage re-executes the whole prior round
        singles = (vocab.filter(F.length("piece") == 1)
                   .select("piece")
                   .join(nc, "piece", "left")
                   .select("piece",
                           F.greatest(F.coalesce(F.col("cnt"), F.lit(0)),
                                      F.lit(1)).cast("long").alias("cnt")))
        vocab = lineage_cut(
            singles.unionByName(nc.filter(F.length("piece") >= 2)))
    # final segmentation pass: pieces per distinct word under the
    # trained vocab, then the doc-stream re-join
    vt = (_segment(wf, vocab, max_piece)
          .select("word", (F.size("cuts") - 1).cast("long")
                  .alias("n_pieces")))
    stream = df.select(F.col(id_col), F.explode(F.expr(
        f"filter(split(lower(trim({text_col})), ' '),"
        f" x -> x <> '')")).alias("word"))
    return (stream.join(vt, "word")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_words"),
                 F.sum("n_pieces").cast("long").alias("n_pieces")))


def unigram_encode_from_vocab(df: DataFrame, vocab: DataFrame,
                              max_piece: int = MAX_PIECE,
                              text_col: str = "text",
                              id_col: str = "doc_id") -> DataFrame:
    """Segment a batch under a PERSISTED piece inventory — the
    production lifecycle (train once, apply for months):
    :func:`unigram_lm_vocab` writes (piece, cnt, nll) to parquet; this
    reads it back and runs ONE Viterbi segmentation pass against it,
    with zero training rounds — the ``dsir_weights(model=...)`` /
    ``bpe_encode_from_merges`` pattern for the unigram family.

    The artifact stays fully distributed: surprisals recompute from the
    persisted (piece, cnt) exactly as training did (one 1-row total
    broadcast), the edge grid joins on piece, and nothing is collected
    to the driver at all — serving is strictly cheaper than the inline
    encoder, which re-trains ``rounds`` EM rounds per batch.

    Returns (id, n_words, n_pieces) — bit-identical to
    :func:`unigram_encode_counts` trained with the same parameters
    (encode parity pinned by test and by the shared DuckDB oracle)."""
    wf = lineage_cut(word_freqs(df, text_col)
                     .filter(F.length("word") <= MAX_WORD), eager=True)
    vt = (_segment(wf, vocab.select("piece", "cnt"), max_piece)
          .select("word", (F.size("cuts") - 1).cast("long")
                  .alias("n_pieces")))
    stream = df.select(F.col(id_col), F.explode(F.expr(
        f"filter(split(lower(trim({text_col})), ' '),"
        f" x -> x <> '')")).alias("word"))
    return (stream.join(vt, "word")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_words"),
                 F.sum("n_pieces").cast("long").alias("n_pieces")))


def unigram_encode_counts_sql(table: str, rounds: int = 2,
                              v_multi: int = 200,
                              max_piece: int = MAX_PIECE,
                              text_col: str = "text",
                              id_col: str = "doc_id") -> str:
    """DuckDB oracle for :func:`unigram_encode_counts`: one more
    DP/backtrack round under the final vocab, then the doc-stream
    re-join."""
    body = unigram_lm_vocab_sql(table, rounds, v_multi, max_piece,
                                text_col)
    body = body[:body.rindex("\n    SELECT piece")]
    fin = rounds + 1
    final_round = _ROUND_DUCK.format(
        r=fin, prev=f"v{rounds}", surprisal=_SURPRISAL,
        edges=_edges_sql(max_piece), pieces=_PIECES_DUCK)
    # only the chain up to cuts{fin} is needed
    final_round = final_round[:final_round.rindex(f",\n    nc{fin} AS")]
    tok = (f"list_filter(string_split(lower(trim({text_col})), ' '),"
           f" x -> x <> '')")
    return body + final_round + f""",
    vt AS (SELECT word, CAST(len(cuts) - 1 AS BIGINT) AS n_pieces
           FROM cuts{fin}),
    stream AS (SELECT {id_col}, unnest({tok}) AS word FROM {table})
    SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(n_pieces) AS BIGINT) AS n_pieces
    FROM stream JOIN vt USING (word)
    GROUP BY {id_col}"""


def unigram_fertility(df: DataFrame, rounds: int = 2, v_multi: int = 200,
                      max_piece: int = MAX_PIECE, text_col: str = "text",
                      id_col: str = "doc_id",
                      lang_col: str = "lang") -> DataFrame:
    """Per-language fertility under the trained unigram vocabulary
    (pieces per whitespace word) — the same multilingual-tokenizer
    diagnostic as ``bpe.tokenizer_fertility``, for THIS tokenizer; the
    two side by side are the standard vocab-selection comparison."""
    from ..functions.rounding import round6u

    enc = unigram_encode_counts(df, rounds, v_multi, max_piece,
                                text_col, id_col)
    return (enc.join(df.select(id_col, lang_col), id_col)
            .groupBy(lang_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("n_words").cast("long").alias("n_words"),
                 F.sum("n_pieces").cast("long").alias("n_pieces"),
                 round6u(F.sum("n_pieces").cast("double")
                         / F.sum("n_words")).alias("fertility")))


def unigram_fertility_sql(table: str, rounds: int = 2, v_multi: int = 200,
                          max_piece: int = MAX_PIECE,
                          text_col: str = "text", id_col: str = "doc_id",
                          lang_col: str = "lang") -> str:
    from ..functions.rounding import round6u_sql

    ratio = "CAST(SUM(enc.n_pieces) AS DOUBLE) / SUM(enc.n_words)"
    return f"""
    WITH enc AS (SELECT * FROM (
      {unigram_encode_counts_sql(table, rounds, v_multi, max_piece,
                                 text_col, id_col)}
    ))
    SELECT d.{lang_col},
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(enc.n_words) AS BIGINT) AS n_words,
           CAST(SUM(enc.n_pieces) AS BIGINT) AS n_pieces,
           {round6u_sql(ratio)} AS fertility
    FROM enc JOIN {table} d USING ({id_col})
    GROUP BY d.{lang_col}
    """


# --- DuckDB oracle -----------------------------------------------------------
#
# The DP and the backtrack are RECURSIVE CTEs, not list_reduce folds:
# DuckDB 1.0's lambda binder mis-resolves an accumulator referenced more
# than once in a fold body (observed twice — a struct accumulator's
# field reading as the element in one struct_pack field and the
# accumulator in another, and a cut-list fold emitting a phantom
# duplicate cut for 2 of ~1800 words at a chunk boundary). In a
# recursive CTE the carried state is a plain COLUMN, which binds
# reliably; lambdas below only ever reference their own parameter.

_PIECES_DUCK = """list_transform(generate_series(1, len(cuts) - 1),
  k -> substring(word, CAST(cuts[k] + 1 AS INTEGER),
                 CAST(cuts[k + 1] - cuts[k] AS INTEGER)))"""

# one DP/backtrack round: es{r} holds (word, n, es); dp{r} grows `best`
# by one position per recursion level, bt{r} walks the backpointers down
_ROUND_DUCK = """,
    sc{r} AS (SELECT piece, {surprisal} AS s
              FROM {prev}, (SELECT CAST(SUM(cnt) AS BIGINT) AS total
                            FROM {prev})),
    es{r} AS (
      SELECT word, CAST(len(word) AS BIGINT) AS n,
             list(struct_pack(j := CAST(j AS INTEGER),
                              i := CAST(i AS INTEGER), s := s)) AS es
      FROM ({edges}) eg JOIN sc{r} s USING (piece)
      GROUP BY word
    ),
    dp{r} AS (
      SELECT word, n, es, CAST(0 AS BIGINT) AS i,
             [struct_pack(s := CAST(0 AS DECIMAL(28,6)),
                          bp := CAST(0 AS INTEGER))] AS best
      FROM es{r}
      UNION ALL
      SELECT word, n, es, i + 1,
             list_concat(best, [list_sort(list_transform(
                 list_filter(es, e -> e.i = i + 1),
                 e -> struct_pack(
                   s := CAST(best[e.j + 1].s + e.s AS DECIMAL(28,6)),
                   bp := e.j)))[1]])
      FROM dp{r} WHERE i < n
    ),
    best{r} AS (SELECT word, n, best FROM dp{r} WHERE i = n),
    bt{r} AS (
      SELECT word, n, best, n AS pos FROM best{r}
      UNION ALL
      SELECT word, n, best, CAST(best[pos + 1].bp AS BIGINT) AS pos
      FROM bt{r} WHERE pos > 0
    ),
    cuts{r} AS (SELECT word, list_sort(list(pos)) AS cuts
                FROM bt{r} GROUP BY word),
    nc{r} AS (
      SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt
      FROM (SELECT w.freq, unnest({pieces}) AS piece
            FROM cuts{r} c JOIN wfu w USING (word))
      GROUP BY piece
    ),
    v{r} AS (
      SELECT v.piece, greatest(COALESCE(n.cnt, 0), 1) AS cnt
      FROM (SELECT piece FROM {prev} WHERE len(piece) = 1) v
      LEFT JOIN nc{r} n USING (piece)
      UNION ALL
      SELECT piece, cnt FROM nc{r} WHERE len(piece) >= 2
    )"""


def _edges_sql(max_piece: int) -> str:
    """Relational edge grid over wf (LATERAL position pairs — no nested
    lambdas, same binder-reliability reasoning as above)."""
    return f"""
      SELECT w.word, jj.j, ii.i,
             substring(w.word, CAST(jj.j + 1 AS INTEGER),
                       CAST(ii.i - jj.j AS INTEGER)) AS piece
      FROM wfu w,
           LATERAL (SELECT unnest(generate_series(0, len(w.word) - 1))
                    AS j) jj,
           LATERAL (SELECT unnest(generate_series(jj.j + 1,
                      least(jj.j + {max_piece}, len(w.word)))) AS i) ii"""


def unigram_lm_vocab_sql(table: str, rounds: int = 2, v_multi: int = 200,
                         max_piece: int = MAX_PIECE,
                         text_col: str = "text") -> str:
    """DuckDB oracle: the identical seed → Viterbi-EM chain unrolled as
    (recursive) CTEs, sharing the surprisal snippet; the cut list turns
    into pieces with a single self-contained lambda."""
    wf_cte = _word_freqs_sql(table, text_col).replace(
        "WITH wf AS", "WITH RECURSIVE wf AS", 1)
    parts = [wf_cte, f""",
    wfu AS (SELECT * FROM wf WHERE len(word) <= {MAX_WORD}),
    cand AS (
      SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt
      FROM (SELECT w.freq,
                   substring(w.word, CAST(jj.j + 1 AS INTEGER),
                             CAST(ii.i - jj.j AS INTEGER)) AS piece
            FROM wfu w,
                 LATERAL (SELECT unnest(generate_series(0, len(w.word) - 1))
                          AS j) jj,
                 LATERAL (SELECT unnest(generate_series(jj.j + 1,
                            least(jj.j + {max_piece}, len(w.word)))) AS i)
                   ii)
      GROUP BY piece
    ),
    v0 AS (
      SELECT piece, cnt FROM cand WHERE len(piece) = 1
      UNION ALL
      SELECT piece, cnt FROM (
        SELECT piece, cnt FROM cand WHERE len(piece) >= 2
        ORDER BY cnt DESC, piece ASC LIMIT {v_multi})
    )"""]
    for r in range(1, rounds + 1):
        parts.append(_ROUND_DUCK.format(
            r=r, prev=f"v{r - 1}", surprisal=_SURPRISAL,
            edges=_edges_sql(max_piece), pieces=_PIECES_DUCK))
    parts.append(f"""
    SELECT piece, CAST(cnt AS BIGINT) AS cnt,
           CAST({_SURPRISAL} AS DOUBLE) AS nll
    FROM v{rounds}, (SELECT CAST(SUM(cnt) AS BIGINT) AS total
                     FROM v{rounds})""")
    return "".join(parts)
