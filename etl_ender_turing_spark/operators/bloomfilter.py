"""Bloom-filter scan pruning — the runtime row filter that makes a
selective join cheap at 100 TB.

The classic shape (Spark's own runtime-filter work, Bloom 1970): a
selective dimension predicate survives only a few thousand keys; the
fact side is petabytes. Rather than shuffling the fact table into a
join, build a tiny bit set over the surviving dim keys ONCE and prune
fact rows with a pure expression at the scan — zero shuffle, zero join,
whole-stage-codegen'd — then let the (now small) exact join finish the
job. False positives only cost a wasted row in the exact stage; false
negatives cannot happen.

Engine shape here:
- **Build**: one partial+final aggregate over the dim keys (k hash bits
  per key, ``bit_or`` into 128 64-bit-safe words of 32 bits each — 32,
  not 64, because DuckDB's ``<<`` overflow-checks BIGINT at bit 63 and
  the oracle must fold the identical masks). The result is 128 longs —
  driver-metadata-sized by the repo's collect discipline, embedded into
  the plan as an array literal exactly like the IVF centroids and the
  JL sign matrix.
- **Probe**: ``bloom_member`` is a plain boolean Column — k md5 bits,
  ``element_at`` into the literal word array, bitwise AND — that rides
  the fact scan's WholeStageCodegen span. No Python, no shuffle, no
  join; at production scale this is the filter you attach before the
  exchange so the shuffle carries candidates, not the corpus.

Hashes are the repo's cross-engine md5 idiom (``hash_unit`` shape), so
the DuckDB oracle rebuilds the identical words relationally and scores
the identical pass set — the certification is value-exact, not
statistical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

N_BITS = 4096        # 128 words x 32 bits
N_HASHES = 3
_WORDS = N_BITS // 32


def bloom_bit(key_col: str, i) -> Column:
    """Bit index of hash ``i`` for a key: first 8 hex chars of
    md5('<i>:<key>') mod N_BITS. ``i`` may be a Python int or a Column
    expression."""
    salt = (F.lit(f"{i}:") if isinstance(i, int)
            else F.concat(i.cast("string"), F.lit(":")))
    return (F.conv(F.substring(
        F.md5(F.concat(salt, F.col(key_col).cast("string"))), 1, 8),
        16, 10).cast("long") % N_BITS)


def bloom_bit_sql(key: str, i: str) -> str:
    return (f"(CAST(('0x' || substr(md5(CAST({i} AS VARCHAR) || ':' ||"
            f" CAST({key} AS VARCHAR)), 1, 8))::UBIGINT AS BIGINT)"
            f" % {N_BITS})")


def build_bloom(df: DataFrame, key_col: str,
                n_hashes: int = N_HASHES) -> list[int]:
    """Aggregate the dim side's keys into the 128 filter words and
    collect them (driver-metadata-sized: 128 longs, like the k·d
    centroid pulls). One uniform shuffle of at most 128 groups."""
    bits = df.select(F.explode(F.array(
        *[bloom_bit(key_col, i) for i in range(n_hashes)])).alias("bit"))
    words = (bits
             .select(F.expr("bit div 32").alias("slot"),
                     F.expr("shiftleft(CAST(1 AS BIGINT),"
                            " CAST(bit % 32 AS INT))").alias("mask"))
             .groupBy("slot").agg(F.expr("bit_or(mask)").alias("w")))
    got = {r["slot"]: r["w"] for r in words.collect()}
    return [got.get(s, 0) for s in range(_WORDS)]


def _bit_spark_sql(key: str, i: int) -> str:
    """Spark-SQL spelling of :func:`bloom_bit` (conv-based md5 idiom)."""
    return (f"(CAST(conv(substring(md5(concat('{i}:',"
            f" CAST({key} AS STRING))), 1, 8), 16, 10) AS BIGINT)"
            f" % {N_BITS})")


def bloom_member(key_col: str, words: list[int],
                 n_hashes: int = N_HASHES) -> Column:
    """Membership test as a pure JVM expression over the literal word
    array — attach directly to the fact scan's filter. Each hash binds
    its bit once via a single-element ``exists`` lambda (there is no
    CSE inside a hand-written expression tree — without the binding the
    md5 would run twice per hash: once for the word index, once for the
    mask). The word array is a literal, constant-folded at plan time
    like the JL sign matrix."""
    if len(words) != _WORDS:
        raise ValueError(f"expected {_WORDS} filter words")
    arr = "array(" + ",".join(f"{int(w)}L" for w in words) + ")"
    conds = [
        f"exists(array({_bit_spark_sql(key_col, i)}), b ->"
        f" (element_at({arr}, CAST(b div 32 AS INT) + 1)"
        f" & shiftleft(CAST(1 AS BIGINT), CAST(b % 32 AS INT))) != 0)"
        for i in range(n_hashes)]
    return F.expr("(" + ") AND (".join(conds) + ")")


def bloom_words_sql(dim_cte: str, key: str,
                    n_hashes: int = N_HASHES) -> str:
    """DuckDB CTE body: the 128 filter words over ``dim_cte``'s keys —
    the same md5 bits, folded with bit_or, zero-filled."""
    return f"""
    SELECT g.s AS slot, COALESCE(b.w, CAST(0 AS BIGINT)) AS w
    FROM (SELECT unnest(generate_series(0, {_WORDS - 1})) AS s) g
    LEFT JOIN (
      SELECT bit // 32 AS slot,
             bit_or(CAST(1 AS BIGINT) << CAST(bit % 32 AS INT)) AS w
      FROM (SELECT {bloom_bit_sql(key, 'gi.i')} AS bit
            FROM ({dim_cte}) d,
                 (SELECT unnest(generate_series(0, {n_hashes - 1})) AS i)
                 gi)
      GROUP BY 1
    ) b ON b.slot = g.s
    """


__all__ = ["bloom_bit", "bloom_bit_sql", "build_bloom", "bloom_member",
           "bloom_words_df", "words_from_store", "bloom_words_sql",
           "N_BITS", "N_HASHES"]


def bloom_words_df(df: DataFrame, key_col: str,
                   n_hashes: int = N_HASHES) -> DataFrame:
    """(slot, w): the filter words as a persistable frame — the
    runtime-filter ARTIFACT. A nightly job builds it once from the dim
    predicate; every later fact batch prunes from the artifact without
    re-scanning the dimension."""
    bits = df.select(F.explode(F.array(
        *[bloom_bit(key_col, i) for i in range(n_hashes)])).alias("bit"))
    return (bits
            .select(F.expr("bit div 32").alias("slot"),
                    F.expr("shiftleft(CAST(1 AS BIGINT),"
                           " CAST(bit % 32 AS INT))").alias("mask"))
            .groupBy("slot").agg(F.expr("bit_or(mask)").alias("w")))


def words_from_store(store: DataFrame) -> list[int]:
    """Collect a persisted (slot, w) artifact back into the 128-word
    list ``bloom_member`` consumes (zero-filling unset slots) — a
    128-row driver pull, like the centroid reads."""
    got = {r["slot"]: r["w"] for r in store.collect()}
    return [got.get(s, 0) for s in range(_WORDS)]
