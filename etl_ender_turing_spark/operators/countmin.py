"""Count-min sketch (Cormode & Muthukrishnan 2005) — fixed-memory
frequency estimation, the mergeable counterpart of the HLL/t-digest row
in the sketch family.

Why it exists at 100 TB: exact per-token counts need vocabulary-scale
state per aggregation; a CMS is D×W integers REGARDLESS of corpus or
vocabulary size, merges by cell-wise addition (so per-shard sketches
fold in one reduce — streaming- and backfill-friendly), and never
undercounts: estimate(t) = min over rows of cell[r, slot(r, t)] ≥
true(t), with the overcount bounded by collisions.

Engine shape: token frequencies aggregate once at DISTINCT-vocabulary
scale (the repo's replication-flat discipline), then melt into D
(row, slot, weight) triples and fold — the sketch build is one
partial+final aggregate with at most D×W groups; estimating a bounded
query set joins it against the D×W-cell table. Slots come from the
cross-engine md5 idiom, so the DuckDB oracle builds the IDENTICAL cells
and the certification is value-exact (estimates and overcounts match
bit-for-bit, not just within a bound — unlike the builtin HLL row,
whose values are engine-private).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

CMS_D = 3       # hash rows
CMS_W = 1024    # slots per row

_TOKS_SPARK = "filter(split(lower({text}), ' '), t -> t <> '')"
_TOKS_DUCK = "list_filter(string_split(lower({text}), ' '), t -> t <> '')"


def _slot_spark(row: str, token: str) -> str:
    return (f"(CAST(conv(substring(md5(concat(CAST({row} AS STRING), ':',"
            f" {token})), 1, 8), 16, 10) AS BIGINT) % {CMS_W})")


def _slot_duck(row: str, token: str) -> str:
    return (f"(CAST(('0x' || substr(md5(CAST({row} AS VARCHAR) || ':' ||"
            f" {token}), 1, 8))::UBIGINT AS BIGINT) % {CMS_W})")


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(token, cnt): exact corpus token frequencies — one
    vocabulary-scale aggregate, the shared front of build and truth."""
    return (docs.select(F.explode(F.expr(
        _TOKS_SPARK.format(text=text_col))).alias("token"))
        .groupBy("token").agg(F.count(F.lit(1)).alias("cnt")))


def cms_build(freqs: DataFrame, d: int = CMS_D) -> DataFrame:
    """(row, slot, cell): the D×W sketch from (token, cnt) frequencies.
    Melt each distinct token into its D slots carrying its count as
    weight, fold with one ≤D·W-group aggregate. Cell-wise addition of
    two sketches built this way equals the sketch of the union — the
    mergeability the unit test pins."""
    slot = _slot_spark("r", "token")
    melted = freqs.select("cnt", F.expr(
        f"explode(transform(sequence(0, {d - 1}),"
        f" r -> struct(r AS row, {slot} AS slot)))").alias("b")) \
        .select("cnt", "b.row", "b.slot")
    return (melted.groupBy("row", "slot")
            .agg(F.sum("cnt").alias("cell")))


def cms_heavy_hitters(docs: DataFrame, k: int = 20,
                      text_col: str = "text", d: int = CMS_D) -> DataFrame:
    """(token, exact_cnt, cms_est, overcount): the exact top-k tokens
    (count desc, token asc — a deterministic total order) scored
    against the sketch. cms_est ≥ exact_cnt always; overcount is the
    collision mass. The probe joins k·D slot keys against the ≤D·W-cell
    sketch — both sides tiny, the corpus is touched exactly once."""
    freqs = token_counts(docs, text_col)
    sketch = cms_build(freqs, d)
    top = freqs.orderBy(F.col("cnt").desc(), F.col("token")).limit(k)
    slot = _slot_spark("r", "token")
    probes = top.select(
        "token", F.col("cnt").alias("exact_cnt"), F.expr(
            f"explode(transform(sequence(0, {d - 1}),"
            f" r -> struct(r AS row, {slot} AS slot)))").alias("b")) \
        .select("token", "exact_cnt", "b.row", "b.slot")
    est = (probes.join(F.broadcast(sketch), ["row", "slot"])
           .groupBy("token", "exact_cnt")
           .agg(F.min("cell").alias("cms_est")))
    return est.select(
        "token", "exact_cnt", "cms_est",
        (F.col("cms_est") - F.col("exact_cnt")).alias("overcount"))


def cms_heavy_hitters_sql(table: str = "documents", k: int = 20,
                          text_col: str = "text", d: int = CMS_D) -> str:
    """DuckDB oracle for :func:`cms_heavy_hitters` — identical cells,
    identical estimates, value-exact."""
    toks = _TOKS_DUCK.format(text=text_col)
    slot = _slot_duck("g.r", "f.token")
    slot_p = _slot_duck("g.r", "t.token")
    return f"""
    WITH freqs AS (
      SELECT token, COUNT(*) AS cnt
      FROM (SELECT unnest({toks}) AS token FROM {table})
      GROUP BY token
    ),
    cells AS (
      SELECT g.r AS row, {slot} AS slot, SUM(f.cnt) AS cell
      FROM freqs f,
           (SELECT unnest(generate_series(0, {d - 1})) AS r) g
      GROUP BY 1, 2
    ),
    top AS (
      SELECT token, cnt AS exact_cnt FROM freqs
      ORDER BY cnt DESC, token ASC LIMIT {k}
    ),
    est AS (
      SELECT t.token, t.exact_cnt, MIN(c.cell) AS cms_est
      FROM top t,
           (SELECT unnest(generate_series(0, {d - 1})) AS r) g
      JOIN cells c ON c.row = g.r AND c.slot = {slot_p}
      GROUP BY 1, 2
    )
    SELECT token, CAST(exact_cnt AS BIGINT) AS exact_cnt,
           CAST(cms_est AS BIGINT) AS cms_est,
           CAST(cms_est - exact_cnt AS BIGINT) AS overcount
    FROM est
    """


__all__ = ["token_counts", "cms_build", "cms_heavy_hitters",
           "cms_heavy_hitters_sql", "CMS_D", "CMS_W"]


def cms_cells_sql(table: str = "documents", text_col: str = "text",
                  d: int = CMS_D) -> str:
    """DuckDB spelling of the sketch cells alone — the oracle for the
    streaming fold (which must equal the batch build cell-for-cell)."""
    toks = _TOKS_DUCK.format(text=text_col)
    slot = _slot_duck("g.r", "f.token")
    return f"""
    SELECT g.r AS row, {slot} AS slot, CAST(SUM(f.cnt) AS BIGINT) AS cell
    FROM (SELECT token, COUNT(*) AS cnt
          FROM (SELECT unnest({toks}) AS token FROM {table})
          GROUP BY token) f,
         (SELECT unnest(generate_series(0, {d - 1})) AS r) g
    GROUP BY 1, 2
    """
