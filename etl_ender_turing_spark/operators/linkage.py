"""Fuzzy entity resolution / record linkage: blocking → pairwise verify
→ cluster → golden record (survivorship).

The reference's warehouse loads key every dimension row by an exact
upsert key (`ET-ETL-DWH-PY312/ETL/Load.py` merges on id equality); real
master-data feeds arrive WITHOUT a shared key — the same customer lands
from two systems with a typo'd name — and the engine must link them
before any exact-key upsert is possible. This module is that missing
front half, built as the classic four-stage linkage pipeline
(Fellegi–Sunter shape; candidate generation follows the segment-
pigeonhole idea of PassJoin, Li/Deng/Feng VLDB 2011):

1. **Blocking** — never all-pairs. Each record emits one key per
   *position class* of its name's digit zone (interleaved segments:
   class ``s`` holds the characters at zone offsets ``s, s+3, s+6``).
   A pair whose names differ by ≤2 substitutions corrupts at most two
   of the three classes, so at least one segment key still matches —
   exact recall for substitution edits by pigeonhole (the same
   discipline as the SimHash band walk in :mod:`.dedup`); indel edits
   shift positions and are NOT covered by the guarantee (documented,
   like the banded families' hamming bound).
2. **Verify** — full ``levenshtein`` (JVM builtin, in-bucket lambda;
   DuckDB evaluates its own independent implementation) plus a
   multi-attribute rule: equal ``nationkey`` is part of the block key
   and account balances must agree within ``bal_window`` — name
   similarity alone is meaningless on sequential surrogate-ish names.
3. **Cluster** — match pairs feed the shared pointer-jumping
   min-label resolver (:func:`..operators.dedup.duplicate_clusters`).
4. **Survivorship** — one golden record per entity: canonical fields
   picked by deterministic rules (min-id name, max balance) with
   member/origin counts for audit.

Scale shape: blocking is one uniform shuffle on (nationkey, class,
segment) — 3 keys/record; in-bucket expansion carries the same
``max_block`` star-fallback cap as ``banded_hamming_pairs`` so one
degenerate block cannot go quadratic; verification is per-candidate
scalar work; clustering is O(log diameter) rounds. Nothing touches
all-pairs at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Customer names are 'Customer#%09d' — 18 chars, digit zone at
# 1-indexed positions 10..18. The zone constants are the fixture's,
# not the algorithm's: er_candidate_pairs takes them as arguments.
ZONE_START = 10
ZONE_LEN = 9
N_CLASSES = 3
MAX_EDITS = 2
BAL_WINDOW = 150.0
MAX_BLOCK = 2000

# Variant id offsets follow the repo's 10M replication-span convention.
_OFF_A = 10_000_000   # one substitution        → must link (lev 1)
_OFF_B = 20_000_000   # two substitutions       → must link (lev 2)
_OFF_C = 30_000_000   # three substitutions     → candidate, verify REJECTS
_OFF_D = 40_000_000   # one substitution, far balance → bal rule REJECTS


def _subst(name: str, pos: str, ch: str) -> str:
    """SQL snippet: replace the single character at 1-indexed ``pos``
    (length-preserving). Identical text runs on Spark and DuckDB."""
    return (f"(substr({name}, 1, ({pos}) - 1) || '{ch}' || "
            f"substr({name}, ({pos}) + 1))")


def _pos(key: str, shift: int) -> str:
    return f"({ZONE_START} + (({key} + {shift}) % {ZONE_LEN}))"


# Shared variant-name expressions (the SAME strings compile on both
# engines). Letters are distinct per tier so no two variants of
# different customers can collide into an accidental exact equality.
def _v1_name(key: str = "c_custkey", name: str = "c_name") -> str:
    return _subst(name, _pos(key, 0), "X")


def _v2_name(key: str = "c_custkey", name: str = "c_name") -> str:
    return _subst(_subst(name, _pos(key, 0), "Q"), _pos(key, 4), "Z")


def _v3_name(key: str = "c_custkey", name: str = "c_name") -> str:
    inner = _subst(name, _pos(key, 0), "W")
    inner = _subst(inner, _pos(key, 3), "W")
    return _subst(inner, _pos(key, 6), "W")


def _v4_name(key: str = "c_custkey", name: str = "c_name") -> str:
    return _subst(name, _pos(key, 0), "Y")


def dirty_customers(cust: DataFrame) -> DataFrame:
    """(rec_id, name, nationkey, bal, origin): the customer dimension
    plus three deterministic 'import feeds' — every 5th customer
    re-arrives with a one-letter name typo (same balance book +100.00),
    every 10th ALSO with a two-letter typo, and two planted negatives:
    a three-edit corruption (beyond ``MAX_EDITS``; all three edits land
    in ONE position class, so blocking still surfaces it and the
    levenshtein verify is what rejects it) and a one-edit twin whose
    balance moved 5000.00 (the balance rule is what rejects it)."""
    def base():
        return cust.select(
            F.col("c_custkey").alias("rec_id"),
            F.col("c_name").alias("name"),
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_acctbal").alias("bal"),
            F.lit("base").alias("origin"))

    def variant(mod: int, rem: int, off: int, name_expr: str,
                bal_shift: float, origin: str) -> DataFrame:
        return (cust.filter((F.col("c_custkey") % mod) == rem)
                .select((F.col("c_custkey") + off).alias("rec_id"),
                        F.expr(name_expr).alias("name"),
                        F.col("c_nationkey").alias("nationkey"),
                        (F.col("c_acctbal") + bal_shift).alias("bal"),
                        F.lit(origin).alias("origin")))

    return (base()
            .unionByName(variant(5, 0, _OFF_A, _v1_name(), 100.0, "import_a"))
            .unionByName(variant(10, 0, _OFF_B, _v2_name(), 100.0, "import_b"))
            .unionByName(variant(10, 7, _OFF_C, _v3_name(), 100.0, "import_c"))
            .unionByName(variant(10, 4, _OFF_D, _v4_name(), 5000.0, "import_d")))


def dirty_customers_sql(table: str = "customer") -> str:
    """DuckDB spelling of :func:`dirty_customers` — the same variant
    name expressions verbatim."""
    def variant(mod: int, rem: int, off: int, name_expr: str,
                bal_shift: float, origin: str) -> str:
        return (f"SELECT c_custkey + {off} AS rec_id, {name_expr} AS name,"
                f" c_nationkey AS nationkey, c_acctbal + {bal_shift} AS bal,"
                f" '{origin}' AS origin FROM {table}"
                f" WHERE c_custkey % {mod} = {rem}")
    return (f"SELECT c_custkey AS rec_id, c_name AS name,"
            f" c_nationkey AS nationkey, c_acctbal AS bal,"
            f" 'base' AS origin FROM {table}"
            f" UNION ALL {variant(5, 0, _OFF_A, _v1_name(), 100.0, 'import_a')}"
            f" UNION ALL {variant(10, 0, _OFF_B, _v2_name(), 100.0, 'import_b')}"
            f" UNION ALL {variant(10, 7, _OFF_C, _v3_name(), 100.0, 'import_c')}"
            f" UNION ALL {variant(10, 4, _OFF_D, _v4_name(), 5000.0, 'import_d')}")


def _segval(name: str, s: str) -> str:
    """SQL snippet: the 3-char interleaved segment ``s`` (0..2) of the
    digit zone — characters at 1-indexed positions ZONE_START+s,
    ZONE_START+3+s, ZONE_START+6+s. Identical on both engines."""
    return (f"(substr({name}, {ZONE_START} + {s}, 1)"
            f" || substr({name}, {ZONE_START + 3} + {s}, 1)"
            f" || substr({name}, {ZONE_START + 6} + {s}, 1))")


def er_candidate_pairs(recs: DataFrame, max_edits: int = MAX_EDITS,
                       bal_window: float = BAL_WINDOW,
                       max_block: int = MAX_BLOCK) -> DataFrame:
    """(rec_a, rec_b, lev): verified match pairs, ``rec_a < rec_b``.

    Melt each record into its three (class, segment) block keys, bucket
    by (nationkey, class, segment), expand in-bucket pairs with the
    ordered-``collect_set`` lambda shape of ``banded_hamming_pairs``
    (blocks over ``max_block`` fall back to star pairs against the
    min-id member — connectivity preserved, quadratic cost refused),
    verify with full levenshtein + the balance window, distinct."""
    melted = recs.select(
        "rec_id", "name", "nationkey", "bal",
        F.expr(f"explode(transform(sequence(0, {N_CLASSES - 1}),"
               f" s -> struct(s AS seg, {_segval('name', 's')} AS segval)))"
               ).alias("b")) \
        .select("rec_id", "name", "nationkey", "bal", "b.seg", "b.segval")
    buckets = (melted.groupBy("nationkey", "seg", "segval")
               .agg(F.sort_array(F.collect_set(F.struct(
                   F.col("rec_id").alias("id"),
                   F.col("name").alias("nm"),
                   F.col("bal").alias("bl")))).alias("xs"))
               .filter(F.size("xs") >= 2))
    pairs = F.expr(f"""
        CASE WHEN size(xs) <= {max_block}
        THEN flatten(transform(xs, (a, i) ->
               transform(slice(xs, i + 2, size(xs)), b ->
                 struct(a.id AS rec_a, b.id AS rec_b,
                        CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS lev,
                        abs(a.bl - b.bl) AS bdiff))))
        ELSE transform(slice(xs, 2, size(xs)), b ->
               struct(xs[0].id AS rec_a, b.id AS rec_b,
                      CAST(levenshtein(xs[0].nm, b.nm) AS BIGINT) AS lev,
                      abs(xs[0].bl - b.bl) AS bdiff))
        END""")
    return (buckets.select(F.explode(pairs).alias("p"))
            .select("p.rec_a", "p.rec_b", "p.lev", "p.bdiff")
            .filter((F.col("lev") <= max_edits)
                    & (F.col("bdiff") <= bal_window))
            .drop("bdiff")
            .distinct())


def er_pairs_sql(table: str = "customer", max_edits: int = MAX_EDITS,
                 bal_window: float = BAL_WINDOW) -> str:
    """DuckDB oracle for :func:`er_candidate_pairs` over
    :func:`dirty_customers`: the same segment keys via generate_series,
    a block-key self-join, DuckDB's own levenshtein, DISTINCT."""
    return f"""
    SELECT DISTINCT a.rec_id AS rec_a, b.rec_id AS rec_b,
           CAST(levenshtein(a.name, b.name) AS BIGINT) AS lev
    FROM (
      SELECT d.*, g.s AS seg, {_segval('d.name', 'g.s')} AS segval
      FROM ({dirty_customers_sql(table)}) d,
           (SELECT unnest(generate_series(0, {N_CLASSES - 1})) AS s) g
    ) a JOIN (
      SELECT d.*, g.s AS seg, {_segval('d.name', 'g.s')} AS segval
      FROM ({dirty_customers_sql(table)}) d,
           (SELECT unnest(generate_series(0, {N_CLASSES - 1})) AS s) g
    ) b ON a.nationkey = b.nationkey AND a.seg = b.seg
       AND a.segval = b.segval AND a.rec_id < b.rec_id
    WHERE levenshtein(a.name, b.name) <= {max_edits}
      AND abs(a.bal - b.bal) <= {bal_window}
    """


def golden_records(recs: DataFrame, labels: DataFrame) -> DataFrame:
    """(entity_id, canonical_name, best_bal, n_members, n_origins):
    survivorship over resolved entities. Unmatched records are their
    own singleton entity (left join + coalesce); canonical name is the
    min-rec_id member's (deterministic arg-min), balance survives as
    the max across feeds."""
    lab = labels.select(F.col("doc_id").alias("rec_id"), "cluster_id")
    return (recs.join(lab, "rec_id", "left")
            .withColumn("entity_id", F.coalesce("cluster_id", "rec_id"))
            .groupBy("entity_id")
            .agg(F.expr("min_by(name, rec_id)").alias("canonical_name"),
                 F.max("bal").alias("best_bal"),
                 F.count(F.lit(1)).alias("n_members"),
                 F.countDistinct("origin").alias("n_origins")))


def golden_records_sql(table: str = "customer") -> str:
    """DuckDB oracle for the full linkage pipeline ending in
    :func:`golden_records` — pairs → recursive-CTE closure → grouped
    survivorship with ``min_by``."""
    from .dedup import duplicate_clusters_sql
    pairs_cte = (f"SELECT rec_a AS doc_a, rec_b AS doc_b"
                 f" FROM ({er_pairs_sql(table)})")
    return f"""
    WITH labels AS ({duplicate_clusters_sql(pairs_cte)}),
    dirty AS ({dirty_customers_sql(table)})
    SELECT COALESCE(l.cluster_id, d.rec_id) AS entity_id,
           MIN_BY(d.name, d.rec_id) AS canonical_name,
           MAX(d.bal) AS best_bal,
           COUNT(*) AS n_members,
           COUNT(DISTINCT d.origin) AS n_origins
    FROM dirty d LEFT JOIN labels l ON d.rec_id = l.doc_id
    GROUP BY 1
    """


__all__ = ["dirty_customers", "dirty_customers_sql", "er_candidate_pairs",
           "er_pairs_sql", "golden_records", "golden_records_sql",
           "MAX_EDITS", "BAL_WINDOW", "MAX_BLOCK"]


# Increment-feed id offsets (continuing the 10M-span convention).
_OFF_INC_MATCH = 50_000_000   # one edit, book moved +100 → must match
_OFF_INC_NEW = 60_000_000     # three edits → genuinely new entity


def increment_feed(cust: DataFrame) -> DataFrame:
    """(rec_id, name, nationkey, bal, origin): tonight's feed batch —
    every (k % 7 == 3) customer re-arrives with a one-letter typo
    (must match its existing entity) and every (k % 7 == 5) arrives
    three-edits corrupted (a genuinely new entity the matcher must NOT
    force onto an existing one)."""
    def variant(rem: int, off: int, name_expr: str, origin: str):
        return (cust.filter((F.col("c_custkey") % 7) == rem)
                .select((F.col("c_custkey") + off).alias("rec_id"),
                        F.expr(name_expr).alias("name"),
                        F.col("c_nationkey").alias("nationkey"),
                        (F.col("c_acctbal") + 100.0).alias("bal"),
                        F.lit(origin).alias("origin")))
    return (variant(3, _OFF_INC_MATCH, _v1_name(), "feed_match")
            .unionByName(variant(5, _OFF_INC_NEW, _v3_name(), "feed_new")))


def increment_feed_sql(table: str = "customer") -> str:
    return (f"SELECT c_custkey + {_OFF_INC_MATCH} AS rec_id,"
            f" {_v1_name()} AS name, c_nationkey AS nationkey,"
            f" c_acctbal + 100.0 AS bal, 'feed_match' AS origin"
            f" FROM {table} WHERE c_custkey % 7 = 3"
            f" UNION ALL"
            f" SELECT c_custkey + {_OFF_INC_NEW}, {_v3_name()},"
            f" c_nationkey, c_acctbal + 100.0, 'feed_new'"
            f" FROM {table} WHERE c_custkey % 7 = 5")


def _melt_segments(recs: DataFrame, id_col: str) -> DataFrame:
    return recs.select(
        id_col, "name", "nationkey", "bal",
        F.expr(f"explode(transform(sequence(0, {N_CLASSES - 1}),"
               f" s -> struct(s AS seg, {_segval('name', 's')} AS segval)))"
               ).alias("b")) \
        .select(id_col, "name", "nationkey", "bal", "b.seg", "b.segval")


def er_match_increment(store: DataFrame, batch: DataFrame,
                       max_edits: int = MAX_EDITS,
                       bal_window: float = BAL_WINDOW) -> DataFrame:
    """(rec_id, entity_id, matched, lev): assign each increment record
    to its existing entity or mint a new one (entity_id = rec_id) —
    the nightly-MDM half of the linkage lifecycle, mirroring
    ``dedup.incremental_hamming_pairs``: the persisted entity STORE
    streams by block key, the small feed batch is BROADCAST, candidates
    are cross-side only (no in-bucket expansion, no star cap on this
    path at all), and the historical corpus is never re-clustered.
    Best match per record = min (lev, entity_id) — a deterministic
    total order. ``store``: (entity_id, name, nationkey, bal)."""
    sm = _melt_segments(
        store.select(F.col("entity_id"), "name", "nationkey", "bal"),
        "entity_id").withColumnRenamed("name", "s_name") \
        .withColumnRenamed("bal", "s_bal")
    bm = _melt_segments(batch, "rec_id") \
        .withColumnRenamed("name", "b_name") \
        .withColumnRenamed("bal", "b_bal")
    cand = (sm.join(F.broadcast(bm), ["nationkey", "seg", "segval"])
            .select("rec_id", "entity_id",
                    F.levenshtein("s_name", "b_name").cast("long")
                    .alias("lev"),
                    F.abs(F.col("s_bal") - F.col("b_bal")).alias("bd"))
            .filter((F.col("lev") <= max_edits)
                    & (F.col("bd") <= bal_window))
            .drop("bd").distinct())
    from pyspark.sql import Window
    w = Window.partitionBy("rec_id").orderBy("lev", "entity_id")
    best = (cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1).drop("rn"))
    return (batch.select("rec_id")
            .join(best, "rec_id", "left")
            .select("rec_id",
                    F.coalesce("entity_id", "rec_id").alias("entity_id"),
                    F.col("entity_id").isNotNull().alias("matched"),
                    "lev"))


def er_match_increment_sql(table: str = "customer",
                           max_edits: int = MAX_EDITS,
                           bal_window: float = BAL_WINDOW) -> str:
    """DuckDB oracle for :func:`er_match_increment` with the day-0
    store = the base customer dimension (one entity per base record)."""
    store = (f"SELECT c_custkey AS entity_id, c_name AS name,"
             f" c_nationkey AS nationkey, c_acctbal AS bal FROM {table}")
    seg_s = _segval("s.name", "g.s")
    seg_b = _segval("b.name", "g.s")
    return f"""
    WITH store AS ({store}), batch AS ({increment_feed_sql(table)}),
    sm AS (SELECT s.entity_id, s.name, s.nationkey, s.bal,
                  g.s AS seg, {seg_s} AS segval
           FROM store s,
                (SELECT unnest(generate_series(0, {N_CLASSES - 1})) AS s)
                g),
    bm AS (SELECT b.rec_id, b.name, b.nationkey, b.bal,
                  g.s AS seg, {seg_b} AS segval
           FROM batch b,
                (SELECT unnest(generate_series(0, {N_CLASSES - 1})) AS s)
                g),
    cand AS (
      SELECT DISTINCT bm.rec_id, sm.entity_id,
             CAST(levenshtein(sm.name, bm.name) AS BIGINT) AS lev
      FROM sm JOIN bm ON sm.nationkey = bm.nationkey
                     AND sm.seg = bm.seg AND sm.segval = bm.segval
      WHERE levenshtein(sm.name, bm.name) <= {max_edits}
        AND abs(sm.bal - bm.bal) <= {bal_window}
    ),
    best AS (
      SELECT rec_id, entity_id, lev,
             ROW_NUMBER() OVER (PARTITION BY rec_id
                                ORDER BY lev, entity_id) AS rn
      FROM cand
    )
    SELECT b.rec_id, COALESCE(bst.entity_id, b.rec_id) AS entity_id,
           bst.entity_id IS NOT NULL AS matched, bst.lev
    FROM batch b LEFT JOIN (SELECT rec_id, entity_id, lev FROM best
                            WHERE rn = 1) bst USING (rec_id)
    """
