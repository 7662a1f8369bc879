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

1. **Blocking** — never all-pairs. Two schemes, both recall-exact for
   their edit class and both crossed with the balance-band grid keys
   (:func:`_band_cell`, the bucket-density bound):
   interleaved position classes (:func:`er_candidate_pairs` — a pair
   within ≤2 substitutions corrupts at most two of the three classes,
   so one segment key survives; the SimHash-band discipline), and the
   FULL PassJoin multi-length scheme (:func:`er_indel_pairs` and the
   increment matcher — contiguous segments per candidate partner
   length with shifted probe windows, so insertions/deletions are
   covered too; both recall claims are certified against EXHAUSTIVE
   oracles, not assumed).
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

from ..functions.barrier import lineage_cut

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
    balance moved 5000.00 (the balance rule is what rejects it).

    One scan, not a 5-branch union: each customer contributes its base
    row plus 0-3 variant rows built as a per-row struct array and
    exploded (branches OVERLAP — every 10th customer is in import_a
    AND import_b — so each branch appends its own conditional array).
    The fixture is re-derived by every consumer subtree (blocking
    melt, survivorship join), so the per-build scan count matters."""
    def s(rec_id: str, name: str, bal: str, origin: str) -> str:
        return (f"struct(CAST({rec_id} AS BIGINT) AS rec_id,"
                f" {name} AS name, c_nationkey AS nationkey,"
                f" CAST({bal} AS DOUBLE) AS bal, '{origin}' AS origin)")

    arr = ", ".join([
        f"array({s('c_custkey', 'c_name', 'c_acctbal', 'base')})",
        f"CASE WHEN c_custkey % 5 = 0 THEN array("
        f"{s(f'c_custkey + {_OFF_A}', _v1_name(), 'c_acctbal + 100.0', 'import_a')}"
        f") ELSE array() END",
        f"CASE WHEN c_custkey % 10 = 0 THEN array("
        f"{s(f'c_custkey + {_OFF_B}', _v2_name(), 'c_acctbal + 100.0', 'import_b')}"
        f") ELSE array() END",
        f"CASE WHEN c_custkey % 10 = 7 THEN array("
        f"{s(f'c_custkey + {_OFF_C}', _v3_name(), 'c_acctbal + 100.0', 'import_c')}"
        f") ELSE array() END",
        f"CASE WHEN c_custkey % 10 = 4 THEN array("
        f"{s(f'c_custkey + {_OFF_D}', _v4_name(), 'c_acctbal + 5000.0', 'import_d')}"
        f") ELSE array() END",
    ])
    return (cust.select(F.expr(f"explode(concat({arr}))").alias("v"))
            .select("v.*"))


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


def _band_cell(bal: str, g: str, w: float) -> str:
    """SQL snippet: the balance-band cell of grid ``g`` (0 or 1) —
    two half-shifted grids of width 2w+1, so any two balances within
    the verify window ``w`` share a cell on at least one grid (with a
    full 1.0 of slack over the minimal 2w width, far beyond double
    rounding). Blocking keys gain (g, cell), which keeps bucket density
    BOUNDED as the corpus outgrows the fixed segment-key space: without
    it, in-bucket candidates grow ~n²/|key space| once segments
    saturate (measured: the 16x→32x replication doubling tripled
    candidate pairs). Recall is preserved exactly — the grid lemma is a
    guarantee, not a heuristic — and the oracles keep joining on the
    segment-only superset, so certified outputs are unchanged."""
    return (f"CAST(FLOOR(({bal} + ({g}) * {w + 0.5}) / {2 * w + 1})"
            f" AS BIGINT)")


def er_candidate_pairs(recs: DataFrame, max_edits: int = MAX_EDITS,
                       bal_window: float = BAL_WINDOW,
                       max_block: int = MAX_BLOCK) -> DataFrame:
    """(rec_a, rec_b, lev): verified match pairs, ``rec_a < rec_b``.

    Melt each record into its three (class, segment) block keys crossed
    with the two balance-band grid keys (:func:`_band_cell` — a pair
    inside the balance window always shares a band cell, and the band
    keeps buckets bounded when the corpus outgrows the segment-key
    space), bucket by (nationkey, class, segment, grid, cell), expand
    in-bucket pairs with the ordered-``collect_set`` lambda shape of
    ``banded_hamming_pairs`` (blocks over ``max_block`` fall back to
    star pairs against the min-id member — connectivity preserved,
    quadratic cost refused), verify with full levenshtein + the balance
    window, distinct."""
    cell = _band_cell("bal", "g", bal_window)
    melted = recs.select(
        "rec_id", "name", "nationkey", "bal",
        F.expr(f"explode(flatten(transform(sequence(0, {N_CLASSES - 1}),"
               f" s -> transform(sequence(0, 1), g ->"
               f" struct(s AS seg, {_segval('name', 's')} AS segval,"
               f" g AS g, {cell} AS cell)))))"
               ).alias("b")) \
        .select("rec_id", "name", "nationkey", "bal",
                "b.seg", "b.segval", "b.g", "b.cell")
    buckets = (melted.groupBy("nationkey", "seg", "segval", "g", "cell")
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


_OFF_INC_INS = 110_000_000   # one INSERTED letter → must match (lev 1)
_OFF_INC_DEL = 120_000_000   # one DELETED digit   → must match (lev 1)


def increment_feed(cust: DataFrame) -> DataFrame:
    """(rec_id, name, nationkey, bal, origin): tonight's feed batch —
    every (k % 7 == 3) customer re-arrives with a one-letter typo and
    every (k % 7 == 1) / (k % 7 == 6) with an INSERTED letter /
    DELETED digit (all three must match their existing entity — real
    dirty feeds contain indels, the round-10 lifecycle completion),
    while every (k % 7 == 5) arrives three-edits corrupted (a genuinely
    new entity the matcher must NOT force onto an existing one).

    One scan, not a 4-branch union: each customer lands in at most one
    branch (the k%7 remainders are disjoint), so a CASE over the
    remainder produces the identical row set while reading the dim
    once — the feed is rebuilt for every consumer subtree (probe melt,
    new-member join, unmatched left join), so the per-build scan count
    matters."""
    rem = "c_custkey % 7"
    case = (f"CASE {rem} WHEN 3 THEN {{m}} WHEN 1 THEN {{i}}"
            f" WHEN 6 THEN {{d}} ELSE {{n}} END")
    return (cust.filter(F.expr(f"{rem} IN (3, 1, 6, 5)"))
            .select(
                F.expr("c_custkey + " + case.format(
                    m=_OFF_INC_MATCH, i=_OFF_INC_INS,
                    d=_OFF_INC_DEL, n=_OFF_INC_NEW)).alias("rec_id"),
                F.expr(case.format(
                    m=_v1_name(), i=_vins_name(),
                    d=_vdel_name(), n=_v3_name())).alias("name"),
                F.col("c_nationkey").alias("nationkey"),
                (F.col("c_acctbal") + 100.0).alias("bal"),
                F.expr(case.format(
                    m="'feed_match'", i="'feed_ins'",
                    d="'feed_del'", n="'feed_new'")).alias("origin")))


def second_arrival(cust: DataFrame) -> DataFrame:
    """Epoch-2 feed: every feed_match record re-arrives with a fresh
    rec_id (+1e9) and +40 balance — the Spark twin of
    :func:`second_arrival_sql` (see there for why +40, not the window
    boundary)."""
    feed = increment_feed(cust)
    return (feed.filter(F.col("origin") == "feed_match")
            .select((F.col("rec_id") + 1_000_000_000).alias("rec_id"),
                    "name", "nationkey",
                    (F.col("bal") + 40.0).alias("bal"),
                    F.lit("feed_match2").alias("origin")))


def increment_feed_sql(table: str = "customer") -> str:
    return (f"SELECT c_custkey + {_OFF_INC_MATCH} AS rec_id,"
            f" {_v1_name()} AS name, c_nationkey AS nationkey,"
            f" c_acctbal + 100.0 AS bal, 'feed_match' AS origin"
            f" FROM {table} WHERE c_custkey % 7 = 3"
            f" UNION ALL"
            f" SELECT c_custkey + {_OFF_INC_INS}, {_vins_name()},"
            f" c_nationkey, c_acctbal + 100.0, 'feed_ins'"
            f" FROM {table} WHERE c_custkey % 7 = 1"
            f" UNION ALL"
            f" SELECT c_custkey + {_OFF_INC_DEL}, {_vdel_name()},"
            f" c_nationkey, c_acctbal + 100.0, 'feed_del'"
            f" FROM {table} WHERE c_custkey % 7 = 6"
            f" UNION ALL"
            f" SELECT c_custkey + {_OFF_INC_NEW}, {_v3_name()},"
            f" c_nationkey, c_acctbal + 100.0, 'feed_new'"
            f" FROM {table} WHERE c_custkey % 7 = 5")


def store_zone_lengths(store: DataFrame) -> list[int]:
    """One metadata pull of the entity store's zone-length histogram (a
    handful of integers) — pass it as ``store_lengths`` to every
    matcher call against the same store so the per-call length-pruning
    collect (one job + one store scan each) runs once. The streaming
    maintainer and the cross-epoch certification query both reuse it."""
    return sorted(
        store.selectExpr(f"length(substr(name, {ZONE_START})) AS n")
        .agg(F.collect_set("n")).first()[0] or [])


def er_match_increment(store: DataFrame, batch: DataFrame,
                       max_edits: int = MAX_EDITS,
                       bal_window: float = BAL_WINDOW,
                       store_lengths: list[int] | None = None
                       ) -> DataFrame:
    """(rec_id, entity_id, matched, lev): assign each increment record
    to its existing entity or mint a new one (entity_id = rec_id) —
    the nightly-MDM half of the linkage lifecycle, mirroring
    ``dedup.incremental_hamming_pairs``: the persisted entity STORE
    streams by block key, the small feed batch is BROADCAST, candidates
    are cross-side only (no in-bucket expansion, no star cap on this
    path at all), and the historical corpus is never re-clustered.

    Round-10: blocking upgraded from the substitution-only interleaved
    classes to the FULL PassJoin multi-length scheme (the
    :func:`er_indel_pairs` machinery) — the store INDEXES the 3
    contiguous segments of its own zone (constant fan-out on the huge
    side), the small batch PROBES every partner length l ∈ [n-τ, n+τ]
    in BOTH directions (the one-direction refinement does not apply:
    the indexed side is fixed), so a feed record with an inserted or
    deleted character still reaches its entity. The oracle is the
    EXHAUSTIVE store×batch verification — a hash match proves blocking
    recall, not just agreement. Best match per record = min (lev,
    entity_id) — a deterministic total order. ``store``: (entity_id,
    name, nationkey, bal).

    Short zones: the scheme probe needs partner length ``n + dl >= 3``,
    so a STORE entry with a <= 2-char zone could never be reached and
    would silently mint duplicate entities. When the store's length
    histogram contains such zones, they additionally index the
    :func:`er_indel_pairs` sentinel bucket (nationkey, l=0, i=0, '')
    and every feed record whose zone could pair with one (n <= 2 + τ)
    probes it — asymmetric on purpose: only the store indexes here, so
    unlike the batch pairer the "shorter record probes the longer's
    scheme" argument cannot cover short-store × longer-feed pairs; the
    widened probe window does, and the lev + balance verify keeps
    precision. Stores with no short zones (the fixtures) plan
    byte-identically to before."""
    tau = max_edits
    z = f"substr(name, {ZONE_START})"
    islen, istart = _pj_arith("n", "i", "div")
    pslen, pstart = _pj_arith("(n + dl)", "i", "div")
    cell = _band_cell("bal", "g", bal_window)
    sbase = (store.select(F.col("entity_id"), "name", "nationkey", "bal")
             .select("entity_id", "name", "nationkey", "bal",
                     F.expr(z).alias("zz"),
                     F.expr(f"length({z})").alias("n")))
    # the store indexes only its OWN zone lengths (index key l = n), so
    # a probe key for any other partner length can never join: collect
    # the store's distinct zone lengths once (metadata-sized — a
    # handful of integers, like the IVF centroid / Bloom-word pulls)
    # and prune the probe's dl fan-out against them BEFORE exploding.
    # The candidate set is unchanged by construction (pruned keys had
    # no index-side partner — the exhaustive oracle still certifies
    # recall); the broadcast probe melt shrinks ~5x on length-
    # homogeneous stores. A caller that maintains the store can pass
    # the histogram in (``store_lengths``) and skip the pull entirely —
    # it only changes when a new zone LENGTH first appears in the store.
    lens = sorted(store_lengths
                  if store_lengths is not None
                  else sbase.agg(F.collect_set("n")).first()[0] or [])
    if not lens:
        return batch.select(
            "rec_id", F.col("rec_id").alias("entity_id"),
            F.lit(False).alias("matched"),
            F.lit(None).cast("long").alias("lev"))
    lens_csv = ", ".join(str(v) for v in lens)
    # sentinel bucket only when the store actually HOLDS short zones —
    # gated here so length-normal stores keep a byte-identical plan
    has_short = any(v <= 2 for v in lens)
    # index/probe melts in the codegen shape of er_indel_pairs (r12):
    # one integer explode over the fixed combination space, decoded and
    # filtered as plain column expressions — the nested-lambda builds
    # ran interpreted and dominated the query's compute. Duplicate
    # probe keys no longer pre-dedup (array_distinct dropped): the
    # candidate join emits identical (rec, entity, lev) tuples and the
    # min-by pick below is duplicate-insensitive.
    sm = (sbase.select(
              "entity_id", "name", "nationkey", "bal", "zz", "n",
              F.expr("explode(sequence(0, 5))").alias("c"))
          .select("entity_id", "name", "nationkey", "bal", "zz", "n",
                  (F.col("c") / 3).cast("int").alias("g"),
                  (F.col("c") % 3).alias("i"))
          .select("entity_id", F.col("name").alias("s_name"),
                  "nationkey", F.col("bal").alias("s_bal"),
                  F.col("n").alias("l"), "i",
                  F.expr(f"substr(zz, {istart}, {islen})").alias("content"),
                  "g", F.expr(cell).alias("cell")))
    if has_short:
        sm = sm.unionByName(
            sbase.filter(F.col("n") <= 2)
            .select("entity_id", "name", "nationkey", "bal",
                    F.expr("explode(sequence(0, 1))").alias("g"))
            .select("entity_id", F.col("name").alias("s_name"),
                    "nationkey", F.col("bal").alias("s_bal"),
                    F.lit(0).alias("l"), F.lit(0).alias("i"),
                    F.lit("").alias("content"), "g",
                    F.expr(cell).cast("bigint").alias("cell")))
    bbase = batch.select("rec_id", "name", "nationkey", "bal",
                         F.expr(z).alias("zz"),
                         F.expr(f"length({z})").alias("n"))
    n_dl = 2 * tau + 1
    n_d = 2 * tau + 1
    n_comb = 2 * n_dl * 3 * n_d
    bm = (bbase.select(
              "rec_id", "name", "nationkey", "bal", "zz", "n",
              F.expr(f"explode(sequence(0, {n_comb - 1}))").alias("c"))
          .select("rec_id", "name", "nationkey", "bal", "zz", "n",
                  (F.col("c") / (n_dl * 3 * n_d)).cast("int").alias("g"),
                  ((F.col("c") / (3 * n_d)).cast("int") % n_dl - tau)
                  .alias("dl"),
                  ((F.col("c") / n_d).cast("int") % 3).alias("i"),
                  (F.col("c") % n_d - tau).alias("d"))
          .filter(F.expr(f"(n + dl) IN ({lens_csv})"
                         f" AND n + dl >= 3"
                         f" AND abs(d) + abs(dl + d) <= {tau}"
                         f" AND {pstart} + d >= 1"
                         f" AND {pstart} + d + {pslen} - 1 <= n"))
          .select("rec_id", F.col("name").alias("b_name"),
                  "nationkey", F.col("bal").alias("b_bal"),
                  F.expr("(n + dl)").alias("l"), "i",
                  F.expr(f"substr(zz, {pstart} + d, {pslen})")
                  .alias("content"),
                  "g", F.expr(cell).alias("cell")))
    if has_short:
        bm = bm.unionByName(
            bbase.filter(F.col("n") <= 2 + tau)
            .select("rec_id", "name", "nationkey", "bal",
                    F.expr("explode(sequence(0, 1))").alias("g"))
            .select("rec_id", F.col("name").alias("b_name"),
                    "nationkey", F.col("bal").alias("b_bal"),
                    F.lit(0).alias("l"), F.lit(0).alias("i"),
                    F.lit("").alias("content"), "g",
                    F.expr(cell).cast("bigint").alias("cell")))
    cand = (sm.join(F.broadcast(bm),
                    ["nationkey", "l", "i", "content", "g", "cell"])
            .select("rec_id", "entity_id",
                    F.levenshtein("s_name", "b_name").cast("long")
                    .alias("lev"),
                    F.abs(F.col("s_bal") - F.col("b_bal")).alias("bd"))
            .filter((F.col("lev") <= max_edits)
                    & (F.col("bd") <= bal_window))
            .drop("bd"))
    # no distinct: a (rec_id, entity_id, lev) candidate reached through
    # several shared block keys duplicates an IDENTICAL tuple, and the
    # min-by-(lev, entity_id) pick below is duplicate-insensitive —
    # dropping the dedup removes a full shuffle from the nightly path
    from pyspark.sql import Window
    w = Window.partitionBy("rec_id").orderBy("lev", "entity_id")
    best = (cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1).drop("rn"))
    # best is feed-bounded (<=1 row per rec_id by the row_number pick),
    # but the explode fan-out above inflates its size ESTIMATE, so the
    # planner can drop the broadcast and fall back to a SortMergeJoin
    # of two tiny tables (seen after the r12 melt: SMJ LeftOuter on
    # rec_id). Hint it explicitly — safe at any scale the feed batch
    # itself is broadcastable, which the nightly contract guarantees.
    return (batch.select("rec_id")
            .join(F.broadcast(best), "rec_id", "left")
            .select("rec_id",
                    F.coalesce("entity_id", "rec_id").alias("entity_id"),
                    F.col("entity_id").isNotNull().alias("matched"),
                    "lev"))


def er_match_increment_sql(table: str = "customer",
                           max_edits: int = MAX_EDITS,
                           bal_window: float = BAL_WINDOW,
                           batch_sql: str | None = None) -> str:
    """EXHAUSTIVE oracle for :func:`er_match_increment` with the day-0
    store = the base customer dimension (one entity per base record):
    all same-nation store×batch pairs verified by levenshtein + the
    balance window — deliberately NOT a blocking mirror, so the hash
    match certifies the PassJoin candidate set reaches every true
    match (the :func:`er_indel_pairs_sql` discipline; the batch side
    is small, so the oracle's cross product stays tractable at
    certification SFs). ``batch_sql`` swaps in a different feed batch
    (default: tonight's :func:`increment_feed_sql`)."""
    store = (f"SELECT c_custkey AS entity_id, c_name AS name,"
             f" c_nationkey AS nationkey, c_acctbal AS bal FROM {table}")
    return f"""
    WITH store AS ({store}),
    batch AS ({batch_sql or increment_feed_sql(table)}),
    cand AS (
      SELECT b.rec_id, s.entity_id,
             CAST(levenshtein(s.name, b.name) AS BIGINT) AS lev
      FROM store s JOIN batch b ON s.nationkey = b.nationkey
      WHERE levenshtein(s.name, b.name) <= {max_edits}
        AND abs(s.bal - b.bal) <= {bal_window}
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


# ---------------------------------------------------------------------------
# Indel-tolerant blocking: the FULL PassJoin multi-length segment scheme
# (Li/Deng/Feng VLDB 2011). The interleaved-class blocking above covers
# substitutions only (positions are fixed); here each record's zone is
# partitioned into tau+1 CONTIGUOUS segments per candidate partner
# LENGTH, and the probe side enumerates the shifted substring windows —
# so a single insertion or deletion still shares an exact (length,
# segment, content) key by pigeonhole:
#   ed(A, B) <= tau  =>  some segment of B's partition is edit-free and
#   aligns in A at its scheme start shifted by delta, where
#   |delta| + |(len(A) - len(B)) - delta| <= tau.
# ---------------------------------------------------------------------------

_OFF_INS = 70_000_000    # one insertion              → must link (lev 1)
_OFF_DEL = 80_000_000    # one deletion               → must link (lev 1)
_OFF_IS2 = 90_000_000    # insertion + substitution   → must link (lev 2)
_OFF_NEG = 100_000_000   # three insertions           → lev 3, must NOT link


def _ins(name: str, pos: str, ch: str) -> str:
    """SQL snippet: insert ``ch`` before 1-indexed ``pos``."""
    return (f"(substr({name}, 1, ({pos}) - 1) || '{ch}' || "
            f"substr({name}, ({pos})))")


def _del(name: str, pos: str) -> str:
    """SQL snippet: delete the character at 1-indexed ``pos``."""
    return f"(substr({name}, 1, ({pos}) - 1) || substr({name}, ({pos}) + 1))"


def _vins_name(key: str = "c_custkey", name: str = "c_name") -> str:
    return _ins(name, _pos(key, 0), "J")


def _vdel_name(key: str = "c_custkey", name: str = "c_name") -> str:
    return _del(name, _pos(key, 2))


def _vis2_name(key: str = "c_custkey", name: str = "c_name") -> str:
    # substitute first (position in the ORIGINAL frame), then insert at a
    # DIFFERENT zone offset — two real edits, letters can't cancel digits
    return _ins(_subst(name, _pos(key, 5), "L"), _pos(key, 1), "K")


def _vneg_name(key: str = "c_custkey", name: str = "c_name") -> str:
    # three inserted letters: length +3 forces lev exactly 3 (> tau) and
    # pushes the zone length outside the [n-tau, n+tau] partner window,
    # so blocking AND verification both refuse it
    inner = _ins(name, _pos(key, 0), "P")
    inner = _ins(inner, _pos(key, 3), "P")
    return _ins(inner, _pos(key, 6), "P")


def indel_customers(cust: DataFrame) -> DataFrame:
    """(rec_id, name, nationkey, bal, origin): the customer dimension
    plus deterministic feeds whose typos SHIFT positions — every 6th
    customer re-arrives with one inserted letter, every (6k+3)rd with
    one deleted zone digit, every 12th with an insertion AND a
    substitution (lev 2), and every (12k+5)th as a three-insertion
    corruption that must NOT link (lev 3 > max_edits). All edits land
    at zone positions (>= ZONE_START), the realistic case — shared
    literal prefixes are the fixture artifact, typos hit the
    discriminative part.

    Stays the 5-branch union DELIBERATELY: the single-scan explode
    rewrite that pays off for :func:`dirty_customers` (many consumer
    re-derivations) was MEASURED 2x SLOWER here (10.85 vs 5.21 s at
    sf0.1 under er_indel_pairs) — the PassJoin melt's large HOF probe
    expression fuses into whole-stage codegen over the union branches
    but not over a Generate output, and this fixture has only the two
    melt consumers to amortize against."""
    def base():
        return cust.select(
            F.col("c_custkey").alias("rec_id"),
            F.col("c_name").alias("name"),
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_acctbal").alias("bal"),
            F.lit("base").alias("origin"))

    def variant(mod: int, rem: int, off: int, name_expr: str,
                origin: str) -> DataFrame:
        return (cust.filter((F.col("c_custkey") % mod) == rem)
                .select((F.col("c_custkey") + off).alias("rec_id"),
                        F.expr(name_expr).alias("name"),
                        F.col("c_nationkey").alias("nationkey"),
                        (F.col("c_acctbal") + 100.0).alias("bal"),
                        F.lit(origin).alias("origin")))

    return (base()
            .unionByName(variant(6, 1, _OFF_INS, _vins_name(), "feed_ins"))
            .unionByName(variant(6, 3, _OFF_DEL, _vdel_name(), "feed_del"))
            .unionByName(variant(12, 0, _OFF_IS2, _vis2_name(), "feed_is2"))
            .unionByName(variant(12, 5, _OFF_NEG, _vneg_name(), "feed_neg")))


def indel_customers_sql(table: str = "customer") -> str:
    """DuckDB spelling of :func:`indel_customers` — the same variant
    name expressions verbatim."""
    def variant(mod: int, rem: int, off: int, name_expr: str,
                origin: str) -> str:
        return (f"SELECT c_custkey + {off} AS rec_id, {name_expr} AS name,"
                f" c_nationkey AS nationkey, c_acctbal + 100.0 AS bal,"
                f" '{origin}' AS origin FROM {table}"
                f" WHERE c_custkey % {mod} = {rem}")
    return (f"SELECT c_custkey AS rec_id, c_name AS name,"
            f" c_nationkey AS nationkey, c_acctbal AS bal,"
            f" 'base' AS origin FROM {table}"
            f" UNION ALL {variant(6, 1, _OFF_INS, _vins_name(), 'feed_ins')}"
            f" UNION ALL {variant(6, 3, _OFF_DEL, _vdel_name(), 'feed_del')}"
            f" UNION ALL {variant(12, 0, _OFF_IS2, _vis2_name(), 'feed_is2')}"
            f" UNION ALL {variant(12, 5, _OFF_NEG, _vneg_name(), 'feed_neg')}")


def _pj_arith(l: str, i: str, intdiv: str) -> tuple[str, str]:
    """(seg_len, seg_start) for PassJoin's even partition of a length-
    ``l`` string into 3 segments: the first ``3 - l%3`` segments get
    ``l div 3`` chars, the rest one more. Pure integer arithmetic —
    ``intdiv`` is the engine's integer-division token ('div' Spark,
    '//' DuckDB); the MATH is identical."""
    base = f"(({l}) {intdiv} 3)"
    rem = f"(({l}) % 3)"
    slen = f"({base} + (CASE WHEN ({i}) >= 3 - {rem} THEN 1 ELSE 0 END))"
    start = (f"(1 + ({i}) * {base}"
             f" + greatest(0, ({i}) - (3 - {rem})))")
    return slen, start


def er_indel_pairs(recs: DataFrame, max_edits: int = MAX_EDITS,
                   bal_window: float = BAL_WINDOW,
                   max_block: int = MAX_BLOCK) -> DataFrame:
    """(rec_a, rec_b, lev): verified match pairs under the FULL PassJoin
    multi-length scheme — recall guaranteed for ≤ ``max_edits``
    arbitrary edits (substitutions AND insertions/deletions) within the
    blocking field (the name's zone suffix; names here share a literal
    prefix, so zone lev == full lev and the exhaustive oracle certifies
    blocking recall exactly).

    Index side: each record partitions its own zone (length n) into
    3 contiguous segments → key (nationkey, n, i, segment) crossed
    with the two balance-band grid keys (:func:`_band_cell`, density
    bound).
    Probe side: for every candidate partner length l ∈ [n-τ, n+τ] and
    segment i of the LENGTH-l scheme, the substrings at the scheme
    start shifted by δ with |δ| + |(n-l) - δ| ≤ τ — the pigeonhole
    window above. ~40 probe keys/record at τ=2 (constant, data-
    independent); segment content is the discriminative digit zone, so
    buckets stay uniform. In-bucket expansion pairs index members
    against probe members with the same sorted-``collect_set`` lambda +
    ``max_block`` star fallback as :func:`er_candidate_pairs` — never
    all-pairs. Full ``levenshtein`` + balance-window verify, pair ids
    normalized (least, greatest), distinct.

    Short zones: the probe window needs partner length ``n + dl >= 3``,
    so two records whose zones are BOTH <= 2 chars would never share a
    scheme key — those records additionally index AND probe a sentinel
    bucket (nationkey, l=0, i=0, '') crossed with the same balance
    grids, restoring the unconditional recall guarantee (mixed pairs
    short x >=3 are already covered: the shorter record probes the
    longer one's scheme)."""
    tau = max_edits
    z = f"substr(name, {ZONE_START})"
    islen, istart = _pj_arith("n", "i", "div")
    pslen, pstart = _pj_arith("(n + dl)", "i", "div")
    cell = _band_cell("bal", "g", bal_window)
    base = recs.select("rec_id", "name", "nationkey", "bal",
                       F.expr(f"{z}").alias("zz"),
                       F.expr(f"length({z})").alias("n"))
    short = (f"CASE WHEN n <= 2 THEN array(struct("
             f"0 AS l, 0 AS i, '' AS content, g AS g, {cell} AS cell))"
             f" ELSE array() END")
    ix = base.select(
        "rec_id", "name", "nationkey", "bal",
        F.expr(f"explode(flatten(transform(sequence(0, 1), g ->"
               f" concat(transform(sequence(0, 2), i -> struct("
               f"n AS l, i AS i,"
               f" substr(zz, {istart}, {islen}) AS content,"
               f" g AS g, {cell} AS cell)), {short}))))").alias("k"),
        F.lit(0).alias("side"))
    # probe only partner lengths l >= n (dl in [0, tau]): for any pair
    # the pigeonhole may partition EITHER string, so it suffices that
    # the shorter record probes the longer one's scheme — the reverse
    # direction is redundant and skipping it cuts ~40% of the probe
    # fan-out (the exhaustive oracle certifies recall is intact).
    #
    # Shape (r12): ONE integer explode over the fixed (g, dl, i, d)
    # combination space, decoded and filtered as plain column
    # expressions. The previous 4-level nested-lambda build of the same
    # keys ran interpreted (no codegen inside HOF lambdas) and was the
    # query's dominant compute — 2.04 s vs 0.51 s for this arm at sf0.1
    # (key set proven identical). The array_distinct it carried is
    # dropped: duplicate probe keys collapse in the bucket collect_set,
    # so dedup here only traded O(k²) struct compares per row for a few
    # percent of shuffle volume.
    n_d = 2 * tau + 1
    n_comb = 2 * (tau + 1) * 3 * n_d
    pr = (base
          .select("rec_id", "name", "nationkey", "bal", "zz", "n",
                  F.expr(f"explode(sequence(0, {n_comb - 1}))").alias("c"))
          .select("rec_id", "name", "nationkey", "bal", "zz", "n",
                  (F.col("c") / ((tau + 1) * 3 * n_d)).cast("int")
                  .alias("g"),
                  ((F.col("c") / (3 * n_d)).cast("int") % (tau + 1))
                  .alias("dl"),
                  ((F.col("c") / n_d).cast("int") % 3).alias("i"),
                  (F.col("c") % n_d - tau).alias("d"))
          .filter(F.expr(f"n + dl >= 3 AND abs(d) + abs(dl + d) <= {tau}"
                         f" AND {pstart} + d >= 1"
                         f" AND {pstart} + d + {pslen} - 1 <= n"))
          .select("rec_id", "name", "nationkey", "bal",
                  F.expr("(n + dl)").alias("l"), F.col("i"),
                  F.expr(f"substr(zz, {pstart} + d, {pslen})")
                  .alias("content"),
                  "g", F.expr(cell).alias("cell"),
                  F.lit(1).alias("side")))
    pr_short = (base.filter(F.col("n") <= 2)
                .select("rec_id", "name", "nationkey", "bal",
                        F.expr("explode(sequence(0, 1))").alias("g"))
                .select("rec_id", "name", "nationkey", "bal",
                        F.lit(0).alias("l"), F.lit(0).alias("i"),
                        F.lit("").alias("content"), "g",
                        F.expr(cell).cast("bigint").alias("cell"),
                        F.lit(1).alias("side")))
    ix_flat = ix.select(
        "nationkey", F.col("k.l").alias("l"), F.col("k.i").alias("i"),
        F.col("k.content").alias("content"),
        F.col("k.g").alias("g"), F.col("k.cell").alias("cell"),
        F.struct(F.col("side").alias("sd"), F.col("rec_id").alias("id"),
                 F.col("name").alias("nm"), F.col("bal").alias("bl"))
        .alias("m"))
    melted = ix_flat.unionByName(
        pr.unionByName(pr_short).select(
            "nationkey", "l", "i", "content", "g", "cell",
            F.struct(F.col("side").alias("sd"),
                     F.col("rec_id").alias("id"),
                     F.col("name").alias("nm"),
                     F.col("bal").alias("bl")).alias("m")))
    buckets = (melted.groupBy("nationkey", "l", "i", "content",
                              "g", "cell")
               .agg(F.sort_array(F.collect_set("m")).alias("xs"))
               .filter(F.expr("exists(xs, x -> x.sd = 0)"
                              " AND exists(xs, x -> x.sd = 1)")))
    pair = ("CASE WHEN a.id <> b.id THEN struct("
            "least(a.id, b.id) AS rec_a, greatest(a.id, b.id) AS rec_b,"
            " CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS lev,"
            " abs(a.bl - b.bl) AS bdiff) END")
    # the sorted collect_set orders by sd first and the bucket filter
    # guarantees an sd=0 member, so xs[0] IS the index-side
    # representative — bound once (no CSE inside HOF lambdas: inlining
    # a filter() per probe element would re-scan xs quadratically in
    # exactly the oversized-bucket case this branch exists to defuse)
    star = pair.replace("a.id", "xs[0].id") \
               .replace("a.nm", "xs[0].nm") \
               .replace("a.bl", "xs[0].bl")
    pairs = F.expr(f"""
        CASE WHEN size(xs) <= {max_block}
        THEN filter(flatten(transform(filter(xs, x -> x.sd = 0), a ->
               transform(filter(xs, x -> x.sd = 1), b -> {pair}))),
             p -> p IS NOT NULL)
        ELSE filter(transform(filter(xs, x -> x.sd = 1), b -> {star}),
             p -> p IS NOT NULL)
        END""")
    return (buckets.select(F.explode(pairs).alias("p"))
            .select("p.rec_a", "p.rec_b", "p.lev", "p.bdiff")
            .filter((F.col("lev") <= max_edits)
                    & (F.col("bdiff") <= bal_window))
            .drop("bdiff")
            .distinct())


def er_indel_pairs_sql(table: str = "customer",
                       max_edits: int = MAX_EDITS,
                       bal_window: float = BAL_WINDOW) -> str:
    """EXHAUSTIVE oracle for :func:`er_indel_pairs`: all same-nation
    pairs verified by levenshtein + balance window — deliberately NOT a
    mirror of the blocking, so a hash match certifies the PassJoin
    candidate set has 100% recall on every true pair in the fixture
    (the q_lsh_recall_check discipline applied to edit-distance
    blocking)."""
    return f"""
    WITH dirty AS ({indel_customers_sql(table)})
    SELECT DISTINCT a.rec_id AS rec_a, b.rec_id AS rec_b,
           CAST(levenshtein(a.name, b.name) AS BIGINT) AS lev
    FROM dirty a JOIN dirty b
      ON a.nationkey = b.nationkey AND a.rec_id < b.rec_id
    WHERE levenshtein(a.name, b.name) <= {max_edits}
      AND abs(a.bal - b.bal) <= {bal_window}
    """


def golden_increment(store: DataFrame, batch: DataFrame,
                     max_edits: int = MAX_EDITS,
                     bal_window: float = BAL_WINDOW,
                     store_lengths: list[int] | None = None,
                     prior_members: DataFrame | None = None) -> DataFrame:
    """(entity_id, canonical_name, best_bal, n_members, is_new): the
    survivorship UPDATE set as tonight's increment lands — one row per
    entity TOUCHED by the batch, ready to MERGE into the golden-record
    store (the upsert-by-key sink the warehouse already has). Completes
    the linkage lifecycle: er_match_increment assigns each feed record
    to an existing entity or mints one; this re-runs survivorship over
    (store representative + new members) for exactly those entities —
    the historical corpus is never re-aggregated, only touched entities
    re-emit. ``store``: (entity_id, name, nationkey, bal) flat entity
    representatives, the same shape er_match_increment blocks against;
    canonical name by deterministic arg-min on record id (store
    representative carries its entity_id as record id), balance
    survives as max, ``is_new`` marks minted entities.

    ``prior_members``: (entity_id, rec_id, name, bal) feed records
    ALREADY absorbed by earlier increments (the streaming maintainer's
    rec_id-keyed members table). One batch alone only sees (store rep +
    its own members) — if the same entity is touched across two
    increments, the second's survivorship must fold the first's members
    back in or its upsert silently forgets them. Members re-arriving in
    THIS batch are anti-joined out so a replayed epoch (whose records
    are already in the table) converges instead of double-counting."""
    # the assignment table feeds TWO branches (the touched-entity semi
    # probe and the new-members join; a prior_members epoch adds two
    # more references) — cut it so the matcher's explode/broadcast/
    # window pipeline runs once per batch (interleaved A/B at sf0.1:
    # 2.6-2.9 s vs 3.1-3.2 s for the increment query; guide §3.3)
    asg = lineage_cut(
        er_match_increment(store, batch, max_edits, bal_window,
                           store_lengths=store_lengths)
        .select("rec_id", "entity_id"))
    touched = asg.select("entity_id").distinct()
    reps = (store.join(touched, "entity_id", "left_semi")
            .select("entity_id", F.col("entity_id").alias("rec_id"),
                    "name", "bal", F.lit(True).alias("from_store")))
    newm = (batch.join(asg, "rec_id")
            .select("entity_id", "rec_id", "name", "bal",
                    F.lit(False).alias("from_store")))
    members = reps.unionByName(newm)
    if prior_members is not None:
        prior = (prior_members
                 .join(touched, "entity_id", "left_semi")
                 .join(newm.select("rec_id"), "rec_id", "left_anti")
                 .select("entity_id", "rec_id", "name", "bal",
                         F.lit(False).alias("from_store")))
        members = members.unionByName(prior)
    return (members
            .groupBy("entity_id")
            .agg(F.expr("min_by(name, rec_id)").alias("canonical_name"),
                 F.max("bal").alias("best_bal"),
                 F.count(F.lit(1)).alias("n_members"),
                 F.expr("NOT bool_or(from_store)").alias("is_new")))


def golden_increment_sql(table: str = "customer",
                         max_edits: int = MAX_EDITS,
                         bal_window: float = BAL_WINDOW) -> str:
    """DuckDB oracle for :func:`golden_increment` with the day-0 store
    = the base customer dimension (one entity per base record), the
    same store :func:`er_match_increment_sql` assumes."""
    return f"""
    WITH asg AS ({er_match_increment_sql(table, max_edits, bal_window)}),
    store AS (SELECT c_custkey AS entity_id, c_name AS name,
                     c_nationkey AS nationkey, c_acctbal AS bal
              FROM {table}),
    batch AS ({increment_feed_sql(table)}),
    members AS (
      SELECT s.entity_id, s.entity_id AS rec_id, s.name, s.bal,
             TRUE AS from_store
      FROM store s JOIN (SELECT DISTINCT entity_id FROM asg) t
        ON s.entity_id = t.entity_id
      UNION ALL
      SELECT a.entity_id, b.rec_id, b.name, b.bal, FALSE
      FROM batch b JOIN asg a USING (rec_id)
    )
    SELECT entity_id, MIN_BY(name, rec_id) AS canonical_name,
           MAX(bal) AS best_bal, COUNT(*) AS n_members,
           NOT BOOL_OR(from_store) AS is_new
    FROM members GROUP BY 1
    """


def second_arrival_sql(table: str = "customer") -> str:
    """Epoch-2 fixture: every feed_match record RE-ARRIVES once more —
    fresh rec_id (+1e9), same one-edit name, +40 balance (safely inside
    the verify window; the boundary value would ride last-ulp double
    wobble). The second touch of an already-touched entity — exactly
    the cross-epoch case the members fold-back exists for."""
    return (f"SELECT rec_id + 1000000000 AS rec_id, name, nationkey,"
            f" bal + 40.0 AS bal, 'feed_match2' AS origin"
            f" FROM ({increment_feed_sql(table)})"
            f" WHERE origin = 'feed_match'")


def golden_cross_epoch_sql(table: str = "customer",
                           max_edits: int = MAX_EDITS,
                           bal_window: float = BAL_WINDOW) -> str:
    """DuckDB oracle for the CROSS-EPOCH golden-record fold-back:
    epoch 1 lands tonight's feed, epoch 2 lands the second arrivals —
    the epoch-2 update set must aggregate (store rep + epoch-1 members
    + epoch-2 members) for every touched entity, i.e. exactly what
    :func:`golden_increment` with ``prior_members`` produces. Both
    epochs' assignments use the EXHAUSTIVE matcher, so the hash match
    certifies the fold path end-to-end (n_members = 3 rows would
    collapse to 2 if the prior members were forgotten)."""
    extra = second_arrival_sql(table)
    asg1 = er_match_increment_sql(table, max_edits, bal_window)
    asg2 = er_match_increment_sql(table, max_edits, bal_window,
                                  batch_sql=extra)
    return f"""
    WITH store AS (SELECT c_custkey AS entity_id, c_name AS name,
                          c_nationkey AS nationkey, c_acctbal AS bal
                   FROM {table}),
    feed AS ({increment_feed_sql(table)}),
    extra AS ({extra}),
    asg1 AS (SELECT rec_id, entity_id FROM ({asg1})),
    asg2 AS (SELECT rec_id, entity_id FROM ({asg2})),
    touched AS (SELECT DISTINCT entity_id FROM asg2),
    members AS (
      SELECT s.entity_id, s.entity_id AS rec_id, s.name, s.bal,
             TRUE AS from_store
      FROM store s JOIN touched t ON s.entity_id = t.entity_id
      UNION ALL
      SELECT a.entity_id, e.rec_id, e.name, e.bal, FALSE
      FROM extra e JOIN asg2 a USING (rec_id)
      UNION ALL
      SELECT a.entity_id, f.rec_id, f.name, f.bal, FALSE
      FROM feed f JOIN asg1 a USING (rec_id)
      JOIN touched t ON a.entity_id = t.entity_id
    )
    SELECT entity_id, MIN_BY(name, rec_id) AS canonical_name,
           MAX(bal) AS best_bal, COUNT(*) AS n_members,
           NOT BOOL_OR(from_store) AS is_new
    FROM members GROUP BY 1
    """
