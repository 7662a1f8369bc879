"""Entity resolution / record linkage (operators/linkage.py): planted
link/reject tiers, pigeonhole blocking recall, survivorship rules."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from etl_ender_turing_spark.operators import linkage as lk
from etl_ender_turing_spark.operators.dedup import duplicate_clusters

SF = "/root/testdata/sf0.001"


def _cust(spark, n=60):
    rows = [Row(c_custkey=k, c_name=f"Customer#{k:09d}",
                c_nationkey=k * 7 % 25,
                c_acctbal=float(f"{(k * 137) % 9000}.{k % 100:02d}"),
                c_mktsegment="BUILDING")
            for k in range(n)]
    return spark.createDataFrame(rows)


def test_planted_tiers_link_and_reject(spark):
    recs = lk.dirty_customers(_cust(spark))
    pairs = lk.er_candidate_pairs(recs).collect()
    got = {(r.rec_a, r.rec_b): r.lev for r in pairs}
    # one-substitution feed links at lev 1; two-substitution at lev 2
    assert got[(0, 10_000_000)] == 1
    assert got[(5, 10_000_005)] == 1
    assert got[(0, 20_000_000)] == 2
    assert got[(10, 20_000_010)] == 2
    # three-edit corruption is REJECTED by the levenshtein verify even
    # though all three edits share one position class (block key found)
    assert all(not (a % 10_000_000 == 7 and b == a % 10_000_000
                    + 30_000_000) for a, b in got)
    assert (7, 30_000_007) not in got and (17, 30_000_017) not in got
    # one-edit twin with a 5000.00 balance move is REJECTED by the
    # balance-window rule
    assert (4, 40_000_004) not in got and (14, 40_000_014) not in got


def test_blocking_recall_matches_allpairs_verify(spark):
    """Blocked candidates + verify == brute-force all-pairs verify (the
    pigeonhole guarantee for the substitution-only fixture)."""
    recs = lk.dirty_customers(_cust(spark, 40))
    blocked = {(r.rec_a, r.rec_b)
               for r in lk.er_candidate_pairs(recs).collect()}
    a, b = recs.alias("a"), recs.alias("b")
    brute = {(r.rec_a, r.rec_b) for r in
             a.join(b, (F.col("a.rec_id") < F.col("b.rec_id"))
                    & (F.col("a.nationkey") == F.col("b.nationkey")))
             .select(F.col("a.rec_id").alias("rec_a"),
                     F.col("b.rec_id").alias("rec_b"),
                     F.levenshtein("a.name", "b.name").alias("lev"),
                     F.abs(F.col("a.bal") - F.col("b.bal")).alias("bd"))
             .filter((F.col("lev") <= lk.MAX_EDITS)
                     & (F.col("bd") <= lk.BAL_WINDOW)).collect()}
    assert blocked == brute


def test_golden_record_survivorship(spark):
    recs = lk.dirty_customers(_cust(spark, 30))
    pairs = lk.er_candidate_pairs(recs)
    labels = duplicate_clusters(
        pairs.select(F.col("rec_a").alias("doc_a"),
                     F.col("rec_b").alias("doc_b")))
    gold = {r.entity_id: r for r in
            lk.golden_records(recs, labels).collect()}
    # every record is in exactly one entity
    assert sum(r.n_members for r in gold.values()) == recs.count()
    # customer 0: base + import_a + import_b merge into entity 0
    e0 = gold[0]
    assert e0.n_members >= 3 and e0.n_origins >= 3
    assert e0.canonical_name == "Customer#000000000"  # min-rec_id member
    base_bal = float(
        recs.filter(F.col("rec_id") == 0).collect()[0].bal)
    assert e0.best_bal == base_bal + 100.0  # max across feeds survives
    # the balance-reject twin stays a singleton entity
    e4 = gold[40_000_004]
    assert e4.n_members == 1 and e4.n_origins == 1


def test_star_fallback_caps_block_expansion(spark):
    """A degenerate block (identical names, same nation, equal balance)
    over max_block produces star pairs only — linear, not quadratic."""
    rows = [Row(rec_id=i, name="Customer#000000000", nationkey=1,
                bal=0.0, origin="base") for i in range(12)]
    recs = spark.createDataFrame(rows)
    pairs = lk.er_candidate_pairs(recs, max_block=10)
    got = {(r.rec_a, r.rec_b) for r in pairs.collect()}
    assert got == {(0, i) for i in range(1, 12)}


def test_catalog_queries_hash_vs_duckdb(spark):
    """Cross-engine value check of the three ER queries at sf0.001."""
    import duckdb

    from etl_ender_turing_spark.plans import CATALOG
    con = duckdb.connect()
    con.execute(f"CREATE VIEW customer AS SELECT * FROM "
                f"'{SF}/customer.parquet'")
    for name in ("q_er_candidate_pairs", "q_er_clusters",
                 "q_er_golden_record"):
        spec = CATALOG[name]
        sdf = spec.builder(spark, SF).toPandas()
        odf = con.execute(spec.oracle).df()
        sdf = sdf[sorted(sdf.columns)].sort_values(
            sorted(sdf.columns)).reset_index(drop=True)
        odf = odf[sorted(odf.columns)].sort_values(
            sorted(odf.columns)).reset_index(drop=True)
        assert len(sdf) == len(odf), name
        assert list(sdf.columns) == list(odf.columns), name
        for c in sdf.columns:
            a, b = sdf[c], odf[c]
            if a.dtype.kind == "f":
                assert (a - b).abs().max() == 0.0, (name, c)
            else:
                assert (a.astype(str) == b.astype(str)).all(), (name, c)


def test_increment_matching_assigns_and_mints(spark):
    cust = _cust(spark, 70)
    store = cust.select(F.col("c_custkey").alias("entity_id"),
                        F.col("c_name").alias("name"),
                        F.col("c_nationkey").alias("nationkey"),
                        F.col("c_acctbal").alias("bal"))
    got = {r.rec_id: r for r in
           lk.er_match_increment(store, lk.increment_feed(cust))
           .collect()}
    # every feed record got exactly one verdict
    n_feed = sum(1 for k in range(70) if k % 7 in (1, 3, 5, 6))
    assert len(got) == n_feed
    for k in range(70):
        if k % 7 == 3:   # one-substitution re-arrival -> entity, lev 1
            r = got[k + 50_000_000]
            assert r.matched and r.entity_id == k and r.lev == 1
        if k % 7 == 1:   # one INSERTED letter -> entity, lev 1 (indel
            r = got[k + 110_000_000]    # tolerance of the PassJoin keys)
            assert r.matched and r.entity_id == k and r.lev == 1
        if k % 7 == 6:   # one DELETED digit -> entity, lev 1
            r = got[k + 120_000_000]
            assert r.matched and r.entity_id == k and r.lev == 1
        if k % 7 == 5:   # three-edit arrival -> minted new entity
            r = got[k + 60_000_000]
            assert (not r.matched and r.entity_id == k + 60_000_000
                    and r.lev is None)


def test_increment_batch_side_is_broadcast(spark):
    cust = _cust(spark, 30)
    store = cust.select(F.col("c_custkey").alias("entity_id"),
                        F.col("c_name").alias("name"),
                        F.col("c_nationkey").alias("nationkey"),
                        F.col("c_acctbal").alias("bal"))
    plan = (lk.er_match_increment(store, lk.increment_feed(cust))
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# Indel-tolerant PassJoin blocking (round 10)
# ---------------------------------------------------------------------------

def test_indel_tiers_link_and_reject(spark):
    recs = lk.indel_customers(_cust(spark, 60))
    got = {(r.rec_a, r.rec_b): r.lev
           for r in lk.er_indel_pairs(recs).collect()}
    for k in range(60):
        if k % 6 == 1:      # one inserted letter -> links at lev 1
            assert got[(k, k + 70_000_000)] == 1
        if k % 6 == 3:      # one deleted digit -> links at lev 1
            assert got[(k, k + 80_000_000)] == 1
        if k % 12 == 0:     # insertion + substitution -> links at lev 2
            assert got[(k, k + 90_000_000)] == 2
        if k % 12 == 5:     # three insertions -> must NOT link
            assert (k, k + 100_000_000) not in got


def test_indel_blocking_recall_matches_allpairs_verify(spark):
    """PassJoin candidates + verify == brute-force all-pairs verify —
    the pigeonhole guarantee now holds for insertions and deletions,
    not just substitutions (the r9 verdict's documented gap)."""
    recs = lk.indel_customers(_cust(spark, 40))
    blocked = {(r.rec_a, r.rec_b)
               for r in lk.er_indel_pairs(recs).collect()}
    a, b = recs.alias("a"), recs.alias("b")
    brute = {(r.rec_a, r.rec_b) for r in
             a.join(b, (F.col("a.rec_id") < F.col("b.rec_id"))
                    & (F.col("a.nationkey") == F.col("b.nationkey")))
             .select(F.col("a.rec_id").alias("rec_a"),
                     F.col("b.rec_id").alias("rec_b"),
                     F.levenshtein("a.name", "b.name").alias("lev"),
                     F.abs(F.col("a.bal") - F.col("b.bal")).alias("bd"))
             .filter((F.col("lev") <= lk.MAX_EDITS)
                     & (F.col("bd") <= lk.BAL_WINDOW)).collect()}
    assert blocked == brute


def test_indel_star_fallback_caps_block_expansion(spark):
    """A degenerate bucket over max_block pairs the min-id index member
    against the probe members only — linear, not quadratic."""
    from pyspark.sql import Row
    rows = [Row(rec_id=i, name="Customer#000000000", nationkey=1,
                bal=0.0, origin="base") for i in range(12)]
    recs = spark.createDataFrame(rows)
    got = {(r.rec_a, r.rec_b)
           for r in lk.er_indel_pairs(recs, max_block=10).collect()}
    assert got == {(0, i) for i in range(1, 12)}


def test_indel_short_zone_recall(spark):
    """Two records whose blocking zones are BOTH <= 2 chars can never
    share a PassJoin scheme key (the probe window needs partner length
    >= 3) — the sentinel short-zone bucket must pair them anyway, and
    mixed short x long pairs must keep working via the normal probe."""
    from pyspark.sql import Row
    rows = [
        # zone "7" vs zone "9": lev 1, both length-1 zones (the hole)
        Row(rec_id=0, name="Customer#7", nationkey=1, bal=0.0,
            origin="base"),
        Row(rec_id=1, name="Customer#9", nationkey=1, bal=10.0,
            origin="base"),
        # zone "42" vs "442": short x length-3 (covered by the probe)
        Row(rec_id=2, name="Customer#42", nationkey=2, bal=0.0,
            origin="base"),
        Row(rec_id=3, name="Customer#442", nationkey=2, bal=5.0,
            origin="base"),
        # zone "" (empty) vs "Z": degenerate but still within max_edits
        Row(rec_id=4, name="Customer#", nationkey=3, bal=0.0,
            origin="base"),
        Row(rec_id=5, name="Customer#Z", nationkey=3, bal=1.0,
            origin="base"),
        # control: same-nation short zones beyond max_edits of others
        Row(rec_id=6, name="Customer#55555", nationkey=1, bal=0.0,
            origin="base"),
    ]
    got = {(r.rec_a, r.rec_b): r.lev
           for r in lk.er_indel_pairs(spark.createDataFrame(rows))
           .collect()}
    assert got == {(0, 1): 1, (2, 3): 1, (4, 5): 1}


def _day0_store(cust):
    return cust.select(F.col("c_custkey").alias("entity_id"),
                       F.col("c_name").alias("name"),
                       F.col("c_nationkey").alias("nationkey"),
                       F.col("c_acctbal").alias("bal"))


def test_golden_increment_updates_and_mints(spark):
    cust = _cust(spark, 70)
    store = _day0_store(cust)
    got = {r.entity_id: r for r in
           lk.golden_increment(store, lk.increment_feed(cust)).collect()}
    touched = {k for k in range(70) if k % 7 in (1, 3, 6)}
    minted = {k + 60_000_000 for k in range(70) if k % 7 == 5}
    assert set(got) == touched | minted
    base = {r.c_custkey: r for r in cust.collect()}
    for k in touched:
        r = got[k]
        # store representative + the matched feed record; canonical name
        # stays the min-rec_id member's (the store rep), balance max wins
        assert not r.is_new and r.n_members == 2
        assert r.canonical_name == base[k].c_name
        assert r.best_bal == float(base[k].c_acctbal) + 100.0
    for e in minted:
        r = got[e]
        assert r.is_new and r.n_members == 1


def test_golden_increment_stream_matches_batch(spark, tmp_path):
    """foreachBatch wiring: the feed lands as two micro-batches, each
    MERGEs its survivorship update set into the golden parquet store via
    the idempotent key-upsert — the final table equals day-0 rows
    upserted with the ONE-SHOT batch update set."""
    from etl_ender_turing_spark.streaming.stream import (
        golden_increment_stream)

    cust = _cust(spark, 70)
    store = _day0_store(cust)
    feed = lk.increment_feed(cust)

    landing = str(tmp_path / "landing")
    (feed.withColumn("nationkey", F.col("nationkey").cast("int"))
     .withColumn("bal", F.col("bal").cast("double"))
     .repartition(2).write.mode("overwrite").parquet(landing))
    golden_dir = str(tmp_path / "golden")
    # day-0 golden store: every base entity as its own golden row
    day0 = store.select(
        "entity_id", F.col("name").alias("canonical_name"),
        F.col("bal").alias("best_bal"),
        F.lit(1).cast("long").alias("n_members"),
        F.lit(False).alias("is_new"))
    day0.write.mode("overwrite").parquet(golden_dir)

    q = golden_increment_stream(spark, landing, store, golden_dir,
                                str(tmp_path / "ckpt"))
    q.awaitTermination()

    upd = {r.entity_id: r for r in
           lk.golden_increment(store, feed).collect()}
    final = {r.entity_id: r for r in
             spark.read.parquet(golden_dir).collect()}
    exp = {r.entity_id: r for r in day0.collect()} | upd
    assert set(final) == set(exp)
    for e, r in exp.items():
        g = final[e]
        assert (g.canonical_name, float(g.best_bal), g.n_members,
                g.is_new) == (r.canonical_name, float(r.best_bal),
                              r.n_members, r.is_new), e


def test_golden_increment_stream_cross_epoch_accumulates(spark, tmp_path):
    """An entity touched in TWO different micro-batches must end with a
    golden row computed over BOTH batches' members (the members-table
    fold-back) — and a full stream replay over the same landing files
    must converge, not double-count."""
    from etl_ender_turing_spark.streaming.stream import (
        golden_increment_stream)

    cust = _cust(spark, 70)
    store = _day0_store(cust)
    feed = lk.increment_feed(cust)
    # a SECOND re-arrival for every feed_match entity: fresh rec_id,
    # same one-edit name (matches the same entity), +50 balance
    extra = feed.filter(F.col("origin") == "feed_match").select(
        (F.col("rec_id") + 1_000_000_000).alias("rec_id"), "name",
        "nationkey", (F.col("bal") + 50.0).alias("bal"),
        F.lit("feed_match2").alias("origin"))

    landing = str(tmp_path / "landing")
    for i, part in enumerate((feed, extra)):
        (part.withColumn("nationkey", F.col("nationkey").cast("int"))
         .withColumn("bal", F.col("bal").cast("double"))
         .coalesce(1).write.mode("append").parquet(landing))
    golden_dir = str(tmp_path / "golden")
    day0 = store.select(
        "entity_id", F.col("name").alias("canonical_name"),
        F.col("bal").alias("best_bal"),
        F.lit(1).cast("long").alias("n_members"),
        F.lit(False).alias("is_new"))
    day0.write.mode("overwrite").parquet(golden_dir)

    q = golden_increment_stream(spark, landing, store, golden_dir,
                                str(tmp_path / "ckpt"))
    q.awaitTermination()

    upd = {r.entity_id: r for r in
           lk.golden_increment(store, feed.unionByName(extra))
           .collect()}
    assert any(r.n_members == 3 for r in upd.values())  # fixture sanity

    def check():
        final = {r.entity_id: r for r in
                 spark.read.parquet(golden_dir).collect()}
        exp = {r.entity_id: r for r in day0.collect()} | upd
        assert set(final) == set(exp)
        for e, r in exp.items():
            g = final[e]
            assert (g.canonical_name, float(g.best_bal), g.n_members,
                    g.is_new) == (r.canonical_name, float(r.best_bal),
                                  r.n_members, r.is_new), e

    check()
    # replay: a fresh checkpoint re-processes every landing file against
    # the already-updated golden + members tables — must converge
    q = golden_increment_stream(spark, landing, store, golden_dir,
                                str(tmp_path / "ckpt2"))
    q.awaitTermination()
    check()

    # crash-window replay: a crash inside the members upsert's swap
    # parks the members table at '._old' — replay must RECOVER it, not
    # treat the members state as absent and forget epoch-1 members
    import os
    members_dir = golden_dir.rstrip("/") + "._members"
    os.rename(members_dir, members_dir + "._old")
    q = golden_increment_stream(spark, landing, store, golden_dir,
                                str(tmp_path / "ckpt3"))
    q.awaitTermination()
    check()


def test_indel_blocking_recall_randomized(spark):
    """Seeded randomized pin of the PassJoin pigeonhole: 200 base
    records each spawn a variant with 1-2 RANDOM edits (insert/delete/
    substitute at random zone positions) — every variant pair within
    max_edits of its base (and balance window) must be recalled.
    Catches window-arithmetic off-by-ones the deterministic planted
    fixture can't reach."""
    import random

    from pyspark.sql import Row
    rng = random.Random(42)
    rows, expected = [], set()
    for i in range(200):
        digits = "".join(rng.choice("0123456789") for _ in range(9))
        base = f"Customer#{digits}"
        rows.append(Row(rec_id=i, name=base, nationkey=i % 5,
                        bal=float(i), origin="base"))
        name = base
        for _ in range(rng.randint(1, 2)):
            op = rng.choice("ids")
            # zone-relative position (0-based offset into the suffix
            # from ZONE_START); keep the zone length within [7, 11]
            zlen = len(name) - 9
            if op == "i" and zlen < 11:
                p = 9 + rng.randint(0, zlen)
                name = name[:p] + rng.choice("XYZQW") + name[p:]
            elif op == "d" and zlen > 7:
                p = 9 + rng.randint(0, zlen - 1)
                name = name[:p] + name[p + 1:]
            else:
                p = 9 + rng.randint(0, zlen - 1)
                name = name[:p] + rng.choice("XYZQW") + name[p + 1:]
        rows.append(Row(rec_id=10_000 + i, name=name, nationkey=i % 5,
                        bal=float(i) + 10.0, origin="variant"))
        expected.add((i, 10_000 + i))
    recs = spark.createDataFrame(rows)
    got = {(r.rec_a, r.rec_b): r.lev
           for r in lk.er_indel_pairs(recs).collect()}
    # a variant whose random edits happened to cancel below lev<=2 of a
    # DIFFERENT record is legit extra output; the guarantee under test
    # is that every (base, its-variant) pair with lev <= max_edits is
    # present — compute the true lev per pair from the engine itself
    levs = {tuple(sorted((a, b))): None for a, b in expected}
    import itertools
    name_of = {r.rec_id: r.name for r in rows}

    def lev(a, b):
        # tiny python levenshtein for the 200 assertion pairs only
        m, n = len(a), len(b)
        prev = list(range(n + 1))
        for i in range(1, m + 1):
            cur = [i] + [0] * n
            for j in range(1, n + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (a[i - 1] != b[j - 1]))
            prev = cur
        return prev[n]

    missed = [(a, b) for a, b in expected
              if lev(name_of[a], name_of[b]) <= lk.MAX_EDITS
              and (a, b) not in got]
    assert missed == [], f"recall holes: {missed[:5]}"


def test_indel_blocking_recall_randomized_short_zones(spark):
    """Randomized pin of the SHORT-ZONE sentinel path: zones of length
    0-5 (spanning the sentinel bucket, the n>=3 scheme boundary, and
    mixed short x long pairs) with random edits — every same-nation
    pair within max_edits and the balance window must be recalled.
    The length-7+ randomized test above can't reach this regime."""
    import random

    from pyspark.sql import Row
    rng = random.Random(7)
    rows = []
    for i in range(300):
        zlen = rng.randint(0, 5)
        zone = "".join(rng.choice("0123456789") for _ in range(zlen))
        rows.append(Row(rec_id=i, name=f"Customer#{zone}",
                        nationkey=i % 4, bal=float(i % 40), origin="b"))
    recs = spark.createDataFrame(rows)
    got = {(r.rec_a, r.rec_b) for r in lk.er_indel_pairs(recs).collect()}

    def lev(a, b):
        m, n = len(a), len(b)
        prev = list(range(n + 1))
        for x in range(1, m + 1):
            cur = [x] + [0] * n
            for y in range(1, n + 1):
                cur[y] = min(prev[y] + 1, cur[y - 1] + 1,
                             prev[y - 1] + (a[x - 1] != b[y - 1]))
            prev = cur
        return prev[n]

    missed = [(a.rec_id, b.rec_id)
              for i, a in enumerate(rows) for b in rows[i + 1:]
              if a.nationkey == b.nationkey
              and abs(a.bal - b.bal) <= lk.BAL_WINDOW
              and lev(a.name, b.name) <= lk.MAX_EDITS
              and (a.rec_id, b.rec_id) not in got]
    assert missed == [], f"short-zone recall holes: {missed[:5]}"


def test_increment_matcher_mixed_length_store(spark):
    """The probe-length pruning must keep recall when the STORE itself
    carries several zone lengths (the certified fixture is all-length-9,
    so its IN-list is a single value): store zones of length 7/9/11,
    batch records one edit (sub, ins, del) away from each — every one
    must match its entity; a three-edit arrival must mint."""
    from pyspark.sql import Row
    store_rows = [
        Row(entity_id=1, name="Customer#1234567", nationkey=1, bal=0.0),
        Row(entity_id=2, name="Customer#123456789", nationkey=1,
            bal=0.0),
        Row(entity_id=3, name="Customer#12345678901", nationkey=1,
            bal=0.0),
        # SHORT zone (2 chars): unreachable through the scheme probe
        # (partner length must be >= 3) — the sentinel bucket's case
        Row(entity_id=4, name="Customer#12", nationkey=1, bal=0.0),
    ]
    batch_rows = [
        Row(rec_id=101, name="Customer#1234567X", nationkey=1, bal=1.0,
            origin="ins"),           # len-7 entity, one insertion
        Row(rec_id=102, name="Customer#12345689", nationkey=1, bal=1.0,
            origin="del"),           # len-9 entity, one deletion
        Row(rec_id=103, name="Customer#12345678X01", nationkey=1,
            bal=1.0, origin="sub"),  # len-11 entity, one substitution
        Row(rec_id=104, name="Customer#XXX45678901", nationkey=1,
            bal=1.0, origin="new"),  # three edits -> mint
        Row(rec_id=105, name="Customer#1X", nationkey=1, bal=1.0,
            origin="sub_short"),     # short x short, one substitution
        Row(rec_id=106, name="Customer#12X4", nationkey=1, bal=1.0,
            origin="ins_short"),     # zone len 4 vs store len 2: two
                                     # insertions — reachable ONLY via
                                     # the widened (n <= 2 + tau) probe
        Row(rec_id=107, name="Customer#XY", nationkey=1, bal=1.0,
            origin="new_short"),     # short zone, 2 subs + no partner
                                     # within tau of zone "12"? lev=2
                                     # -> actually matches within tau
    ]
    got = {r.rec_id: r for r in lk.er_match_increment(
        spark.createDataFrame(store_rows),
        spark.createDataFrame(batch_rows)).collect()}
    assert (got[101].entity_id, got[101].matched) == (1, True)
    assert (got[102].entity_id, got[102].matched) == (2, True)
    assert (got[103].entity_id, got[103].matched) == (3, True)
    assert (got[104].entity_id, got[104].matched) == (104, False)
    assert (got[105].entity_id, got[105].matched) == (4, True)
    assert (got[106].entity_id, got[106].matched) == (4, True)
    # zone "XY" is lev-2 from zone "12" — inside tau, so the sentinel
    # must surface it too (precision still enforced by the verify)
    assert (got[107].entity_id, got[107].matched) == (4, True)


def test_increment_matcher_empty_store_mints_all(spark):
    """An empty entity store (day-0 cold start) must mint every batch
    record — the pruning's empty-length-histogram short-circuit."""
    from pyspark.sql import Row
    store = spark.createDataFrame(
        [], "entity_id long, name string, nationkey long, bal double")
    batch = spark.createDataFrame(
        [Row(rec_id=7, name="Customer#123456789", nationkey=1, bal=0.0,
             origin="b")])
    got = lk.er_match_increment(store, batch).collect()
    assert [(r.rec_id, r.entity_id, r.matched, r.lev)
            for r in got] == [(7, 7, False, None)]


def test_indel_operator_is_schema_generic_on_suppliers(spark):
    """er_indel_pairs over supplier-shaped records == brute-force verify
    (the q_er_supplier_pairs genericity argument for the indel path)."""
    sup = spark.read.parquet(f"{SF}/supplier.parquet")
    recs = sup.select(F.col("s_suppkey").alias("rec_id"),
                      F.col("s_name").alias("name"),
                      F.col("s_nationkey").alias("nationkey"),
                      F.col("s_acctbal").alias("bal"))
    blocked = {(r.rec_a, r.rec_b)
               for r in lk.er_indel_pairs(recs).collect()}
    a, b = recs.alias("a"), recs.alias("b")
    brute = {(r.rec_a, r.rec_b) for r in
             a.join(b, (F.col("a.rec_id") < F.col("b.rec_id"))
                    & (F.col("a.nationkey") == F.col("b.nationkey")))
             .select(F.col("a.rec_id").alias("rec_a"),
                     F.col("b.rec_id").alias("rec_b"),
                     F.levenshtein("a.name", "b.name").alias("lev"),
                     F.abs(F.col("a.bal") - F.col("b.bal")).alias("bd"))
             .filter((F.col("lev") <= lk.MAX_EDITS)
                     & (F.col("bd") <= lk.BAL_WINDOW)).collect()}
    assert blocked == brute
