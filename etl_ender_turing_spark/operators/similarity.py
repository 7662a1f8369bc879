"""Similarity search over embedding columns (array<float>).

Two paths, as a 100 TB design requires:

- brute-force cosine top-k: exact; O(n) per query. Fine when the query
  side is small (broadcast) — this is the correctness baseline.
- LSH-bucketed ANN: deterministic random-hyperplane signatures (signs of
  ±1-weighted sums) bucket vectors; candidates only within a bucket.
  Hyperplane weights derive from md5 (not an RNG), so Spark and the
  DuckDB oracle compute identical buckets.

All vector math is JVM higher-order functions (zip_with/aggregate) over
double-cast arrays — no Python UDFs, stays in whole-stage codegen.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window, functions as F
from ..functions.barrier import lineage_cut

DIMS = 64


def as_double(col: str) -> Column:
    return F.expr(f"transform({col}, x -> CAST(x AS DOUBLE))")


def dot(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
        f" CAST(0 AS DOUBLE), (acc, x) -> acc + x)")


def norm(a: str) -> Column:
    return F.sqrt(F.expr(
        f"aggregate(transform({a}, x -> x * x),"
        f" CAST(0 AS DOUBLE), (acc, x) -> acc + x)"))


def cosine(a: str, b: str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(emb: DataFrame, query_id: int, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine to the vector with id ``query_id``.

    The single query row is broadcast; ranking uses the 6dp-rounded score
    with id tie-break so results are deterministic cross-engine. The take
    is ``orderBy().limit(k)`` — Spark compiles that to
    TakeOrderedAndProject (per-partition heap, driver merges k·p rows), so
    no single reducer ever sorts all n scored rows; ``rnk`` is derived
    afterwards over just the k survivors.
    """
    q = (emb.filter(F.col(id_col) == query_id)
         .select(as_double(vec_col).alias("qv")))
    scored = (emb.filter(F.col(id_col) != query_id)
              .select(F.col(id_col), as_double(vec_col).alias("v"))
              .crossJoin(F.broadcast(q))
              .select(id_col, F.round(cosine("v", "qv"), 6).alias("cos_sim")))
    order = [F.col("cos_sim").desc(), F.col(id_col)]
    top = topk_scalable(scored, k, order)
    w = Window.orderBy(*order)  # k rows only — trivial post-take ranking
    return top.withColumn("rnk", F.row_number().over(w))


def topk_scalable(scored: DataFrame, k: int, order_cols: list[str]) -> DataFrame:
    """Scale path for global top-k: per-partition top-k, then merge.

    sort within partitions (no shuffle) → limit k per partition via
    mapPartitions-free trick: repartition-free local sort + global limit.
    Spark's `orderBy().limit(k)` already compiles to TakeOrderedAndProject
    (per-partition heap + driver merge of k·p rows) — so the declarative
    form IS the scalable form; this helper exists to document that.
    """
    return scored.orderBy(*order_cols).limit(k)


def brute_force_topk_sql(sf_table: str, query_id: int, k: int = 10,
                         id_col: str = "vec_id", vec_col: str = "embedding") -> str:
    return f"""
    WITH q AS (SELECT {vec_col}::DOUBLE[] AS qv FROM {sf_table}
               WHERE {id_col} = {query_id}),
    scored AS (
      SELECT {id_col},
             ROUND(list_cosine_similarity({vec_col}::DOUBLE[], qv), 6) AS cos_sim
      FROM {sf_table}, q WHERE {id_col} <> {query_id}
    )
    SELECT {id_col}, cos_sim, rnk FROM (
      SELECT {id_col}, cos_sim,
             ROW_NUMBER() OVER (ORDER BY cos_sim DESC, {id_col}) AS rnk
      FROM scored
    ) WHERE rnk <= {k}
    """


# --------------------------------------------------------------------------
# Deterministic random-hyperplane LSH
# --------------------------------------------------------------------------

def hyperplane_weights(n_planes: int, dims: int = DIMS) -> list[list[int]]:
    """±1 weight matrix derived from md5 — identical in any engine/runtime."""
    planes = []
    for h in range(n_planes):
        row = []
        for d in range(dims):
            digest = hashlib.md5(f"{h}_{d}".encode()).hexdigest()
            row.append(1 if int(digest[0], 16) < 8 else -1)
        planes.append(row)
    return planes


def lsh_bucket(vec_col: str, planes: list[list[int]]) -> Column:
    """Integer bucket id: bit h = (Σ_d w[h][d]·v[d]) > 0."""
    bits = []
    for h, row in enumerate(planes):
        w = "array(" + ", ".join(f"CAST({x} AS DOUBLE)" for x in row) + ")"
        s = (f"aggregate(zip_with({vec_col}, {w}, (x, y) -> x * y),"
             f" CAST(0 AS DOUBLE), (acc, x) -> acc + x)")
        bits.append(f"(CASE WHEN {s} > 0 THEN {2 ** h} ELSE 0 END)")
    return F.expr(" + ".join(bits))


def lsh_buckets(emb: DataFrame, n_planes: int = 8, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """(id, bucket) assignment — the partition key for bucketed ANN.

    At 100 TB: repartition by bucket, run exact cosine only within
    buckets (expected n²/2^planes pair reduction).
    """
    planes = hyperplane_weights(n_planes)
    return (emb.select(F.col(id_col), as_double(vec_col).alias("v"))
            .select(id_col, lsh_bucket("v", planes).alias("bucket")))


def _bucket_sql_expr(vec_expr: str, planes: list[list[int]]) -> str:
    """DuckDB SQL for the same bucket formula as :func:`lsh_bucket`."""
    bits = []
    for h, row in enumerate(planes):
        w = "[" + ", ".join(f"{x}.0" for x in row) + "]"
        s = (f"list_sum(list_transform(list_zip({vec_expr}, {w}::DOUBLE[]),"
             f" p -> p[1] * p[2]))")
        bits.append(f"(CASE WHEN {s} > 0 THEN {2 ** h} ELSE 0 END)")
    return " + ".join(bits)


def lsh_buckets_sql(sf_table: str, n_planes: int = 8, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> str:
    expr = _bucket_sql_expr(f"{vec_col}::DOUBLE[]", hyperplane_weights(n_planes))
    return f"SELECT {id_col}, {expr} AS bucket FROM {sf_table}"


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN — the centroid-cell counterpart to hyperplane LSH
# --------------------------------------------------------------------------

N_CENTROIDS = 16
N_PROBE = 2
TARGET_CELL_SIZE = 512


def auto_n_centroids(n_rows: int,
                     target_cell_size: int = TARGET_CELL_SIZE) -> int:
    """Corpus-derived centroid count: ``max(16, ceil(n / target_cell_size))``.

    The within-cell quadratic cost of SemDeDup / outlier scoring is
    bounded only if k grows with the corpus — a fixed k=16 at 100 TB
    means cells of n/16 rows and O((n/16)²) in-cell pairs. Deriving k
    from a cheap count keeps cells near ``target_cell_size`` rows, so
    per-cell work is constant and total work ~linear in n (the
    scale-probe replication cliff flattens).

    Two caveats the caller owns past ~10⁸ rows: (a) assignment cost is
    n·k (crossJoin against the broadcast centroid set) — balance with
    the FAISS rule k ≈ √n, or assign hierarchically (coarse-quantize to
    √k super-cells first); (b) a k·d centroid literal past a few hundred
    MB stops being broadcastable — persist it (ivf_build_index) and let
    the assignment be a join instead.
    """
    import math
    return max(N_CENTROIDS, math.ceil(max(int(n_rows), 1) / target_cell_size))


def ivf_assignments(emb: DataFrame, n_centroids: int = N_CENTROIDS,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    centroids: DataFrame | None = None) -> DataFrame:
    """(id, cell) assignment: each vector joins its max-cosine centroid.

    Default centroids are the first ``n_centroids`` vectors by id —
    deterministic seed selection so Spark and the oracle agree exactly;
    pass ``centroids`` (cid, cv double-array) from :func:`kmeans_fit` for
    trained cells (the serving dataflow is identical either way).
    Assignment is a broadcast cross join against the tiny centroid set +
    per-vector argmax window; one narrow pass, no big shuffle.

    At 100 TB: repartition by cell after assignment; queries then read
    only nprobe cells — the IVF analogue of the LSH bucket restriction.
    """
    cents = centroids if centroids is not None else \
        (emb.filter(F.col(id_col) < n_centroids)
         .select(F.col(id_col).alias("cid"),
                 as_double(vec_col).alias("cv")))
    scored = (emb.select(F.col(id_col), as_double(vec_col).alias("v"))
              .crossJoin(F.broadcast(cents))
              .select(id_col, "cid",
                      F.round(cosine("v", "cv"), 6).alias("sim")))
    # argmax via max_by over (sim, -cid): ties break to the SMALLEST cid,
    # matching the oracle's ROW_NUMBER(ORDER BY sim DESC, cid). A
    # partial+final aggregation (map-side combine over the k candidate
    # rows per id) — cheaper than the window form, which shuffles all
    # k·n scored rows then sorts each id group.
    return (scored.groupBy(id_col)
            .agg(F.expr("max_by(cid, struct(sim, -cid))").alias("cell")))


def kmeans_fit(spark, emb: DataFrame, k: int = N_CENTROIDS, iters: int = 3,
               id_col: str = "vec_id", vec_col: str = "embedding",
               compute_inertia: bool = True) -> tuple[DataFrame, list[float]]:
    """Lloyd's k-means over the embedding column — the training loop real
    IVF runs before :func:`ivf_assignments` serves cells.

    Iterative, but every round is bit-reproducible cross-engine (6dp
    argmax rounding, exact-decimal means, deterministic seeds), so a
    FIXED iteration count is value-certifiable against
    :func:`kmeans_ivf_sql`'s unrolled CTEs; the monotone-inertia +
    cluster-recovery tests cover the open-ended form. Per iteration:

    1. assign: broadcast the k×d centroid set, per-vector argmax (cosine)
       — one narrow pass over the data, no shuffle of the vectors;
    2. update: posexplode vector dims → partial-aggregated mean per
       (cell, dim) — ONE shuffle of k·d·partitions pre-aggregated rows,
       not of the data — then k·d rows collect to the driver (metadata
       scale, same pattern as MLlib's treeAggregate) to rebuild the
       broadcast literal for the next round.

    Seeds are the first ``k`` vectors (deterministic). Returns the final
    centroid DataFrame (cid, cv) and the per-iteration inertia trace
    (mean 1−cos to the assigned centroid) whose monotone decrease the
    tests pin.
    """
    emb = emb.filter(F.col(vec_col).isNotNull())   # null vectors carry no
    # geometry; dropping them keeps every downstream explode/mean sane
    head = emb.select(F.size(as_double(vec_col)).alias("d")).head(1)
    if not head:       # empty corpus: no centroids, empty trace — callers
        # get a well-typed empty frame instead of a crash (empty input
        # partitions are routine at scale)
        return (emb.sparkSession.createDataFrame(
            [], "cid long, cv array<double>"), [])
    d = head[0]["d"]
    cents = (emb.filter(F.col(id_col) < k)
             .select(F.col(id_col).alias("cid"),
                     as_double(vec_col).alias("cv")))
    v = emb.select(F.col(id_col), as_double(vec_col).alias("v"))
    inertia: list[float] = []
    for _ in range(iters):
        # 6dp-rounded sim for the argmax (cid tie-break) and exact-decimal
        # means: every round is bit-reproducible cross-engine, so the
        # FIXED-iteration trainer is value-certifiable by unrolled CTEs
        # (kmeans_ivf_sql) despite "iterative" usually meaning rows-only
        scored = (v.crossJoin(F.broadcast(cents))
                  .select(id_col, "cid",
                          F.round(cosine("v", "cv"), 6).alias("sim"), "v"))
        # argmax via max_by partial+final agg (the ivf_assignments shape),
        # NOT a per-id window: the window form shuffles all n*k scored
        # rows each iteration, the agg combines map-side to one row per
        # id first. Tie-break struct(sim, -cid) == ORDER BY sim DESC, cid
        # — values identical, so the unrolled-CTE oracle is unchanged.
        # v is constant per id (any_value is deterministic here).
        assigned = (scored.groupBy(id_col)
                    .agg(F.expr("max_by(cid, struct(sim, -cid))").alias("cid"),
                         F.max("sim").alias("sim"),
                         F.expr("any_value(v)").alias("v")))
        if compute_inertia:   # one extra job per round — skippable when
            inertia.append(assigned.select(   # only centroids are needed
                F.avg(1 - F.col("sim")).alias("j")).first()["j"])
        # element-wise mean per cell: dims explode narrow, partial agg
        means = (assigned.select("cid", F.posexplode("v").alias("dim", "x"))
                 .groupBy("cid", "dim")
                 .agg(F.expr("CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE)"
                             " / COUNT(x)").alias("m"))
                 .collect())                       # k*d rows — driver metadata
        prev = {r["cid"]: list(r["cv"]) for r in cents.collect()}
        by_cell: dict[int, list[float]] = {}
        for r in means:
            by_cell.setdefault(r["cid"], [0.0] * d)[r["dim"]] = r["m"]
        # a cell that lost every member keeps its previous centroid
        # (standard Lloyd's fallback — k never silently shrinks)
        for cid, cv in prev.items():
            by_cell.setdefault(cid, cv)
        cents = spark.createDataFrame(
            [(cid, vec) for cid, vec in sorted(by_cell.items())],
            "cid long, cv array<double>")
    return cents, inertia


def ivf_topk(emb: DataFrame, query_id: int, k: int = 10,
             n_centroids: int = N_CENTROIDS, n_probe: int = N_PROBE,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """ANN: exact cosine restricted to the ``n_probe`` centroid cells
    nearest to the query vector."""
    cents = (emb.filter(F.col(id_col) < n_centroids)
             .select(F.col(id_col).alias("cid"),
                     as_double(vec_col).alias("cv")))
    q = (emb.filter(F.col(id_col) == query_id)
         .select(as_double(vec_col).alias("qv")))
    probe = (cents.crossJoin(F.broadcast(q))
             .select("cid", F.round(cosine("cv", "qv"), 6).alias("sim"))
             .orderBy(F.col("sim").desc(), F.col("cid"))
             .limit(n_probe).select(F.col("cid").alias("cell")))
    cells = ivf_assignments(emb, n_centroids, id_col, vec_col)
    cands = (cells.join(F.broadcast(probe), "cell")
             .filter(F.col(id_col) != query_id).select(id_col))
    return brute_force_topk(
        emb.join(cands.hint("broadcast"), id_col, "left_semi")
           .unionByName(emb.filter(F.col(id_col) == query_id)),
        query_id, k, id_col, vec_col)


def ivf_assignments_sql(sf_table: str, n_centroids: int = N_CENTROIDS,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> str:
    return f"""
    WITH v AS (SELECT {id_col}, {vec_col}::DOUBLE[] AS v FROM {sf_table}),
    c AS (SELECT {id_col} AS cid, v AS cv FROM v WHERE {id_col} < {n_centroids}),
    scored AS (
      SELECT v.{id_col}, c.cid,
             ROUND(list_cosine_similarity(v.v, c.cv), 6) AS sim
      FROM v CROSS JOIN c
    )
    SELECT {id_col}, cid AS cell FROM (
      SELECT {id_col}, cid,
             ROW_NUMBER() OVER (PARTITION BY {id_col}
                                ORDER BY sim DESC, cid) AS rn
      FROM scored
    ) WHERE rn = 1
    """


def neardup_pairs(emb: DataFrame, threshold: float = 0.3, n_planes: int = 8,
                  id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucket candidate generation.

    The scale path of the dedup ladder: instead of the O(n²) all-pairs
    cosine, candidates are restricted to vectors sharing an LSH bucket
    (expected n²/2^planes pair reduction), then scored with exact cosine
    and thresholded. The bucket self-join shuffles both sides on the
    bucket key — uniform by construction (md5-derived hyperplanes), so no
    skew salting is needed. Completes the reference-plus dedup ladder
    (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding-cosine).
    """
    planes = hyperplane_weights(n_planes)
    # per-row norms precomputed (bit-identical; each pair = one dot fold)
    b = (emb.select(F.col(id_col), as_double(vec_col).alias("v"))
         .select(id_col, "v", norm("v").alias("nv"),
                 lsh_bucket("v", planes).alias("bucket")))
    a = b.select("bucket", F.col(id_col).alias("id_a"),
                 F.col("v").alias("va"), F.col("nv").alias("na"))
    c = b.select("bucket", F.col(id_col).alias("id_b"),
                 F.col("v").alias("vb"), F.col("nv").alias("nb"))
    return (a.join(c, "bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b",
                    F.round(dot("va", "vb")
                            / (F.col("na") * F.col("nb")), 6)
                    .alias("cos_sim"))
            .filter(F.col("cos_sim") >= threshold))


def neardup_pairs_sql(sf_table: str, threshold: float = 0.3, n_planes: int = 8,
                      id_col: str = "vec_id", vec_col: str = "embedding") -> str:
    expr = _bucket_sql_expr("v", hyperplane_weights(n_planes))
    return f"""
    WITH b AS (SELECT {id_col}, {vec_col}::DOUBLE[] AS v FROM {sf_table}),
    bk AS (SELECT {id_col}, v, {expr} AS bucket FROM b)
    SELECT a.{id_col} AS id_a, c.{id_col} AS id_b,
           ROUND(list_cosine_similarity(a.v, c.v), 6) AS cos_sim
    FROM bk a JOIN bk c ON a.bucket = c.bucket AND a.{id_col} < c.{id_col}
    WHERE ROUND(list_cosine_similarity(a.v, c.v), 6) >= {threshold}
    """


def ivf_topk_sql(sf_table: str, query_id: int, k: int = 10,
                 n_centroids: int = N_CENTROIDS, n_probe: int = N_PROBE,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> str:
    """DuckDB oracle for :func:`ivf_topk` — the same three formulas
    (centroid argmax, nprobe probe-cell pick, in-cell brute-force top-k)
    composed as one nested query."""
    return f"""
    WITH v AS (SELECT {id_col}, {vec_col}::DOUBLE[] AS v FROM {sf_table}),
    c AS (SELECT {id_col} AS cid, v AS cv FROM v WHERE {id_col} < {n_centroids}),
    q AS (SELECT v AS qv FROM v WHERE {id_col} = {query_id}),
    probe AS (
      SELECT cid FROM (
        SELECT cid,
               ROW_NUMBER() OVER (
                 ORDER BY ROUND(list_cosine_similarity(cv, qv), 6) DESC, cid
               ) AS rn
        FROM c, q
      ) WHERE rn <= {n_probe}
    ),
    cells AS (
      SELECT {id_col}, cid AS cell FROM (
        SELECT v.{id_col}, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY v.{id_col}
                 ORDER BY ROUND(list_cosine_similarity(v.v, c.cv), 6) DESC, cid
               ) AS rn
        FROM v CROSS JOIN c
      ) WHERE rn = 1
    ),
    cand AS (
      SELECT v.{id_col}, v.v
      FROM v JOIN cells USING ({id_col}) JOIN probe ON cells.cell = probe.cid
      WHERE v.{id_col} <> {query_id}
    ),
    scored AS (
      SELECT {id_col}, ROUND(list_cosine_similarity(v, qv), 6) AS cos_sim
      FROM cand, q
    )
    SELECT {id_col}, cos_sim, rnk FROM (
      SELECT {id_col}, cos_sim,
             ROW_NUMBER() OVER (ORDER BY cos_sim DESC, {id_col}) AS rnk
      FROM scored
    ) WHERE rnk <= {k}
    """


def ann_bucketed_topk_sql(sf_table: str, query_id: int, k: int = 10,
                          n_planes: int = 8, id_col: str = "vec_id",
                          vec_col: str = "embedding") -> str:
    """DuckDB oracle for :func:`ann_bucketed_topk` — bucket assignment,
    query-bucket restriction, then the brute-force top-k formula."""
    expr = _bucket_sql_expr("v", hyperplane_weights(n_planes))
    return f"""
    WITH b AS (SELECT {id_col}, {vec_col}::DOUBLE[] AS v FROM {sf_table}),
    bk AS (SELECT {id_col}, v, {expr} AS bucket FROM b),
    qb AS (SELECT bucket FROM bk WHERE {id_col} = {query_id}),
    q AS (SELECT v AS qv FROM bk WHERE {id_col} = {query_id}),
    cand AS (
      SELECT bk.{id_col}, bk.v FROM bk JOIN qb ON bk.bucket = qb.bucket
      WHERE bk.{id_col} <> {query_id}
    ),
    scored AS (
      SELECT {id_col}, ROUND(list_cosine_similarity(v, qv), 6) AS cos_sim
      FROM cand, q
    )
    SELECT {id_col}, cos_sim, rnk FROM (
      SELECT {id_col}, cos_sim,
             ROW_NUMBER() OVER (ORDER BY cos_sim DESC, {id_col}) AS rnk
      FROM scored
    ) WHERE rnk <= {k}
    """


def ann_bucketed_topk(emb: DataFrame, query_id: int, k: int = 10,
                      n_planes: int = 8, id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """ANN: exact cosine restricted to the query's LSH bucket."""
    b = lsh_buckets(emb, n_planes, id_col, vec_col)
    qb = b.filter(F.col(id_col) == query_id).select("bucket")
    cands = (b.join(F.broadcast(qb), "bucket")
             .filter(F.col(id_col) != query_id).select(id_col))
    return brute_force_topk(emb.join(cands.hint("broadcast"), id_col, "left_semi")
                            .unionByName(emb.filter(F.col(id_col) == query_id)),
                            query_id, k, id_col, vec_col)


# --------------------------------------------------------------------------
# int8 quantization — the embedding storage path
# --------------------------------------------------------------------------

def quantize_int8(emb: DataFrame, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|x| / 127,
    q[i] = trunc(x[i] / scale). 4× smaller than float32 on disk — the
    standard storage/serving trade at 100 TB — with the scale kept
    per-row for dequantization. Pure projection, no shuffle.

    trunc (CAST AS INT) rather than round: truncation toward zero is
    identical in Spark and DuckDB, so the oracle matches bit-for-bit;
    round() ties differ across engines. Zero vectors quantize to zeros
    with scale 0.
    """
    v = as_double(vec_col)
    maxabs = F.expr(
        f"array_max(transform({vec_col}, x -> abs(CAST(x AS DOUBLE))))")
    scale = F.round(maxabs / F.lit(127.0), 9)
    qvec = F.expr(
        "CASE WHEN array_max(transform({v}, x -> abs(CAST(x AS DOUBLE)))) = 0 "
        "THEN transform({v}, x -> CAST(0 AS INT)) "
        "ELSE transform({v}, x -> CAST(CAST(x AS DOUBLE) / "
        "round(array_max(transform({v}, y -> abs(CAST(y AS DOUBLE)))) / 127.0, 9)"
        " AS INT)) END".replace("{v}", vec_col))
    _ = v
    return emb.select(F.col(id_col), scale.alias("scale"),
                      qvec.alias("qvec"))


def quantize_int8_sql(sf_table: str, id_col: str = "vec_id",
                      vec_col: str = "embedding") -> str:
    v = f"{vec_col}::DOUBLE[]"
    maxabs = f"list_max(list_transform({v}, x -> abs(x)))"
    return f"""
    SELECT {id_col},
           ROUND({maxabs} / 127.0, 9) AS scale,
           CASE WHEN {maxabs} = 0
                THEN list_transform({v}, x -> CAST(0 AS INTEGER))
                ELSE list_transform({v}, x ->
                     CAST(TRUNC(x / ROUND({maxabs} / 127.0, 9)) AS INTEGER))
           END AS qvec
    FROM {sf_table}
    """


def random_projection(emb: DataFrame, k: int = 8, id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      max_dim: int = 1024) -> DataFrame:
    """Johnson–Lindenstrauss SIGN projection: y_j = Σ_i v_i · s(i, j),
    s(i, j) = ±1 from the parity of md5('rp:i:j') — data-independent
    dimension reduction (Achlioptas 2001: ±1 entries satisfy the JL
    lemma), the cheap front-end that shrinks d before any
    distance-heavy stage. Pure projection, ZERO shuffle, no trained
    artifact to ship — the matrix derives from the hash formula, so any
    worker (or the DuckDB oracle) regenerates it bit-identically.

    The sign matrix is evaluated at PLAN time and embedded as a k×
    ``max_dim`` literal (Catalyst constant-folds it once): the first
    spelling recomputed md5 inside the fold lambda — there is no CSE
    across rows in HOF lambdas, so that was k·d hashes PER ROW
    (measured 2.5 s for 2 000 vectors at sf0.1; the literal form is
    pure arithmetic). Vectors longer than ``max_dim`` drop with the
    NULL/empty ones — widen the parameter for wider embeddings.

    Cross-engine exactness: each product is quantized to the 1e-12 grid
    — and since a grid value is an exact INTEGER multiple of 1e-12, the
    accumulator sums those integers as BIGINT grid units (cheaper than
    the DECIMAL(28,12) fold this replaced, equally order- and
    engine-independent: integer addition is exact). One conversion at
    the end: y_micro = FLOOR((units + 5·10^5) / 10^6) in floor-division
    arithmetic, evaluated through exactly-representable doubles.
    Overflow/precision bound: |unit term| ≤ max|v_i|·10^12 + 1 must stay
    under 2^53 and the ``max_dim``-term sum under 2^63 — both hold for
    |v_i| ≤ 8 000, far above any normalized embedding. The output lands
    as BIGINT micro-units — one (vec_id, j, y_micro) row per output
    dim, no list cells for the driver canon to choke on.
    """
    import hashlib

    rows = []
    for j in range(k):
        signs = ("-1.0" if int(hashlib.md5(f"rp:{i}:{j}".encode())
                               .hexdigest()[0], 16) % 2 else "1.0"
                 for i in range(max_dim))
        rows.append("array(" + ",".join(signs) + ")")
    s_lit = "array(" + ",".join(rows) + ")"
    term = (f"CAST(FLOOR(CAST(element_at({vec_col}, i + 1) AS DOUBLE)"
            f" * element_at(element_at(_rp_s, j + 1), i + 1)"
            f" * 1000000000000 + 0.5) AS BIGINT)")
    proj = (f"transform(sequence(0, {k - 1}), j ->"
            f" CAST(FLOOR((CAST(aggregate(sequence(0, size({vec_col}) - 1),"
            f" CAST(0 AS BIGINT),"
            f" (acc, i) -> acc + ({term}))"
            f" AS DOUBLE) + 500000) / 1000000) AS BIGINT))")
    # LOUD guard on the documented exactness bound: past |v_i| = 8000
    # the BIGINT grid units would wrap SILENTLY on Spark while DuckDB's
    # HUGEINT SUM would not — a runtime cross-engine divergence. The
    # assert lives inside the projected expression (a standalone column
    # would be pruned away), evaluated once per row.
    # NULL-safe: predicate subexpression elimination can evaluate this
    # BEFORE the null-dropping filter short-circuits (the collapsed
    # Filter node hoists common subexprs), so a NULL vector must make
    # the guard TRUE, not assert_true(NULL) → error
    bound = (f"({vec_col} IS NULL OR"
             f" aggregate({vec_col}, TRUE, (ok, x) -> ok AND"
             f" (x IS NULL OR abs(CAST(x AS DOUBLE)) <= 8000.0D)))")
    guarded = (f"CASE WHEN assert_true({bound}, 'random_projection:"
               f" |v_i| exceeds the 8000 exactness bound (BIGINT grid"
               f" units would overflow)') IS NULL THEN {proj} END")
    return (emb.filter(F.expr(f"{vec_col} IS NOT NULL"
                              f" AND size({vec_col}) BETWEEN 1"
                              f" AND {max_dim}"))
            .withColumn("_rp_s", F.expr(s_lit))
            .select(F.col(id_col), F.expr(guarded).alias("proj"))
            .selectExpr(id_col, "posexplode(proj) AS (j, y_micro)"))


def random_projection_sql(table: str, k: int = 8, id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          max_dim: int = 1024) -> str:
    """DuckDB oracle for :func:`random_projection` — the same ±1 md5
    matrix and BIGINT 1e-12-grid-unit summation spelled relationally
    (integer sums are exact, so parallel SUM order cannot perturb
    them; the HUGEINT SUM result is ≤ ~10^15, exactly representable
    through the DOUBLE conversion); the md5 here is the SOURCE of the
    Spark side's constant-folded literal, so a generator bug in either
    spelling hash-mismatches."""
    sign = ("(CASE WHEN ('0x' || substr(md5('rp:' ||"
            " CAST(i.i AS VARCHAR) || ':' || CAST(j.j AS VARCHAR)),"
            " 1, 1))::UBIGINT % 2 = 1 THEN -1.0 ELSE 1.0 END)")
    return f"""
    WITH base AS (
      SELECT {id_col}, {vec_col}::DOUBLE[] AS v FROM {table}
      WHERE {vec_col} IS NOT NULL
        AND len({vec_col}) BETWEEN 1 AND {max_dim}
    ),
    terms AS (
      SELECT {id_col}, j.j,
             CAST(FLOOR(v[i.i + 1] * {sign} * 1000000000000 + 0.5)
                 AS BIGINT) AS term
      FROM base,
           LATERAL (SELECT unnest(generate_series(0, {k - 1})) AS j) j,
           LATERAL (SELECT unnest(generate_series(0, len(v) - 1)) AS i) i
    )
    SELECT {id_col}, CAST(j AS INTEGER) AS j,
           CAST(FLOOR((CAST(SUM(term) AS DOUBLE) + 500000) / 1000000)
                AS BIGINT) AS y_micro
    FROM terms GROUP BY {id_col}, j
    """


# --------------------------------------------------------------------------
# k-NN graph + semantic dedup (SemDeDup) — the embedding-side corpus ops
# --------------------------------------------------------------------------

def auto_n_planes(n_rows: int,
                  target_bucket_size: int = TARGET_CELL_SIZE) -> int:
    """Hyperplane count so 2^p buckets keep ~``target_bucket_size`` rows
    each — the LSH analogue of :func:`auto_n_centroids` (the in-bucket
    self-join is the quadratic piece, bounded only if buckets multiply
    with the corpus). Floor of 8 planes preserves recall on small data."""
    import math
    n_rows = max(int(n_rows), 1)
    return max(8, math.ceil(math.log2(max(n_rows / target_bucket_size, 1))))


def knn_graph(emb: DataFrame, k: int = 3, n_planes: int | None = None,
              id_col: str = "vec_id", vec_col: str = "embedding",
              n_rows: int | None = None) -> DataFrame:
    """Per-vector k nearest neighbors WITHIN the vector's LSH bucket —
    the distributed k-NN-graph primitive (inputs to SemDeDup, graph-based
    curation, label propagation).

    Scale shape: one shuffle on the bucket key for the self-join (uniform
    by construction — md5-derived hyperplanes), then a per-id window over
    only in-bucket candidates (bounded by bucket size, never n). The
    O(n²) alternative — a global cross join + per-id window — is exactly
    what this avoids; recall is the LSH trade, tunable via n_planes.
    ``n_planes`` defaults to the corpus-derived :func:`auto_n_planes`
    (bounded buckets at any n); certified queries pass a fixed count for
    oracle determinism. Pass ``n_rows`` (an exact or approximate corpus
    size the caller already knows — catalog stats, a prior stage's
    count) to avoid the sizing pass entirely: at 100 TB an extra full
    count() action just to pick a parameter is a real cost, and any
    estimate within ~2x lands the same bucket-size ballpark.
    """
    if n_planes is None:
        n_planes = auto_n_planes(emb.count() if n_rows is None else n_rows)
    planes = hyperplane_weights(n_planes)
    # norms precomputed ONCE per row (bit-identical to per-pair norm():
    # the same double either way), so each pair costs one dot, not 3 folds
    b = (emb.select(F.col(id_col), as_double(vec_col).alias("v"))
         .select(id_col, "v", norm("v").alias("nv"),
                 lsh_bucket("v", planes).alias("bucket")))
    a = b.select("bucket", F.col(id_col).alias("src"),
                 F.col("v").alias("va"), F.col("nv").alias("na"))
    c = b.select("bucket", F.col(id_col).alias("dst"),
                 F.col("v").alias("vb"), F.col("nv").alias("nb"))
    scored = (a.join(c, "bucket")
              .filter(F.col("src") != F.col("dst"))
              .select("src", "dst",
                      F.round(dot("va", "vb")
                              / (F.col("na") * F.col("nb")), 6)
                      .alias("cos_sim")))
    w = Window.partitionBy("src").orderBy(F.col("cos_sim").desc(),
                                          F.col("dst"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k))


def knn_graph_sql(sf_table: str, k: int = 3, n_planes: int = 8,
                  id_col: str = "vec_id", vec_col: str = "embedding") -> str:
    expr = _bucket_sql_expr("v", hyperplane_weights(n_planes))
    return f"""
    WITH b AS (SELECT {id_col}, {vec_col}::DOUBLE[] AS v FROM {sf_table}),
    bk AS (SELECT {id_col}, v, {expr} AS bucket FROM b),
    scored AS (
      SELECT a.{id_col} AS src, c.{id_col} AS dst,
             ROUND(list_cosine_similarity(a.v, c.v), 6) AS cos_sim
      FROM bk a JOIN bk c ON a.bucket = c.bucket
      WHERE a.{id_col} <> c.{id_col}
    )
    SELECT src, dst, cos_sim, rnk FROM (
      SELECT src, dst, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY src
                                ORDER BY cos_sim DESC, dst) AS rnk
      FROM scored
    ) WHERE rnk <= {k}
    """


def semantic_dedup_keep(emb: DataFrame, threshold: float = 0.3,
                        n_centroids: int | None = None,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        n_rows: int | None = None) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster embeddings,
    then inside each cluster drop every vector that has an above-threshold
    cosine neighbor with a smaller id (the kept one) — semantic duplicates
    collapse to one representative without any cross-cluster comparison.

    Dataflow: deterministic IVF cell assignment (broadcast k·d centroids,
    one narrow pass) → within-cell self-join (single shuffle on the cell
    key) → exact cosine threshold → anti-join the losers. At 100 TB the
    within-cell join is the only quadratic piece, bounded by cell size —
    exactly how the paper shards the problem (k scales with corpus size).
    """
    # k defaults to CORPUS-DERIVED (auto_n_centroids): the in-cell
    # quadratic is bounded only if k grows with n. Certified queries pass
    # a fixed k so the unrolled oracle SQL stays deterministic. Callers
    # that already know the corpus size (exactly or within ~2x) pass
    # n_rows and skip the sizing count() action — at 100 TB that extra
    # full pass is a real cost for a parameter an estimate serves.
    if n_centroids is None:
        n_centroids = auto_n_centroids(emb.count() if n_rows is None
                                       else n_rows)
    # cell ids stay a SKINNY (id, cell) frame and re-join the vectors:
    # measured faster than carrying the 64-dim arrays through the argmax
    # shuffle (AQE broadcasts the skinny side of the re-join). The frame
    # feeds TWO branches (the vector re-join and the final anti-join) —
    # cut it so the corpus-scale centroid argmax runs once (guide §3.3;
    # r13 interleaved A/B: flat-to-slightly-better locally, one fewer
    # full corpus pass structurally)
    cells = lineage_cut(ivf_assignments(emb, n_centroids, id_col,
                                        vec_col))
    v = (emb.select(F.col(id_col), as_double(vec_col).alias("v"))
         .select(id_col, "v", norm("v").alias("nv"))
         .join(cells, id_col))
    a = v.select("cell", F.col(id_col).alias("id_a"),
                 F.col("v").alias("va"), F.col("nv").alias("na"))
    b = v.select("cell", F.col(id_col).alias("id_b"),
                 F.col("v").alias("vb"), F.col("nv").alias("nb"))
    drop = (a.join(b, "cell")
            .filter(F.col("id_a") < F.col("id_b"))
            .filter(F.round(dot("va", "vb")
                            / (F.col("na") * F.col("nb")), 6) >= threshold)
            .select(F.col("id_b").alias(id_col))
            .distinct())
    return (cells.join(drop, id_col, "left_anti")
            .select(id_col, "cell"))


def semantic_dedup_sql(sf_table: str, threshold: float = 0.3,
                       n_centroids: int = N_CENTROIDS,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> str:
    return f"""
    WITH v AS (SELECT {id_col}, {vec_col}::DOUBLE[] AS v FROM {sf_table}),
    c AS (SELECT {id_col} AS cid, v AS cv FROM v WHERE {id_col} < {n_centroids}),
    cells AS (
      SELECT {id_col}, cid AS cell FROM (
        SELECT v.{id_col}, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY v.{id_col}
                 ORDER BY ROUND(list_cosine_similarity(v.v, c.cv), 6) DESC, cid
               ) AS rn
        FROM v CROSS JOIN c
      ) WHERE rn = 1
    ),
    vc AS (SELECT v.{id_col}, v.v, cells.cell
           FROM v JOIN cells USING ({id_col})),
    drop_ids AS (
      SELECT DISTINCT b.{id_col}
      FROM vc a JOIN vc b ON a.cell = b.cell AND a.{id_col} < b.{id_col}
      WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= {threshold}
    )
    SELECT {id_col}, cell FROM cells
    WHERE {id_col} NOT IN (SELECT {id_col} FROM drop_ids)
    """


def embed_outliers(emb: DataFrame, per_cell: int = 3,
                   n_centroids: int | None = None,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   n_rows: int | None = None) -> DataFrame:
    """The ``per_cell`` vectors FARTHEST from their IVF cell centroid —
    embedding-space outlier detection (mislabeled/garbage rows cluster
    badly; curation drops or reviews them).

    The ranking window is per cell (bounded), never global; the centroid
    re-join is the same broadcast as assignment. Exact-rank selection
    (row_number), not percentile interpolation, so the oracle matches
    bit-for-bit. ``n_centroids`` defaults to the corpus-derived
    :func:`auto_n_centroids` (bounded cells at any n); certified queries
    pass a fixed k for oracle determinism. ``n_rows`` (exact or ~2x
    estimate) skips the sizing count() action — see
    :func:`semantic_dedup_keep`.
    """
    if n_centroids is None:
        n_centroids = auto_n_centroids(emb.count() if n_rows is None
                                       else n_rows)
    cents = (emb.filter(F.col(id_col) < n_centroids)
             .select(F.col(id_col).alias("cid"),
                     as_double(vec_col).alias("cv")))
    cells = ivf_assignments(emb, n_centroids, id_col, vec_col)
    scored = (emb.select(F.col(id_col), as_double(vec_col).alias("v"))
              .join(cells, id_col)
              .join(F.broadcast(cents), F.col("cell") == F.col("cid"))
              .select(id_col, "cell",
                      F.round(cosine("v", "cv"), 6).alias("centroid_sim")))
    w = Window.partitionBy("cell").orderBy(F.col("centroid_sim").asc(),
                                           F.col(id_col))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= per_cell))


def embed_outliers_sql(sf_table: str, per_cell: int = 3,
                       n_centroids: int = N_CENTROIDS,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> str:
    return f"""
    WITH v AS (SELECT {id_col}, {vec_col}::DOUBLE[] AS v FROM {sf_table}),
    c AS (SELECT {id_col} AS cid, v AS cv FROM v WHERE {id_col} < {n_centroids}),
    cells AS (
      SELECT {id_col}, cid AS cell FROM (
        SELECT v.{id_col}, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY v.{id_col}
                 ORDER BY ROUND(list_cosine_similarity(v.v, c.cv), 6) DESC, cid
               ) AS rn
        FROM v CROSS JOIN c
      ) WHERE rn = 1
    ),
    scored AS (
      SELECT v.{id_col}, cells.cell,
             ROUND(list_cosine_similarity(v.v, c.cv), 6) AS centroid_sim
      FROM v JOIN cells USING ({id_col}) JOIN c ON cells.cell = c.cid
    )
    SELECT {id_col}, cell, centroid_sim, rnk FROM (
      SELECT {id_col}, cell, centroid_sim,
             ROW_NUMBER() OVER (PARTITION BY cell
                                ORDER BY centroid_sim ASC, {id_col}) AS rnk
      FROM scored
    ) WHERE rnk <= {per_cell}
    """


# --------------------------------------------------------------------------
# Product quantization — the compressed-codebook storage path (IVF-PQ)
# --------------------------------------------------------------------------

N_SUBVECTORS = 8
PQ_CODEBOOK = 16


def pq_codes(emb: DataFrame, n_sub: int = N_SUBVECTORS,
             n_codes: int = PQ_CODEBOOK, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """Product-quantization codes: split each vector into ``n_sub``
    subvectors; each subvector stores only the id of its nearest codebook
    entry (squared-L2, deterministic seed codebook = the first
    ``n_codes`` vectors' subvectors). 64-dim float32 → 8 bytes: the
    512 GB-of-raw-embeddings-per-TB-of-text problem becomes 8 GB.

    Dataflow: melt to (id, sub, subvec) — a narrow explode — then a
    broadcast join against the (n_sub × n_codes)-row codebook and a
    min_by argmin per (id, sub); re-assemble codes with one groupBy on
    id. Two shuffles total (argmin agg + reassembly), both on uniform
    keys. Distances use raw double arithmetic (no sqrt), 6dp-rounded for
    cross-engine comparison stability.
    """
    sub_expr = F.expr(
        f"explode(transform(sequence(0, {n_sub - 1}),"
        f" s -> struct(s AS sub, slice(v, s * size(v) div {n_sub} + 1,"
        f" size(v) div {n_sub}) AS sv)))")
    melted = (emb.select(F.col(id_col), as_double(vec_col).alias("v"))
              .select(id_col, sub_expr.alias("m"))
              .select(id_col, "m.sub", "m.sv"))
    book = (melted.filter(F.col(id_col) < n_codes)
            .select(F.col(id_col).alias("code"), F.col("sub").alias("bsub"),
                    F.col("sv").alias("bv")))
    d2 = F.expr("aggregate(zip_with(sv, bv, (x, y) -> (x - y) * (x - y)),"
                " CAST(0 AS DOUBLE), (acc, x) -> acc + x)")
    assigned = (melted.join(F.broadcast(book), F.col("sub") == F.col("bsub"))
                .select(id_col, "sub",
                        F.round(d2, 6).alias("d2"), "code")
                .groupBy(id_col, "sub")
                .agg(F.expr("min_by(code, struct(d2, code))").alias("code")))
    return (assigned.groupBy(id_col)
            .agg(F.expr("transform(array_sort(collect_list(struct(sub, code))),"
                        " p -> p.code)").alias("codes")))


def pq_codes_sql(sf_table: str, n_sub: int = N_SUBVECTORS,
                 n_codes: int = PQ_CODEBOOK, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> str:
    return f"""
    WITH v AS (SELECT {id_col}, {vec_col}::DOUBLE[] AS v FROM {sf_table}),
    melted AS (
      SELECT {id_col}, s.sub,
             v.v[s.sub * (len(v.v) // {n_sub}) + 1 :
                 (s.sub + 1) * (len(v.v) // {n_sub})] AS sv
      FROM v, (SELECT unnest(generate_series(0, {n_sub - 1})) AS sub) s
    ),
    book AS (
      SELECT {id_col} AS code, sub AS bsub, sv AS bv
      FROM melted WHERE {id_col} < {n_codes}
    ),
    assigned AS (
      SELECT {id_col}, sub, code FROM (
        SELECT m.{id_col}, m.sub, b.code,
               ROW_NUMBER() OVER (
                 PARTITION BY m.{id_col}, m.sub
                 ORDER BY ROUND(list_sum(list_transform(
                   list_zip(m.sv, b.bv), p -> (p[1] - p[2]) * (p[1] - p[2])
                 )), 6) ASC, b.code ASC) AS rn
        FROM melted m JOIN book b ON m.sub = b.bsub
      ) WHERE rn = 1
    )
    SELECT {id_col}, list(code ORDER BY sub) AS codes
    FROM assigned GROUP BY {id_col}
    """


def pq_topk(emb: DataFrame, query_id: int, k: int = 10,
            n_sub: int = N_SUBVECTORS, n_codes: int = PQ_CODEBOOK,
            id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Top-k served FROM the compressed PQ codes: reconstruct each vector
    as the concatenation of its codebook entries, then exact cosine of
    the (uncompressed) query against the reconstructions — the
    asymmetric-distance serving path of IVF-PQ, where the corpus lives as
    8-byte codes and only the codebook (n_sub × n_codes subvectors, KBs)
    is broadcast.

    Ranking error vs exact search is the quantization error — the
    recall/storage trade the codes buy. Same TakeOrderedAndProject top-k
    shape as :func:`brute_force_topk` (no global sort).
    """
    codes = pq_codes(emb, n_sub, n_codes, id_col, vec_col)
    melted = (emb.select(F.col(id_col), as_double(vec_col).alias("v"))
              .select(id_col, F.expr(
                  f"explode(transform(sequence(0, {n_sub - 1}),"
                  f" s -> struct(s AS sub, slice(v, s * size(v) div {n_sub} + 1,"
                  f" size(v) div {n_sub}) AS sv)))").alias("m"))
              .select(id_col, "m.sub", "m.sv"))
    book = (melted.filter(F.col(id_col) < n_codes)
            .select(F.col(id_col).alias("code"), F.col("sub").alias("bsub"),
                    F.col("sv").alias("bv")))
    recon = (codes.select(F.col(id_col),
                          F.posexplode("codes").alias("sub", "pcode"))
             .join(F.broadcast(book),
                   (F.col("sub") == F.col("bsub"))
                   & (F.col("pcode") == F.col("code")))
             .select(id_col, "sub", "bv")
             .groupBy(id_col)
             .agg(F.expr("flatten(transform(array_sort(collect_list("
                         "struct(sub, bv))), p -> p.bv))").alias("rv")))
    q = (emb.filter(F.col(id_col) == query_id)
         .select(as_double(vec_col).alias("qv")))
    scored = (recon.filter(F.col(id_col) != query_id)
              .crossJoin(F.broadcast(q))
              .select(id_col, F.round(cosine("rv", "qv"), 6).alias("cos_sim")))
    order = [F.col("cos_sim").desc(), F.col(id_col)]
    top = scored.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return top.withColumn("rnk", F.row_number().over(w))


def pq_topk_sql(sf_table: str, query_id: int, k: int = 10,
                n_sub: int = N_SUBVECTORS, n_codes: int = PQ_CODEBOOK,
                id_col: str = "vec_id", vec_col: str = "embedding") -> str:
    return f"""
    WITH v AS (SELECT {id_col}, {vec_col}::DOUBLE[] AS v FROM {sf_table}),
    melted AS (
      SELECT {id_col}, s.sub,
             v.v[s.sub * (len(v.v) // {n_sub}) + 1 :
                 (s.sub + 1) * (len(v.v) // {n_sub})] AS sv
      FROM v, (SELECT unnest(generate_series(0, {n_sub - 1})) AS sub) s
    ),
    book AS (
      SELECT {id_col} AS code, sub AS bsub, sv AS bv
      FROM melted WHERE {id_col} < {n_codes}
    ),
    assigned AS (
      SELECT {id_col}, sub, code FROM (
        SELECT m.{id_col}, m.sub, b.code,
               ROW_NUMBER() OVER (
                 PARTITION BY m.{id_col}, m.sub
                 ORDER BY ROUND(list_sum(list_transform(
                   list_zip(m.sv, b.bv), p -> (p[1] - p[2]) * (p[1] - p[2])
                 )), 6) ASC, b.code ASC) AS rn
        FROM melted m JOIN book b ON m.sub = b.bsub
      ) WHERE rn = 1
    ),
    recon AS (
      SELECT a.{id_col},
             flatten(list(b.bv ORDER BY a.sub)) AS rv
      FROM assigned a JOIN book b ON a.sub = b.bsub AND a.code = b.code
      GROUP BY a.{id_col}
    ),
    q AS (SELECT v AS qv FROM v WHERE {id_col} = {query_id}),
    scored AS (
      SELECT {id_col}, ROUND(list_cosine_similarity(rv, qv), 6) AS cos_sim
      FROM recon, q WHERE {id_col} <> {query_id}
    )
    SELECT {id_col}, cos_sim, rnk FROM (
      SELECT {id_col}, cos_sim,
             ROW_NUMBER() OVER (ORDER BY cos_sim DESC, {id_col}) AS rnk
      FROM scored
    ) WHERE rnk <= {k}
    """


def _probe_masks(n_planes: int, radius: int = 2) -> list[int]:
    """XOR masks for every bucket within Hamming distance ``radius`` of
    the query bucket (multi-probe LSH, Lv et al. VLDB'07): 1 + 8 + 28 =
    37 masks at radius 2 over 8 planes. Supports arbitrary radius via
    bit-combinations (sum of C(n_planes, r) for r <= radius masks)."""
    import itertools

    masks = []
    for r in range(min(radius, n_planes) + 1):
        for bits in itertools.combinations(range(n_planes), r):
            masks.append(sum(1 << i for i in bits))
    return masks


def ann_multiprobe_topk(emb: DataFrame, query_id: int, k: int = 10,
                        n_planes: int = 8, radius: int = 2,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Multi-probe LSH ANN: exact cosine over every bucket within
    Hamming distance ``radius`` of the query's bucket — the standard
    recall lever for hyperplane LSH (neighbors that fall just across one
    or two hyperplanes land in adjacent buckets; single-bucket probing
    misses them). Radius 2 probes 37 of 256 buckets (~14 % of the corpus
    in expectation) instead of 1/256, trading a bounded scan increase
    for a large recall gain (measured in tools/recall_probe.py).
    """
    b = lsh_buckets(emb, n_planes, id_col, vec_col)
    qb = b.filter(F.col(id_col) == query_id).select("bucket")
    masks = ", ".join(str(m) for m in _probe_masks(n_planes, radius))
    probes = qb.select(F.explode(F.expr(
        f"transform(array({masks}), m -> int(bucket) ^ m)")).alias("bucket"))
    cands = (b.join(F.broadcast(probes), "bucket")
             .filter(F.col(id_col) != query_id).select(id_col))
    return brute_force_topk(
        emb.join(cands.hint("broadcast"), id_col, "left_semi")
           .unionByName(emb.filter(F.col(id_col) == query_id)),
        query_id, k, id_col, vec_col)


def ann_multiprobe_topk_sql(sf_table: str, query_id: int, k: int = 10,
                            n_planes: int = 8, radius: int = 2,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> str:
    expr = _bucket_sql_expr("v", hyperplane_weights(n_planes))
    masks = ", ".join(str(m) for m in _probe_masks(n_planes, radius))
    return f"""
    WITH b AS (SELECT {id_col}, {vec_col}::DOUBLE[] AS v FROM {sf_table}),
    bk AS (SELECT {id_col}, v, {expr} AS bucket FROM b),
    qb AS (SELECT bucket FROM bk WHERE {id_col} = {query_id}),
    probes AS (
      SELECT DISTINCT xor(qb.bucket::BIGINT, m.m::BIGINT) AS bucket
      FROM qb, (SELECT unnest([{masks}]) AS m) m
    ),
    q AS (SELECT v AS qv FROM bk WHERE {id_col} = {query_id}),
    cand AS (
      SELECT bk.{id_col}, bk.v FROM bk JOIN probes ON bk.bucket = probes.bucket
      WHERE bk.{id_col} <> {query_id}
    ),
    scored AS (
      SELECT {id_col}, ROUND(list_cosine_similarity(v, qv), 6) AS cos_sim
      FROM cand, q
    )
    SELECT {id_col}, cos_sim, rnk FROM (
      SELECT {id_col}, cos_sim,
             ROW_NUMBER() OVER (ORDER BY cos_sim DESC, {id_col}) AS rnk
      FROM scored
    ) WHERE rnk <= {k}
    """


def kmeans_one_step(emb: DataFrame, k: int = N_CENTROIDS,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """ONE Lloyd iteration, value-level certifiable: assign every vector
    to its max-cosine seed centroid, then the element-wise mean per
    (cell, dim) as rows — exactly the update step :func:`kmeans_fit`
    loops, with the reduction made order-independent (exact decimal sum /
    count) so the oracle hash-matches. The iterative trainer itself stays
    rows-only (loops are not SQL-expressible); this query certifies its
    per-round dataflow at value level.
    """
    cells = ivf_assignments(emb, k, id_col, vec_col)
    v = (emb.select(F.col(id_col), as_double(vec_col).alias("v"))
         .join(cells, id_col))
    return (v.select("cell", F.posexplode("v").alias("dim", "x"))
            .groupBy("cell", "dim")
            .agg(F.expr("CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE)"
                        " / COUNT(x)").alias("m")))


def kmeans_one_step_sql(sf_table: str, k: int = N_CENTROIDS,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> str:
    return f"""
    WITH v AS (SELECT {id_col}, {vec_col}::DOUBLE[] AS v FROM {sf_table}),
    c AS (SELECT {id_col} AS cid, v AS cv FROM v WHERE {id_col} < {k}),
    cells AS (
      SELECT {id_col}, cid AS cell FROM (
        SELECT v.{id_col}, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY v.{id_col}
                 ORDER BY ROUND(list_cosine_similarity(v.v, c.cv), 6) DESC, cid
               ) AS rn
        FROM v CROSS JOIN c
      ) WHERE rn = 1
    ),
    melted AS (
      SELECT cells.cell, d.dim - 1 AS dim, v.v[d.dim] AS x
      FROM v JOIN cells USING ({id_col}),
           (SELECT unnest(generate_series(1, 64)) AS dim) d
    )
    SELECT cell, dim,
           CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(x) AS m
    FROM melted GROUP BY cell, dim
    """


def kmeans_ivf_sql(sf_table: str, k: int = N_CENTROIDS, iters: int = 3,
                   dims: int = 64, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> str:
    """Lloyd's unrolled as ``iters`` nested CTE rounds, then the final
    cell assignment — the value-level oracle for :func:`kmeans_fit` +
    :func:`ivf_assignments`. Deterministic seeds (first k vectors),
    exact-decimal means, and 6dp-rounded cosine argmax make each round
    bit-reproducible, so the "iterative" trainer is fully certifiable for
    a fixed iteration count. Empty cells keep their previous centroid
    (COALESCE), mirroring the trainer's Lloyd fallback."""
    ctes = [
        f"v AS (SELECT {id_col}, {vec_col}::DOUBLE[] AS v FROM {sf_table})",
        f"c0 AS (SELECT {id_col} AS cid, v AS cv FROM v WHERE {id_col} < {k})",
    ]
    for i in range(iters):
        prev, nxt = f"c{i}", f"c{i + 1}"
        ctes.append(f"""a{i + 1} AS (
      SELECT {id_col}, cid AS cell FROM (
        SELECT v.{id_col}, {prev}.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY v.{id_col}
                 ORDER BY ROUND(list_cosine_similarity(v.v, {prev}.cv), 6)
                          DESC, cid) AS rn
        FROM v CROSS JOIN {prev}
      ) WHERE rn = 1
    )""")
        ctes.append(f"""{nxt} AS (
      SELECT c.cid, COALESCE(mm.cv, c.cv) AS cv
      FROM {prev} c LEFT JOIN (
        SELECT cell AS cid, list(m ORDER BY dim) AS cv FROM (
          SELECT a.cell, d.dim,
                 CAST(SUM(CAST(v.v[d.dim] AS DECIMAL(28,12))) AS DOUBLE)
                 / COUNT(v.v[d.dim]) AS m
          FROM v JOIN a{i + 1} a USING ({id_col}),
               (SELECT unnest(generate_series(1, {dims})) AS dim) d
          GROUP BY a.cell, d.dim
        ) GROUP BY cell
      ) mm USING (cid)
    )""")
    final = f"c{iters}"
    return "WITH " + ",\n    ".join(ctes) + f"""
    SELECT {id_col}, cell FROM (
      SELECT v.{id_col}, {final}.cid AS cell,
             ROW_NUMBER() OVER (
               PARTITION BY v.{id_col}
               ORDER BY ROUND(list_cosine_similarity(v.v, {final}.cv), 6)
                        DESC, {final}.cid) AS rn
      FROM v CROSS JOIN {final}
    ) WHERE rn = 1
    """


# --------------------------------------------------------------------------
# Persisted IVF index: build once, serve many (the 100 TB lifecycle)
# --------------------------------------------------------------------------

def build_ivf_index(emb: DataFrame, path: str,
                    n_centroids: int = N_CENTROIDS,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> None:
    """Materialize the IVF index to disk: vectors PARTITIONED BY cell +
    the centroid table.

    Inline :func:`ivf_topk` recomputes assignments per query; a serving
    deployment builds the index ONCE and amortizes it over every query.
    Partitioning the vector table by cell turns the nprobe restriction
    into parquet PARTITION PRUNING — a query physically reads
    nprobe/n_centroids of the corpus, which is the entire point of IVF
    at 100 TB (verified by the PartitionFilters plan test).
    """
    cells = ivf_assignments(emb, n_centroids, id_col, vec_col)
    indexed = emb.join(cells, id_col)
    w = indexed.write.mode("overwrite")
    # a partitionBy write of an EMPTY frame emits no data files at all
    # (unreadable without a schema); fall back to a flat empty write so
    # the index stays readable — both layouts load via read.parquet
    if indexed.head(1):
        w = w.partitionBy("cell")
    w.parquet(f"{path}/vectors")
    (emb.filter(F.col(id_col) < n_centroids)
     .select(F.col(id_col).alias("cid"), as_double(vec_col).alias("cv"))
     .write.mode("overwrite").parquet(f"{path}/centroids"))


def ivf_topk_from_index(spark, path: str, query_id: int, k: int = 10,
                        n_probe: int = N_PROBE,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Serve exact-cosine top-k from a :func:`build_ivf_index` artifact,
    reading ONLY the ``n_probe`` nearest cells (partition-pruned scan).

    The probe-cell selection collects ``n_probe`` cell ids to the driver
    — metadata-sized, like the k·d centroid reads in kmeans_fit — so the
    cell predicate is a literal IN-list that Spark resolves against the
    partition index WITHOUT touching data files of other cells. Result
    matches inline :func:`ivf_topk` exactly (parity-tested): same cells,
    same candidates, same 6dp-rounded ranking.
    """
    cents = spark.read.parquet(f"{path}/centroids")
    vectors = spark.read.parquet(f"{path}/vectors")
    q = (vectors.filter(F.col(id_col) == query_id)
         .select(as_double(vec_col).alias("qv")))
    probe_rows = (cents.crossJoin(F.broadcast(q))
                  .select("cid", F.round(cosine("cv", "qv"), 6).alias("sim"))
                  .orderBy(F.col("sim").desc(), F.col("cid"))
                  .limit(n_probe).collect())           # n_probe ids — metadata
    probe_cells = [r["cid"] for r in probe_rows]
    cands = (vectors.filter(F.col("cell").isin(probe_cells))
             .unionByName(vectors.filter(F.col(id_col) == query_id))
             .select(id_col, vec_col).dropDuplicates([id_col]))
    return brute_force_topk(cands, query_id, k, id_col, vec_col)


# --------------------------------------------------------------------------
# Modern serving compressions: Matryoshka prefixes, 1-bit sign quantization
# --------------------------------------------------------------------------

def matryoshka_topk(emb: DataFrame, query_id: int, k: int = 10,
                    prefix_dims: int = 16, rerank: int = 50,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Two-stage MRL serving (Kusupati et al. 2022): rank by cosine over
    the FIRST ``prefix_dims`` dimensions (cheap scan — at serving scale
    the prefix is a separate, 4× smaller column), keep ``rerank``
    candidates, then exact full-vector rerank to the final top-k.

    The candidate stage's coarse scores order differently from the full
    scores — that is the point; correctness of the final list only needs
    the true top-k inside the rerank window (recall knob = ``rerank``).
    Both stages are TakeOrderedAndProject; no global sort.
    """
    short = (emb.select(F.col(id_col),
                        F.slice(as_double(vec_col), 1, prefix_dims)
                        .alias("_pv")))
    q = (short.filter(F.col(id_col) == query_id)
         .select(F.col("_pv").alias("_qpv")))
    coarse = (short.filter(F.col(id_col) != query_id)
              .crossJoin(F.broadcast(q))
              .select(id_col, F.round(cosine("_pv", "_qpv"), 6).alias("_cs"))
              .orderBy(F.col("_cs").desc(), F.col(id_col))
              .limit(rerank)
              .select(id_col))
    cands = (emb.join(F.broadcast(coarse), id_col, "left_semi")
             .unionByName(emb.filter(F.col(id_col) == query_id)))
    return brute_force_topk(cands, query_id, k, id_col, vec_col)


def matryoshka_topk_sql(sf_table: str, query_id: int, k: int = 10,
                        prefix_dims: int = 16, rerank: int = 50,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> str:
    return f"""
    WITH short AS (
      SELECT {id_col}, ({vec_col}::DOUBLE[])[1:{prefix_dims}] AS pv
      FROM {sf_table}
    ),
    q AS (SELECT pv AS qpv FROM short WHERE {id_col} = {query_id}),
    coarse AS (
      SELECT {id_col}
      FROM (SELECT s.{id_col},
                   ROW_NUMBER() OVER (
                     ORDER BY ROUND(list_cosine_similarity(s.pv, q.qpv), 6)
                       DESC, s.{id_col}) AS crn
            FROM short s CROSS JOIN q WHERE s.{id_col} <> {query_id})
      WHERE crn <= {rerank}
    ),
    cands AS (
      SELECT e.* FROM {sf_table} e SEMI JOIN coarse USING ({id_col})
      UNION ALL
      SELECT * FROM {sf_table} WHERE {id_col} = {query_id}
    ),
    qv AS (SELECT {vec_col}::DOUBLE[] AS qv FROM {sf_table}
           WHERE {id_col} = {query_id}),
    scored AS (
      SELECT {id_col},
             ROUND(list_cosine_similarity({vec_col}::DOUBLE[], qv), 6)
               AS cos_sim
      FROM cands, qv WHERE {id_col} <> {query_id}
    )
    SELECT {id_col}, cos_sim, rnk FROM (
      SELECT {id_col}, cos_sim,
             ROW_NUMBER() OVER (ORDER BY cos_sim DESC, {id_col}) AS rnk
      FROM scored
    ) WHERE rnk <= {k}
    """


def _sign_pack(vec_col: str, lo: int, hi: int) -> str:
    """Spark SQL expr packing sign bits of dims [lo, hi) into one BIGINT."""
    bits = " + ".join(
        f"(CASE WHEN element_at({vec_col}, {i + 1}) > 0"
        f" THEN {1 << (i - lo)} ELSE 0 END)" for i in range(lo, hi))
    return f"CAST({bits} AS BIGINT)"


def binary_signature(vec_col: str, dims: int = DIMS) -> list[Column]:
    """Sign signature as TWO 32-bit halves (bit 63 of a single signed
    BIGINT would overflow): bit i set iff v[i] > 0 — 1-bit-per-dim
    quantization (32× smaller than float32 at d=64·4B). Integer-exact,
    engine-independent."""
    half = dims // 2
    return [F.expr(_sign_pack(vec_col, 0, half)).alias("_sig_lo"),
            F.expr(_sign_pack(vec_col, half, dims)).alias("_sig_hi")]


def binary_hamming_topk(emb: DataFrame, query_id: int, k: int = 10,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """ANN over 1-bit signatures: Hamming distance = bit_count(xor) of two
    BIGINTs — the cheapest possible scan (one integer op per row against
    a broadcast scalar). Integer-exact cross-engine; ties break by id.
    At scale the signature column is precomputed at ingest (8 bytes/row)
    and the float vectors are touched only by an optional rerank."""
    sigs = emb.select(F.col(id_col), *binary_signature(vec_col))
    q = (sigs.filter(F.col(id_col) == query_id)
         .select(F.col("_sig_lo").alias("_qlo"),
                 F.col("_sig_hi").alias("_qhi")))
    scored = (sigs.filter(F.col(id_col) != query_id)
              .crossJoin(F.broadcast(q))
              .select(id_col,
                      F.expr("bit_count(_sig_lo ^ _qlo)"
                             " + bit_count(_sig_hi ^ _qhi)")
                      .alias("hamming")))
    top = scored.orderBy(F.col("hamming").asc(), F.col(id_col)).limit(k)
    w = Window.orderBy(F.col("hamming").asc(), F.col(id_col))
    return top.withColumn("rnk", F.row_number().over(w))


def binary_hamming_topk_sql(sf_table: str, query_id: int, k: int = 10,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            dims: int = DIMS) -> str:
    half = dims // 2

    def pack(lo: int, hi: int) -> str:
        return " + ".join(
            f"(CASE WHEN ({vec_col}::DOUBLE[])[{i + 1}] > 0"
            f" THEN {1 << (i - lo)}::BIGINT ELSE 0::BIGINT END)"
            for i in range(lo, hi))

    return f"""
    WITH sigs AS (
      SELECT {id_col},
             CAST({pack(0, half)} AS BIGINT) AS sig_lo,
             CAST({pack(half, dims)} AS BIGINT) AS sig_hi
      FROM {sf_table}
    ),
    q AS (SELECT sig_lo AS qlo, sig_hi AS qhi FROM sigs
          WHERE {id_col} = {query_id})
    SELECT {id_col}, hamming, rnk FROM (
      SELECT s.{id_col},
             bit_count(xor(s.sig_lo, q.qlo))
               + bit_count(xor(s.sig_hi, q.qhi)) AS hamming,
             ROW_NUMBER() OVER (
               ORDER BY bit_count(xor(s.sig_lo, q.qlo))
                          + bit_count(xor(s.sig_hi, q.qhi)),
                        s.{id_col}) AS rnk
      FROM sigs s CROSS JOIN q WHERE s.{id_col} <> {query_id}
    ) WHERE rnk <= {k}
    """


# --------------------------------------------------------------------------
# Prototype-distance data pruning (Sorscher et al. 2022, arXiv:2206.14486)
# --------------------------------------------------------------------------


def prototype_prune(emb: DataFrame, k: int = N_CENTROIDS,
                    per_cell: int = 5, keep: str = "hard",
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """(id, cell, proto_sim, rnk): up to ``per_cell`` examples per IVF
    cell, ranked by cosine to the cell PROTOTYPE (the exact-decimal
    element-wise cell mean — one Lloyd update over the seed assignment).

    'Beyond neural scaling laws' pruning: keep='hard' ranks
    farthest-from-prototype first (the informative examples when data is
    abundant — the 100 TB regime), keep='easy' ranks nearest first (the
    low-data prescription). Per-cell quota balances cluster coverage —
    the same diversity argument as cluster-balanced sampling.

    Shape at scale: assignment + scoring are broadcast-cross-join narrow
    passes (k×d centroid/prototype tables ride the broadcast); the melt
    for the prototype means is one partial+final agg; the per-cell
    window partitions by cell, whose count grows with the corpus under
    ``auto_n_centroids`` — so window groups stay ~bounded (n/k) instead
    of collapsing onto a constant key set.
    """
    cells = ivf_assignments(emb, k, id_col, vec_col)
    v = (emb.select(F.col(id_col), as_double(vec_col).alias("v"))
         .join(cells, id_col))
    protos = (v.select("cell", F.posexplode("v").alias("dim", "x"))
              .groupBy("cell", "dim")
              .agg(F.expr("CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE)"
                          " / COUNT(x)").alias("m"))
              .groupBy("cell")
              .agg(F.array_sort(F.collect_list(F.struct("dim", "m")))
                   .alias("s"))
              .select("cell", F.expr("transform(s, x -> x.m)")
                      .alias("proto")))
    scored = (v.join(F.broadcast(protos), "cell")
              .select(id_col, "cell",
                      F.round(cosine("v", "proto"), 6).alias("proto_sim")))
    order = (F.col("proto_sim").asc() if keep == "hard"
             else F.col("proto_sim").desc())
    w = Window.partitionBy("cell").orderBy(order, F.col(id_col))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= per_cell))


def prototype_prune_sql(sf_table: str, k: int = N_CENTROIDS,
                        per_cell: int = 5, keep: str = "hard",
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> str:
    direction = "ASC" if keep == "hard" else "DESC"
    return f"""
    WITH v AS (SELECT {id_col}, {vec_col}::DOUBLE[] AS v FROM {sf_table}),
    c AS (SELECT {id_col} AS cid, v AS cv FROM v WHERE {id_col} < {k}),
    cells AS (
      SELECT {id_col}, cid AS cell FROM (
        SELECT v.{id_col}, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY v.{id_col}
                 ORDER BY ROUND(list_cosine_similarity(v.v, c.cv), 6)
                          DESC, cid) AS rn
        FROM v CROSS JOIN c
      ) WHERE rn = 1
    ),
    protos AS (
      SELECT cell, list(m ORDER BY dim) AS proto FROM (
        SELECT cells.cell, d.dim,
               CAST(SUM(CAST(v.v[d.dim] AS DECIMAL(28,12))) AS DOUBLE)
               / COUNT(v.v[d.dim]) AS m
        FROM v JOIN cells USING ({id_col}),
             (SELECT unnest(generate_series(1, {DIMS})) AS dim) d
        GROUP BY cells.cell, d.dim
      ) GROUP BY cell
    ),
    scored AS (
      SELECT v.{id_col}, cells.cell,
             ROUND(list_cosine_similarity(v.v, protos.proto), 6)
               AS proto_sim
      FROM v JOIN cells USING ({id_col})
             JOIN protos ON protos.cell = cells.cell
    )
    SELECT {id_col}, cell, proto_sim, rnk FROM (
      SELECT {id_col}, cell, proto_sim,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY cell
               ORDER BY proto_sim {direction}, {id_col}) AS INTEGER) AS rnk
      FROM scored
    ) WHERE rnk <= {per_cell}
    """


# --------------------------------------------------------------------------
# Margin-based candidate mining (Artetxe & Schwenk 2019, ACL — the
# CCMatrix/LASER bitext selection rule)
# --------------------------------------------------------------------------


def margin_mine(emb: DataFrame, k: int = 4, threshold: float = 1.0,
                n_planes: int = 8, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """(src, dst, cos_sim, margin): k-NN edges whose ratio margin

        margin(x,y) = cos(x,y) / ((avgcos_k(x) + avgcos_k(y)) / 2)

    exceeds ``threshold`` — absolute-cosine cuts are miscalibrated in
    high dimensions (hubness: some vectors are near EVERYTHING), so
    CCMatrix/LASER score each candidate against the two endpoints' own
    neighborhood densities; margin > 1 means 'closer than these two
    points' typical neighbors'. The same rule mines bitext pairs,
    near-dup confirmations and retrieval-negative filters.

    Scale shape: rides :func:`knn_graph` (bucketed, never all-pairs);
    the per-id mean-neighbor-cosine table is id-cardinality and joins
    back on uniform keys. The graph is lineage-cut once and feeds all
    three consumers (edges + both endpoint means) instead of
    re-evaluating the bucket self-join per consumer. Determinism: means
    are decimal sums of 6dp cosines (order-independent), so the margin
    double is bit-identical cross-engine — no further rounding needed.
    """
    g = lineage_cut(knn_graph(emb, k=k, n_planes=n_planes,
                              id_col=id_col, vec_col=vec_col))
    m = g.groupBy("src").agg(
        F.expr("CAST(SUM(CAST(cos_sim AS DECIMAL(28,6))) AS DOUBLE)"
               " / COUNT(*)").alias("mc"))
    ma = m.select(F.col("src").alias("_a"), F.col("mc").alias("mc_a"))
    mb = m.select(F.col("src").alias("_b"), F.col("mc").alias("mc_b"))
    return (g.join(ma, F.col("src") == F.col("_a"))
            .join(mb, F.col("dst") == F.col("_b"))
            .filter(F.col("mc_a") + F.col("mc_b") != 0)
            .withColumn("margin",
                        F.col("cos_sim")
                        / ((F.col("mc_a") + F.col("mc_b")) / 2))
            .filter(F.col("margin") > threshold)
            .select("src", "dst", "cos_sim", "margin"))


def margin_mine_sql(sf_table: str, k: int = 4, threshold: float = 1.0,
                    n_planes: int = 8, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> str:
    knn = knn_graph_sql(sf_table, k=k, n_planes=n_planes,
                        id_col=id_col, vec_col=vec_col)
    return f"""
    WITH g AS ({knn}),
    m AS (SELECT src,
                 CAST(SUM(CAST(cos_sim AS DECIMAL(28,6))) AS DOUBLE)
                 / COUNT(*) AS mc
          FROM g GROUP BY src)
    SELECT g.src, g.dst, g.cos_sim,
           g.cos_sim / ((ma.mc + mb.mc) / 2) AS margin
    FROM g JOIN m ma ON ma.src = g.src
           JOIN m mb ON mb.src = g.dst
    WHERE ma.mc + mb.mc <> 0
      AND g.cos_sim / ((ma.mc + mb.mc) / 2) > {threshold!r}
    """


# --------------------------------------------------------------------------
# Embedding distribution drift between snapshots (the PSI analog for
# vector columns)
# --------------------------------------------------------------------------


def embedding_drift(ref: DataFrame, cur: DataFrame,
                    label_col: str = "label",
                    vec_col: str = "embedding") -> DataFrame:
    """(label, n_ref, n_cur, centroid_cos): per-label cosine between the
    two snapshots' exact-decimal centroids — the embedding-space drift
    monitor (an embedding model silently retrained, a feed whose content
    moved, a label whose meaning rotated all show up as centroid_cos
    dropping from ~1.0; scalar PSI on lengths cannot see any of it).

    Scale shape: one melt + partial+final mean per snapshot
    (label×dim-cardinality output — the :func:`prototype_prune` centroid
    discipline: DECIMAL(28,12) sums so the mean is order-independent),
    centroid tables are label-cardinality and broadcast-join on label;
    labels present in only one snapshot are reported with NULL
    centroid_cos (full outer), so a vanished label is a visible event,
    not a dropped row."""
    def centroids(df: DataFrame, n_name: str, c_name: str) -> DataFrame:
        v = df.select(F.col(label_col).alias("lbl"),
                      as_double(vec_col).alias("v"))
        n = v.groupBy("lbl").agg(F.count(F.lit(1)).alias(n_name))
        c = (v.select("lbl", F.posexplode("v").alias("dim", "x"))
             .groupBy("lbl", "dim")
             .agg(F.expr("CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE)"
                         " / COUNT(x)").alias("m"))
             .groupBy("lbl")
             .agg(F.array_sort(F.collect_list(F.struct("dim", "m")))
                  .alias("s"))
             .select("lbl", F.expr("transform(s, x -> x.m)")
                     .alias(c_name)))
        return c.join(n, "lbl")
    rc = centroids(ref, "n_ref", "c_ref")
    cc = centroids(cur, "n_cur", "c_cur")
    return (rc.join(cc, "lbl", "full_outer")
            .select(F.col("lbl").alias(label_col),
                    F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
                    F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
                    F.round(cosine("c_ref", "c_cur"), 6)
                    .alias("centroid_cos")))


def embedding_drift_sql(ref_sql: str, cur_sql: str,
                        label_col: str = "label",
                        vec_col: str = "embedding") -> str:
    """DuckDB oracle for :func:`embedding_drift` — same decimal means,
    same 6dp-rounded cosine (list_cosine_similarity equivalence is the
    one prototype_prune certifies)."""
    def cte(src: str, tag: str) -> str:
        return f"""
    {tag}v AS (SELECT {label_col} AS lbl, {vec_col}::DOUBLE[] AS v
               FROM ({src})),
    {tag}c AS (
      SELECT lbl, list(m ORDER BY dim) AS c, MAX(n) AS n FROM (
        SELECT v.lbl, d.dim,
               CAST(SUM(CAST(v.v[d.dim] AS DECIMAL(28,12))) AS DOUBLE)
               / COUNT(v.v[d.dim]) AS m,
               COUNT(v.v[d.dim]) AS n
        FROM {tag}v v,
             (SELECT unnest(generate_series(1, {DIMS})) AS dim) d
        GROUP BY v.lbl, d.dim
      ) GROUP BY lbl)"""
    return f"""
    WITH {cte(ref_sql, 'r')},
    {cte(cur_sql, 'c')}
    SELECT COALESCE(rc.lbl, cc.lbl) AS {label_col},
           COALESCE(rc.n, 0) AS n_ref, COALESCE(cc.n, 0) AS n_cur,
           ROUND(list_cosine_similarity(rc.c, cc.c), 6) AS centroid_cos
    FROM rc FULL OUTER JOIN cc ON rc.lbl = cc.lbl
    """
