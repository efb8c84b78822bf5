"""Similarity search over the embeddings table (array<float> column).

* cosine/dot products are Column expressions (zip_with + aggregate),
  JVM-side -- no Python in the hot path.
* brute-force top-k: query set broadcast against the corpus; at 100 TB
  corpus the scan is embarrassingly parallel and the per-partition top-k
  is cut by the row_number window AFTER a partial sort -- for large k use
  the LSH variant.
* LSH (random-hyperplane signs) bucketing: deterministic pseudo-random
  hyperplanes derived from xxhash64(plane, dim) so the operator is a pure
  function of its inputs (no RNG state); candidates only within matching
  sign-buckets -- the scale path (bucket join instead of cross join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dbl(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    a, b = _dbl(a), _dbl(b)
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    emb: DataFrame, n_queries: int = 8, k: int = 5, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact cosine top-k: the first n_queries ids (by id order) are the
    query set, searched against all OTHER vectors. Deterministic tie-break
    (sim desc, neighbor id asc). Returns (query_id, neighbor_id, sim, rank)."""
    # cast + norm are hoisted to one projection PER VECTOR before the
    # 1-to-n_queries join, instead of recomputing them per PAIR inside
    # cosine() -- same doubles, same fold order, bit-identical sims
    q = emb.where(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), _dbl(F.col(vec_col)).alias("qv")
    ).withColumn("qn", norm(F.col("qv")))
    c = emb.select(
        F.col(id_col).alias("neighbor_id"), _dbl(F.col(vec_col)).alias("cv")
    ).withColumn("cn", norm(F.col("cv")))
    sims = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def hyperplane_signature(vec: Column, n_planes: int = 8, seed: int = 42) -> Column:
    """Sign-bucket id in [0, 2^n_planes): bit p = [sum_d v[d]*h(p,d) > 0]
    with h(p,d) = deterministic pseudo-random weight in [-1, 1]."""
    v = _dbl(vec)

    def plane_dot(p: Column) -> Column:
        weighted = F.zip_with(
            v,
            F.sequence(F.lit(0), F.size(v) - 1),
            lambda x, d: x
            * ((F.xxhash64(p, d, F.lit(seed)) % 2001).cast("double") / 1000.0),
        )
        return F.aggregate(weighted, F.lit(0.0), lambda acc, x: acc + x)

    bits = F.transform(
        F.sequence(F.lit(0), F.lit(n_planes - 1)),
        lambda p: F.when(plane_dot(p) > 0, F.call_function("shiftleft", F.lit(1).cast("long"), p.cast("int"))).otherwise(
            F.lit(0).cast("long")
        ),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda acc, x: acc.bitwiseOR(x))


def _bucket_frame(
    emb: DataFrame, n_tables: int, n_planes: int, seed: int, id_col: str, vec_col: str
) -> DataFrame:
    """(id, tbl, bucket) sign-bucket assignments for every (vector, table)
    pair, computed via posexplode + flat codegen aggregates: one row per
    (id, table, dim) with weight w(tbl,p,d) = (xxhash64(tbl,p,d,seed) %
    2001)/1000, summed per plane in a single partial-agg pass. The nested
    zip_with/aggregate formulation evaluates in Spark's interpreted
    expression path (outside whole-stage codegen) and measured ~10x slower;
    this shape keeps every operator codegen'd and map-side combined.

    (Round-7 note: a single-explosion variant -- groupBy(id) with all
    n_tables x n_planes plane sums as one wide agg -- was A/B'd
    value-identical but 2-3x SLOWER here (0.8s -> 1.8s+ noop at sf0.1):
    the 64-expression aggregate falls out of whole-stage codegen. The
    narrow 2-agg form below stays codegen'd; kept.)"""
    d = emb.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(vec_col)).alias("d", "x"),
    ).select(
        "id",
        "d",
        F.col("x").cast("double").alias("x"),
        F.explode(F.sequence(F.lit(0), F.lit(n_tables - 1))).alias("tbl"),
    )
    aggs = []
    for p in range(n_planes):
        w = (
            F.xxhash64(F.col("tbl"), F.lit(p), F.col("d"), F.lit(seed)) % 2001
        ).cast("double") / 1000.0
        aggs.append(F.sum(F.col("x") * w).alias(f"dot{p}"))
    dots = d.groupBy("id", "tbl").agg(*aggs)
    bucket = None
    for p in range(n_planes):
        bit = (
            F.when(F.col(f"dot{p}") > 0, F.lit(1 << p).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
        bucket = bit if bucket is None else bucket.bitwiseOR(bit)
    return dots.select("id", "tbl", bucket.alias("bucket"))


def lsh_topk(
    emb: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via MULTI-TABLE random-hyperplane LSH
    (OR-amplification: candidate if the pair collides in ANY of n_tables
    independent sign-bucket tables), exact cosine within candidates.
    The 100 TB path: shuffle keyed on (table, bucket) instead of a cross
    product; recall tuned by (n_planes, n_tables).

    (sigd deliberately NOT checkpointed: the query branch's id filter
    pushes below the aggregate to the scan, so its re-evaluation reads
    n_queries rows -- an A/B measured the blocking materialization net
    slower, 1.08-1.49s vs 0.94-1.28s at sf0.1. embedding_neardup_pairs,
    whose self-join re-runs the FULL frame twice, does checkpoint.)"""
    sigd = _bucket_frame(emb, n_tables, n_planes, seed, id_col, vec_col)
    q = sigd.where(F.col("id") < n_queries).select(
        F.col("id").alias("query_id"),
        F.col("tbl").alias("qt"), F.col("bucket").alias("qb"),
    )
    # candidate ids only through the xN-tables dedup shuffle; vectors rejoin
    # AFTER dropDuplicates so OR-amplification never multiplies the payload
    c = sigd.select(F.col("id").alias("neighbor_id"), "tbl", "bucket")
    cand = (
        F.broadcast(q)
        .join(
            c,
            (F.col("qt") == F.col("tbl"))
            & (F.col("qb") == F.col("bucket"))
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    # cast + norm hoisted per VECTOR ahead of the candidate join (the
    # exact-verify stage computes cosine once per candidate pair; norms
    # are per-vector quantities) -- same doubles, bit-identical sims
    qv = emb.where(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), _dbl(F.col(vec_col)).alias("qv")
    ).withColumn("qn", norm(F.col("qv")))
    cv = emb.select(
        F.col(id_col).alias("neighbor_id"), _dbl(F.col(vec_col)).alias("cv")
    ).withColumn("cn", norm(F.col("cv")))
    sims = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    tau: float = 0.95,
    n_planes: int = 2,
    n_tables: int = 32,
    seed: int = 42,
    brute_force: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (doc-level near-dup family),
    blocked through multi-table random-hyperplane LSH with exact-cosine
    verification -- the join is keyed on (table, sign-bucket), never a
    cross product. Candidate ids dedupe BEFORE vectors rejoin, so the
    OR-amplified shuffle carries two longs per row.

    Recall for a pair at cosine s: 1 - (1 - (1 - theta/pi)^n_planes)^n_tables
    with theta = arccos(s). The defaults (2 planes x 32 tables) give miss
    probability < 1e-7 even at s = 0.42; tighten n_planes upward as tau
    rises (near-dup thresholds ~0.9 tolerate 8+ planes, shrinking buckets).
    brute_force=True keeps the O(n^2) exact path for small-scale oracles."""
    a_ids = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b_ids = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    if brute_force:
        return (
            a_ids.join(b_ids, F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("sim"))
            .where(F.col("sim") >= tau)
        )
    # the a/b self-join below evaluates the signature frame twice --
    # checkpoint it so the plane-sum aggregation runs once per call
    sigd = _bucket_frame(
        emb, n_tables, n_planes, seed, "vec_id", "embedding"
    ).localCheckpoint()
    a, b = sigd.alias("a"), sigd.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # cast + norm hoisted per vector (see brute_force_topk) -- same
    # doubles, bit-identical sims
    a_h = emb.select(
        F.col("vec_id").alias("id_a"), _dbl(F.col("embedding")).alias("va")
    ).withColumn("na", norm(F.col("va")))
    b_h = emb.select(
        F.col("vec_id").alias("id_b"), _dbl(F.col("embedding")).alias("vb")
    ).withColumn("nb", norm(F.col("vb")))
    return (
        cand.join(a_h, "id_a")
        .join(b_h, "id_b")
        .select(
            "id_a", "id_b",
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
            ).alias("sim"),
        )
        .where(F.col("sim") >= tau)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: deterministic k-means coarse quantizer
# ---------------------------------------------------------------------------


def _lit_vec(vals: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vals])


def _l2_to(vec: Column, centroid: list[float]) -> Column:
    c = _lit_vec(centroid)
    return F.aggregate(
        F.zip_with(_dbl(vec), c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign_expr(vec: Column, centroids: list[list[float]]) -> Column:
    """argmin cluster id over the (broadcast-as-literals) centroid set."""
    dists = F.array(*[_l2_to(vec, c) for c in centroids])
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def _assign_topn_expr(vec: Column, centroids: list[list[float]], n: int) -> Column:
    """The n nearest cluster ids, ascending by L2 (array<int>)."""
    dists = F.array(*[_l2_to(vec, c) for c in centroids])
    ranked = F.transform(
        F.array_sort(
            F.transform(dists, lambda d, i: F.struct(d.alias("d"), i.cast("int").alias("i")))
        ),
        lambda s: s["i"],
    )
    return F.slice(ranked, 1, n)


def ivf_train(
    emb: DataFrame,
    n_clusters: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> list[list[float]]:
    """Deterministic Lloyd's k-means: init = the n_clusters vectors with the
    smallest xxhash64(id, seed) (a seeded pseudo-random sample, no RNG
    state); each iteration is one distributed assign + groupBy-mean pass.
    Centroids live on the driver (K x d floats), data never leaves
    executors except the K mean rows."""
    init = (
        emb.orderBy(F.abs(F.xxhash64(F.col(id_col), F.lit(seed))))
        .limit(n_clusters)
        .select(_dbl(F.col(vec_col)).alias("v"))
        .collect()
    )
    centroids = [list(r["v"]) for r in init]
    dim = len(centroids[0])
    for _ in range(iters):
        assigned = emb.select(
            _assign_expr(F.col(vec_col), centroids).alias("c"),
            _dbl(F.col(vec_col)).alias("v"),
        )
        means = (
            assigned.groupBy("c")
            .agg(
                F.array(*[F.round(F.avg(F.element_at("v", i + 1)), 8) for i in range(dim)]).alias("m"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        new = list(centroids)
        for r in means:
            new[int(r["c"])] = list(r["m"])
        centroids = new
    return centroids


def ivf_topk(
    emb: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    n_clusters: int = 16,
    nprobe: int = 4,
    iters: int = 3,
    n_assign: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors are bucketed by nearest
    centroid; each query searches only its nprobe nearest clusters with
    exact cosine. The 100 TB path: the corpus scan is pruned to
    nprobe/n_clusters of the data and the join is keyed on cluster id --
    no cross product. Deterministic given (seed, data).

    n_assign > 1 is spilled (multi-assignment) IVF: each corpus vector is
    replicated into its n_assign nearest clusters, the standard recall
    lever for boundary vectors -- storage x n_assign, recall approaches
    exact search much faster than raising nprobe alone."""
    centroids = ivf_train(emb, n_clusters, iters, id_col, vec_col, seed)
    # cast + norm hoisted per vector (see brute_force_topk) -- same
    # doubles, bit-identical sims
    corpus = emb.select(
        F.col(id_col).alias("neighbor_id"),
        _dbl(F.col(vec_col)).alias("cv"),
        F.explode(
            _assign_topn_expr(F.col(vec_col), centroids, n_assign)
        ).alias("cluster"),
    ).withColumn("cn", norm(F.col("cv")))
    q = (
        emb.where(F.col(id_col) < n_queries)
        .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
        .withColumn(
            "cluster", F.explode(_assign_topn_expr(F.col("qv"), centroids, nprobe))
        )
        .select("query_id", _dbl(F.col("qv")).alias("qv"), "cluster")
        .withColumn("qn", norm(F.col("qv")))
    )
    sims = (
        F.broadcast(q)
        .join(
            corpus,
            (q["cluster"] == corpus["cluster"]) & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
            ).alias("sim"),
        )
    )
    if n_assign > 1:
        # replicated corpus vectors can meet a query in several probed
        # clusters; dedup the (ids, sim) triple -- no vector payload here
        sims = sims.dropDuplicates(["query_id", "neighbor_id"])
    # (with n_assign=1 a corpus vector belongs to exactly ONE cluster, so
    # pairs are already unique -- no dedup shuffle)
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )
