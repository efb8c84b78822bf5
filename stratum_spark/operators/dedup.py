"""Deduplication family over the documents table.

Scale notes (the 100 TB design):
  * exact: hash-groupBy -- partial aggregation map-side, one shuffle of
    (hash, min_id, count); identical asymptotics at any scale.
  * minhash LSH: shingle -> k minhashes -> b bands; candidate generation is
    a self-join ON the band key, so only same-bucket pairs materialize --
    the blow-up knob is (b, r), not table size. Shingles are codegen'd
    posting ROWS (gram_frame); signatures are one flat partial aggregate.
  * simhash: 64-bit signature via bitwise majority over token hashes; near-
    dup candidates blocked on 16-bit sub-bands (Hamming<=3 within a
    64/16 split can't miss by pigeonhole when <=3 of 4 bands differ).
  * n-gram jaccard: exact verification joins candidates only.
  * embedding cosine: see similarity.py.

All hashing is xxhash64 (JVM built-in) except where the DuckDB oracle
needs engine-agreement (md5 there).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Group identical normalized texts; keeper = min doc_id per group."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return (
        docs.select(F.col("doc_id"), F.md5(norm).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keeper_id"), F.count("*").alias("n_copies"))
    )


# ---------------------------------------------------------------------------
# shingles + exact n-gram jaccard
# ---------------------------------------------------------------------------


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams as an ARRAY column (Column-API form; kept for
    ad-hoc use). NOTE: the transform/slice lambdas here run in Spark's
    INTERPRETED expression path -- the operators below use gram_frame(),
    the row-wise codegen formulation, which measured ~2x faster end-to-end
    and avoids re-evaluating the lambdas once per plan branch."""
    toks = F.split(F.trim(F.lower(text)), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    return F.array_distinct(grams)


def gram_frame(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, g): DISTINCT word n-grams as ROWS, fully whole-stage-
    codegen: split -> posexplode -> per-doc lag window -> concat_ws.
    No higher-order functions (those run interpreted), no array columns.
    The lag window partitions by doc_id, so its buffering is bounded by
    document length -- skew-safe by construction. Docs shorter than n
    tokens contribute their single whole-doc gram (concat_ws skips the
    null lags), exactly matching word_shingles()/the SQL oracle."""
    from pyspark.sql import Window

    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    t = docs.select(F.col("doc_id"), F.posexplode(toks).alias("pos", "w"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.lag("w", n - 1 - j).over(w) for j in range(n - 1)] + [F.col("w")]
    t = (
        t.withColumn("__sz", F.count("*").over(Window.partitionBy("doc_id")))
        .withColumn("g", F.concat_ws(" ", *parts))
        .where(F.col("pos") >= F.least(F.col("__sz"), F.lit(n)) - 1)
    )
    return t.select("doc_id", "g").dropDuplicates(["doc_id", "g"])


def _verify_jaccard_counts(
    cand_ids: DataFrame, inv: DataFrame, n_sh: DataFrame, tau: float
) -> DataFrame:
    """Exact-Jaccard verification of an ids-only candidate-pair set, by
    COUNTS over the full inverted index (never by array intersection):
    common = |shared grams| via cand x postings joins + one partial-agg
    count; jaccard = common / (na + nb - common). The candidate shuffle
    carries (doc_a, doc_b) only, and every side of every join is plain
    codegen'd rows. inv must be the FULL (uncapped) posting set so the
    Jaccard of surviving pairs is exact."""
    cand = cand_ids.dropDuplicates(["doc_a", "doc_b"])
    ia = inv.select(F.col("doc_id").alias("doc_a"), F.col("g"))
    ib = inv.select(F.col("doc_id").alias("doc_b"), F.col("g"))
    common = (
        cand.join(ia, "doc_a")
        .join(ib, ["doc_b", "g"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("common"))
    )
    na = n_sh.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    nb = n_sh.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    withn = common.join(na, "doc_a").join(nb, "doc_b")
    jac = F.col("common").cast("double") / (F.col("na") + F.col("nb") - F.col("common"))
    return withn.where(jac >= tau).select(
        "doc_a", "doc_b", F.round(jac, 4).alias("jaccard")
    )


def dup_clusters(pairs: DataFrame, a_col: str = "doc_a",
                 b_col: str = "doc_b", max_iter: int = 25) -> DataFrame:
    """Duplicate-cluster resolution: connected components over near-dup
    PAIRS (from ngram_jaccard_pairs / minhash_lsh_pairs / ...), returning
    (doc_id, cluster) where cluster is the minimum doc id in the
    component -- the canonical representative a dedup pipeline keeps
    while dropping the rest.

    Min-label propagation WITH pointer jumping: every node starts
    labeled with itself; each round takes the min of its own and its
    neighbors' labels, then follows its label's label (the classic
    shortcutting step), so label distances HALVE per round and
    convergence is O(log diameter) -- a 10^6-long pathological chain
    needs ~20 rounds, and the dense near-dup clusters this is built for
    converge in 2-3. (The large-star/small-star reformulation from the
    public CC-in-MapReduce literature, Kiveris et al., achieves the same
    bound by rewriting edges; jumping keeps the edge list immutable,
    which is cheaper here.) Raises if max_iter rounds don't converge
    rather than returning wrong labels.

    Lineage discipline (the part that makes iteration viable on Spark):
    edges and each round's labels are localCheckpoint()ed, not merely
    persisted. A persist caches DATA but the logical plan keeps nesting
    -- with the changed-count self-join the tree DOUBLES per round on
    top of whatever expensive upstream produced the pairs, and the
    analyzer blows up long before the data does. The checkpoint
    truncates lineage so every round's plan is O(1) deep and references
    only the materialized edge/label blocks. (localCheckpoint trades
    executor-loss recoverability for speed -- the right trade for a
    short-lived label table; recompute-from-pairs is the recovery.)"""
    e = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    edges = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint()
    labels = (
        edges.select(F.col("src").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src").agg(F.min("label").alias("nbl"))
        )
        cand = labels.join(nbr, labels.node == nbr.src, "left").select(
            "node",
            F.least(F.col("label"), F.coalesce("nbl", "label")).alias("label"),
        )
        # pointer jumping: adopt my label's (possibly smaller) label --
        # every label IS a node id, so the inner self-join matches
        # exactly once per row
        new = (
            cand.alias("a")
            .join(cand.alias("b"), F.col("a.label") == F.col("b.node"))
            .select(
                F.col("a.node").alias("node"),
                F.least(F.col("a.label"), F.col("b.label")).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new.alias("n").join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label")).count()
        )
        labels = new
        if changed == 0:
            return labels.select(F.col("node").alias("doc_id"),
                                 F.col("label").alias("cluster"))
    raise RuntimeError(
        f"dup_clusters did not converge in {max_iter} rounds -- "
        "pathological chain graph; raise max_iter or use star-contraction")


def contamination_pairs(
    corpus: DataFrame, bench: DataFrame, n: int = 3, min_shared: int = 2
) -> DataFrame:
    """Benchmark decontamination: which corpus documents share at least
    `min_shared` DISTINCT word n-grams with which benchmark documents --
    the pre-training leakage check run before an eval set is trusted.
    Returns (doc_id, bench_id, shared); self-matches (same id on both
    sides, e.g. when the benchmark is carved out of the corpus) are
    excluded.

    Scale shape: an eval benchmark is tiny by definition, so its gram
    posting list BROADCASTS and the corpus grams stream map-side through
    the broadcast hash join -- the corpus side is never shuffled, no
    posting self-join, no all-pairs anything. The per-pair aggregation
    shuffles only the matched (doc_id, bench_id) rows, bounded by
    |bench grams| x their corpus document frequency."""
    cg = gram_frame(corpus, n)
    bg = gram_frame(bench, n).withColumnRenamed("doc_id", "bench_id")
    j = cg.join(F.broadcast(bg), "g").where(F.col("doc_id") != F.col("bench_id"))
    return (
        j.groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= min_shared)
    )


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, tau: float = 0.05, max_df: int = 10_000
) -> DataFrame:
    """Exact pairwise Jaccard over word n-gram shingle sets, via an
    inverted-index self-join (pairs only materialize when they share a
    shingle). Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.

    Scale guard: shingles whose document frequency exceeds max_df are cut
    from the inverted index before the self-join (the standard posting-list
    frequency cut) -- a stop-gram shared by 10^6 docs would otherwise create
    a 10^12-row bucket. The df is a partial hash aggregate (map-side
    combine -- no task ever buffers a hot gram's full posting list, unlike
    a count() window partitioned by g, which materializes exactly the
    partition the cap exists to kill), followed by an ANTI-join of the
    postings against the hot-gram list. The hot list is bounded by
    total_postings/max_df short strings -- broadcastable in any realistic
    corpus; at a scale where it is not, drop the hint and the shuffled
    anti-join still streams the probe side.

    Candidate-volume design: the self-join's matching rows feed ONE
    partial-agg count (map-side combine on the pair key), giving each
    pair's |shared kept grams| directly -- the matching rows are consumed
    once, never deduped and re-joined. Because a pair can additionally
    share at most min(hot_a, hot_b) of its docs' above-cap grams, the
    exact Jaccard is bounded above by
    (ck + min(hot_a, hot_b)) / (na + nb - ck - min(hot_a, hot_b)); pairs
    below tau on that bound are pruned EXACTLY. Pairs with no hot grams on
    either side have ck == |shared grams| outright and emit without any
    further join; only pairs touching hot docs re-verify over the FULL
    posting set. The result set is identical to the pre-prune formulation
    by construction: only pairs whose shared shingles are ALL above max_df
    can be missed (near-dup pairs share many shingles, so rare ones too).
    Candidates shuffle as ids + counts only.

    Materialization discipline: inv feeds 3-6 plan branches (df cap,
    anti-join, self-join, per-side stats, recheck); left lazy each
    branch RE-RUNS the shingle pipeline -- the round-6 driver plan held
    12 copies of gram_frame (408 nodes, 108 Exchanges). inv is
    localCheckpoint()ed so the shingle pass runs ONCE per call (the same
    lineage discipline dup_clusters uses; recompute-from-docs is the
    executor-loss recovery); n_sh stays lazy -- it is a cheap one-pass
    aggregate of the checkpointed inv and the extra blocking
    materialization A/B'd a wash-to-slower. When no gram exceeds max_df
    -- known from the materialized index for the cost of one tiny
    aggregate -- kept == inv, every candidate's ck is already exact, and
    the recheck branch is empty by construction, so the anti-join and
    the recheck union are skipped outright instead of scheduling their
    no-op joins."""
    inv = gram_frame(docs, n).localCheckpoint()
    n_sh = inv.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    # hot is checkpointed too: the emptiness probe below and (on the
    # capped path) the broadcast anti-join both consume it -- one df
    # aggregation over the index instead of two, and the probe itself
    # becomes a metadata-cheap limit(1) over the materialized (tiny,
    # <= total_postings/max_df rows) list
    hot = (
        inv.groupBy("g")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") > max_df)
        .select("g")
    ).localCheckpoint()
    if hot.isEmpty():
        a, b = inv.alias("a"), inv.alias("b")
        common = (
            a.join(
                b,
                (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .agg(F.count("*").alias("ck"))
        )
        na = n_sh.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
        nb = n_sh.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
        withn = common.join(na, "doc_a").join(nb, "doc_b")
        jac = F.col("ck").cast("double") / (F.col("na") + F.col("nb") - F.col("ck"))
        return withn.where(jac >= tau).select(
            "doc_a", "doc_b", F.round(jac, 4).alias("jaccard")
        )
    kept = inv.join(F.broadcast(hot), "g", "left_anti")
    n_kept = kept.groupBy("doc_id").agg(F.count("*").alias("n_kept"))
    a, b = kept.alias("a"), kept.alias("b")
    common_kept = (
        a.join(
            b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id"))
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("ck"))
    )
    stats = n_sh.join(n_kept, "doc_id", "left").na.fill({"n_kept": 0})
    sa = stats.select(
        F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"), F.col("n_kept").alias("ka")
    )
    sb = stats.select(
        F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"), F.col("n_kept").alias("kb")
    )
    cand = common_kept.join(sa, "doc_a").join(sb, "doc_b")
    hot_a, hot_b = F.col("na") - F.col("ka"), F.col("nb") - F.col("kb")
    no_hot = (hot_a == 0) & (hot_b == 0)
    max_common = F.col("ck") + F.least(hot_a, hot_b)
    ub = max_common.cast("double") / (F.col("na") + F.col("nb") - max_common)
    cand = cand.where(ub >= tau)
    jac = F.col("ck").cast("double") / (F.col("na") + F.col("nb") - F.col("ck"))
    out_exact = cand.where(no_hot & (jac >= tau)).select(
        "doc_a", "doc_b", F.round(jac, 4).alias("jaccard")
    )
    recheck = cand.where(~no_hot).select("doc_a", "doc_b")
    return out_exact.unionByName(_verify_jaccard_counts(recheck, inv, n_sh, tau))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(shingles: Column, k: int = 32) -> Column:
    """k minhashes as an array column: sig[i] = min over shingles of
    xxhash64(shingle, i). NOTE: nested higher-order functions run in
    Spark's INTERPRETED expression path (outside whole-stage codegen) --
    fine for ad-hoc use on one column, but minhash_lsh_pairs uses the
    explode+groupBy formulation below, which stays fully codegen'd and
    hashes each shingle string only once (~10x faster measured)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.array_min(F.transform(shingles, lambda s: F.xxhash64(s, i))),
    )


def _minhash_mins(inv: DataFrame, k: int) -> DataFrame:
    """(doc_id, m0..m{k-1}) from (doc_id, g) posting rows via one flat
    aggregate: each shingle STRING is hashed once (base = xxhash64(g));
    the k streams derive from the 8-byte base (xxhash64(base, i)), and all
    k mins compute in one codegen'd partial-agg pass -- map-side combine,
    one shuffle of k longs per doc."""
    hashed = inv.select("doc_id", F.xxhash64("g").alias("base"))
    return hashed.groupBy("doc_id").agg(
        *[F.min(F.xxhash64(F.col("base"), F.lit(i))).alias(f"m{i}") for i in range(k)]
    )


def minhash_lsh_pairs(
    docs: DataFrame, n: int = 3, k: int = 32, bands: int = 8, tau: float = 0.3
) -> DataFrame:
    """Near-dup candidates via banded MinHash LSH, verified with exact
    Jaccard (the standard shingle->minhash->band->bucket-join pipeline).
    Returns (doc_a, doc_b, jaccard) for verified candidates.

    inv is localCheckpoint()ed: the shingle pipeline otherwise re-runs
    once per plan branch (signatures, both verify sides, both stat sides
    -- 4-6 copies in the round-6 plan). n_sh and the band frame are left
    lazy ON PURPOSE: they are cheap one-pass derivations of the
    checkpointed inv, and an A/B of all checkpoint combinations measured
    the extra blocking materializations net slower (inv-only 1.45-1.5s
    vs all-three 1.7-1.8s vs fully-lazy 1.8-2.0s at sf0.1)."""
    r = k // bands
    inv = gram_frame(docs, n).localCheckpoint()
    n_sh = inv.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    mins = _minhash_mins(inv, k)
    # band rows carry (doc_id, band, bh) ONLY -- shared-gram counts join
    # after candidate dedup (_verify_jaccard_counts), so the (band-key) shuffle
    # payload stays ~24 bytes/row regardless of document size. Band hash =
    # one native xxhash64 over the band's r min-columns (flat codegen).
    banded = mins.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            *[F.col(f"m{bi * r + j}") for j in range(r)]
                        ).alias("bh"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh")
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bh") == F.col("b.bh"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    return _verify_jaccard_counts(cand, inv, n_sh, tau)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def md5_token_hash(col: Column) -> Column:
    """Engine-agreeable 60-bit token hash: the top 15 hex chars of md5,
    parsed base-16. DuckDB computes the identical value as
    ('0x' || substr(md5(t),1,15))::BIGINT, which makes the WHOLE simhash
    pipeline (votes, signature, bands, Hamming) hash-checkable against a
    SQL oracle; production keeps the faster JVM-native xxhash64. 60 bits
    (not 64) keeps the value inside a signed bigint in both engines; the
    four missing bit lanes vote uniformly 0 on both sides, so signatures
    and Hamming distances still agree exactly."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _simhash_frame(docs: DataFrame, token_hash=None) -> DataFrame:
    """(doc_id, sh): the same 64-bit SimHash simhash64() defines, computed
    via explode + one flat codegen'd aggregate pass (64 vote sums with
    map-side combine) instead of nested higher-order functions, which run
    interpreted. Bit-for-bit identical to simhash64(): same token split,
    same xxhash64 token hash (overridable, e.g. md5_token_hash for the
    oracle-checkable variant), same majority vote."""
    token_hash = token_hash or F.xxhash64
    toks = docs.select(
        F.col("doc_id"),
        F.explode(F.array_distinct(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))).alias("t"),
    ).select("doc_id", token_hash(F.col("t")).alias("h"))
    aggs = [
        F.sum(
            F.when(
                F.call_function("shiftright", F.col("h"), F.lit(i)).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(64)
    ]
    votes = toks.groupBy("doc_id").agg(*aggs)
    sh = None
    for i in range(64):
        # bit 63 of a signed long is the sign bit: 1<<63 == long min value
        bit_val = F.lit(-(2**63)) if i == 63 else F.lit(1 << i).cast("long")
        b = F.when(F.col(f"v{i}") > 0, bit_val).otherwise(F.lit(0).cast("long"))
        sh = b if sh is None else sh.bitwiseOR(b)
    return votes.select("doc_id", sh.alias("sh"))


def simhash64(text: Column) -> Column:
    """64-bit SimHash: bit i set iff the majority of token-hash bits i are 1.
    Pure Column expression: per-bit vote via aggregate over the token array.
    (Column-API form; simhash_pairs uses the equivalent _simhash_frame
    explode+aggregate formulation, which stays inside whole-stage codegen.)"""
    toks = F.array_distinct(F.split(F.trim(F.lower(text)), r"\s+"))
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: F.when(
            F.aggregate(
                toks,
                F.lit(0).cast("long"),
                lambda acc, t: acc
                + F.when(F.call_function("shiftright", F.xxhash64(t), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                    -1
                ),
            )
            > 0,
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(
        F.zip_with(
            bits,
            F.sequence(F.lit(0), F.lit(63)),
            lambda b, i: F.call_function("shiftleft", b, i.cast("int")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )


def _simhash_band(sh: Column, band: int, n_bands: int) -> Column:
    """Band `band` of an interleaved 64-bit split into n_bands sub-bands:
    band b owns bit positions {j : j % n_bands == b}, packed densely.
    Interleaving (vs contiguous ranges) keeps band widths balanced for any
    n_bands, so the pigeonhole guarantee holds exactly: <= n_bands-1
    differing bits cannot touch all n_bands bands."""
    n_bits = (64 - 1 - band) // n_bands + 1
    packed = F.transform(
        F.sequence(F.lit(0), F.lit(n_bits - 1)),
        lambda i: F.call_function(
            "shiftleft",
            F.call_function("shiftright", sh, (i * n_bands + band).cast("int")).bitwiseAND(
                F.lit(1)
            ),
            i.cast("int"),
        ),
    )
    return F.aggregate(packed, F.lit(0).cast("long"), lambda acc, x: acc.bitwiseOR(x))


def simhash_pairs(docs: DataFrame, max_hamming: int = 3, token_hash=None) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming, blocked on
    max_hamming+1 interleaved sub-bands: a pair within the requested radius
    must agree exactly on >= 1 band (pigeonhole), so band blocking is
    recall-complete for the CONFIGURED distance -- the band count is derived
    from max_hamming rather than fixed at 4 (which would silently
    under-recall for distances > 3). token_hash defaults to xxhash64;
    pass md5_token_hash for the engine-agreeable oracle variant."""
    n_bands = max_hamming + 1
    sh = _simhash_frame(docs, token_hash=token_hash)
    banded = sh.select(
        "doc_id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        _simhash_band(F.col("sh"), b, n_bands).alias("bh"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select(
        "doc_id", "sh", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh")
    ).localCheckpoint()  # the self-join below evaluates this frame twice;
    # checkpointing runs the signature pipeline once (n_docs x n_bands rows)
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sh").alias("ha"),
            F.col("b.sh").alias("hb"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return cand.where(ham <= max_hamming).select(
        "doc_a", "doc_b", ham.cast("int").alias("hamming")
    )
