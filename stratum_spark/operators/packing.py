"""Token-stream chunking for pretraining batch assembly.

The standard LLM pretraining data layout concatenates the corpus into one
logical token stream (in a deterministic document order) and cuts it every
`chunk_tokens` tokens; each training example is one chunk, and documents
straddle chunk boundaries. This module computes, distributively, each
document's absolute token span in that stream and the chunks it lands in,
plus the per-chunk manifest (docs per chunk, exact token accounting) a
training loader consumes.

Scale design (the part that matters at 100 TB): the naive expression is a
single global window `sum(n_tok) OVER (ORDER BY order_col)`, which Spark
executes on ONE partition -- a non-starter. Instead this runs the classic
two-pass distributed prefix sum:

  1. one tiny driver job picks ~n_bands range cuts over order_col
     (approxQuantile, O(n_bands) result rows);
  2. one aggregation job computes each band's token total
     (map-side partial agg, O(n_bands) rows to the driver);
  3. the driver prefix-sums the band totals (O(n_bands), pure Python);
  4. the per-row cumulative sum is a window PARTITIONED BY band --
     n_bands-way parallel -- plus the band's broadcast starting offset.

The output is band-independent: a document's absolute offset depends only
on the global order, so the result is identical for any cut placement
(including the degenerate 1-band case), which is what the DuckDB
global-window oracle checks. No analog in the reference (stratum migrates
tables; it has no training-batch surface) -- this is the `payload=tokens`
extension the brief asks for beyond the reference's operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _banded_prefix(df, order_cols, weight, n_bands: int):
    """The two-pass distributed prefix sum shared by the ops below: adds
    `__cum`, the inclusive cumulative `weight` over the global order
    defined by `order_cols` (the first of which must be numeric; later
    ones are tie-breaks). Bands come from approxQuantile cuts on the
    first order column (one tiny job); per-band totals aggregate to the
    driver (O(n_bands) rows), prefix-sum there, and the per-row cumsum
    is a window PARTITIONED BY band -- n_bands-way parallel, never a
    one-partition global window. The `__cum` values are band-placement-
    independent: rows equal to a cut all land in the same (lower) band,
    so (band, *order_cols) order == global (*order_cols) order.

    The input is localCheckpoint()ed first: this function evaluates it
    three times (approxQuantile job, per-band totals job, the final
    windowed plan), which would otherwise triple an expensive upstream
    AND -- if the upstream were nondeterministic (a table mutated
    mid-query, sampling) -- let the band totals disagree with the final
    pass and silently corrupt offsets. The materialization pins one
    snapshot for all three passes; deterministic input is otherwise a
    REQUIREMENT of any multi-pass prefix sum."""
    df = df.localCheckpoint()
    first = F.col(order_cols[0]).cast("double")
    cuts: list[float] = []
    if n_bands > 1:
        qs = [i / n_bands for i in range(1, n_bands)]
        # the cut VALUES don't matter for correctness (any banding yields
        # the same output), only for balance
        cuts = sorted(set(df.stat.approxQuantile(order_cols[0], qs, 0.001)))
    if cuts:
        band = F.size(F.filter(
            F.array(*[F.lit(float(c)) for c in cuts]), lambda c: c < first
        ))
    else:
        band = F.lit(0)
    df = df.withColumn("__band", band)

    totals = {
        r["__band"]: r["s"]
        for r in df.groupBy("__band").agg(F.sum(weight).alias("s")).collect()
    }
    offsets, running = {}, 0
    for b in sorted(totals):
        offsets[b] = running
        running += totals[b]
    if offsets:
        pairs = []
        for b, off in offsets.items():
            pairs.extend([F.lit(b), F.lit(off)])
        off_col = F.create_map(*pairs)[F.col("__band")]
    else:
        off_col = F.lit(0).cast("long")

    w = Window.partitionBy("__band").orderBy(*order_cols)
    return df.withColumn("__cum", F.sum(weight).over(w) + off_col)


def chunk_token_stream(
    df: DataFrame,
    n_tok_col: str = "n_tok",
    order_col: str = "doc_id",
    chunk_tokens: int = 4096,
    n_bands: int = 32,
) -> DataFrame:
    """Assign each document its absolute token span in the concatenated
    stream (ordered by `order_col`, which must be numeric and unique) and
    the fixed-capacity chunks it covers.

    Adds columns: tok_start, tok_end (absolute, 0-based, end-exclusive),
    chunk_first, chunk_last (inclusive chunk ids of size `chunk_tokens`).
    Documents with n_tok <= 0 carry no tokens and are dropped.
    """
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    df = df.where(F.col(n_tok_col) > 0)
    out = _banded_prefix(
        df, [order_col], F.col(n_tok_col).cast("long"), n_bands)
    return (
        out.withColumn("tok_end", F.col("__cum"))
        .withColumn("tok_start", F.col("tok_end") - F.col(n_tok_col))
        .withColumn("chunk_first", F.expr(f"tok_start div {int(chunk_tokens)}"))
        .withColumn("chunk_last", F.expr(f"(tok_end - 1) div {int(chunk_tokens)}"))
        .drop("__band", "__cum")
    )


def shuffle_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    salt: str = "",
    n_bands: int = 32,
) -> DataFrame:
    """Deterministic corpus shuffle + shard assignment (the
    pre-training "global shuffle" that breaks source/crawl locality
    before sharding to data-loader workers): rank every row by a keyed
    md5 order -- reproducible, salt-able per epoch -- then
    shard = rank % n_shards and pos_in_shard = rank // n_shards, so
    shards are balanced to within one row and the within-shard order is
    itself shuffled. The rank is the same banded two-pass prefix sum as
    chunk_token_stream (weight 1 = a distributed row_number); no global
    window, no driver-side sort. md5 (not xxhash64) because every engine
    agrees on it byte-for-byte, which is what makes the result
    oracle-checkable and portable."""
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    hkey = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 15),
        16, 10,
    ).cast("long")
    out = _banded_prefix(
        df.withColumn("__hkey", hkey),
        ["__hkey", id_col], F.lit(1).cast("long"), n_bands)
    return (
        out.withColumn("rank", F.col("__cum") - 1)
        .withColumn("shard", F.col("rank") % n_shards)
        .withColumn("pos_in_shard", F.expr(f"rank div {int(n_shards)}"))
        .drop("__band", "__cum", "__hkey")
    )


def take_token_budget(
    df: DataFrame,
    budgets: dict[str, int],
    n_tok_col: str = "n_tok",
    source_col: str = "source",
    order_col: str = "doc_id",
    default_budget: int = 0,
) -> DataFrame:
    """Pretraining-mix selection: from each source, take documents in
    `order_col` order until that source's token budget is reached (the
    "sample N tokens of code, M of web, ..." mixture step). A document
    is kept iff the cumulative token count of its source up to AND
    including it is <= the source's budget, so the cut is deterministic
    and reproducible; sources absent from `budgets` get default_budget.

    One window partitioned by source -- the per-source cumsum is the
    partitioning Spark already parallelizes; no global order, no driver
    loops. Skewed sources (one giant source = one giant window
    partition) are the same skew the corpus itself has; for a single
    source dominating the corpus, chunk_token_stream's banded prefix-sum
    pattern applies instead.
    """
    w = Window.partitionBy(source_col).orderBy(order_col)
    cum = F.sum(F.col(n_tok_col).cast("long")).over(w)
    pairs = []
    for s, b in budgets.items():
        pairs.extend([F.lit(s), F.lit(int(b))])
    budget = (
        F.coalesce(F.create_map(*pairs)[F.col(source_col)],
                   F.lit(int(default_budget)))
        if pairs else F.lit(int(default_budget))
    )
    return (
        df.where(F.col(n_tok_col) > 0)
        .withColumn("__cum", cum)
        .where(F.col("__cum") <= budget)
        .drop("__cum")
    )


def chunk_manifest(spans: DataFrame, chunk_tokens: int = 4096) -> DataFrame:
    """Per-chunk manifest from chunk_token_stream's output: how many
    documents contribute to each chunk and the exact token count each
    chunk receives (== chunk_tokens everywhere except the final chunk).
    One explode + one aggregation; a document spanning k chunks emits k
    rows, so the explode fan-out is bounded by total_tokens/chunk_tokens
    extra rows corpus-wide."""
    c = int(chunk_tokens)
    e = spans.select(
        "tok_start", "tok_end",
        F.explode(F.sequence("chunk_first", "chunk_last")).alias("chunk_id"),
    )
    contrib = (
        F.least(F.col("tok_end"), (F.col("chunk_id") + 1) * c)
        - F.greatest(F.col("tok_start"), F.col("chunk_id") * c)
    )
    return (
        e.groupBy("chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(contrib).alias("n_tokens"),
        )
    )
