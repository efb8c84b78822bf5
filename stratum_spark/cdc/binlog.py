"""Deterministic synthetic binlog / WAL change feed (FIXTURES.md §2-3).

Fully columnar generation: `spark.range(n_events)` plus hash-derived
pseudo-randomness (`xxhash64(seed, lsn, stream)`), no driver-side loops and
no `random` module state -- a pure function of (seed, n_docs, n_events),
mirroring stratum's deterministic plan-hash -> run_id discipline
(crates/engine-core/src/plan/execution.rs:115-126). Scales to 10^8+ events
on a cluster because every column is a Catalyst expression.

Feed properties:
  * `lsn` strictly increasing unique (the exactly-once dedup key); a
    configurable fraction of events is RE-EMITTED with identical lsn+payload
    (at-least-once delivery fixture).
  * first event per doc_id is an Insert; later events Update (mostly) or
    Delete; replay semantics are upsert-style (I/U set, D remove).
  * ~`hot_traffic` of events hit `hot_docs` of the id space (skew fixture
    for salted/agg-based dedup).
  * a configurable fraction of I/U rows violate `n_tok == size(tokens)`
    (DLQ fixture -- stratum validation rules,
    crates/model/src/execution/pipeline.rs:88-119).
  * `schema_ver` steps 0..3 at 40%/60%/80% of the feed per the evolution
    script in SCHEMA_EVOLUTION (add lang / rename source->corpus /
    widen n_tok).

Physical parquet schema is fixed across versions (all columns present);
the logical meaning per schema_ver is applied by the applier's column
mapping -- exactly how a binlog carries old-schema rows after DDL.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

VOCAB = 50257

BINLOG_DDL = (
    "lsn bigint, ts timestamp, op string, doc_id string, "
    "tokens array<int>, n_tok int, source string, lang string, schema_ver int"
)

# the scripted mid-stream DDL (FIXTURES.md §3): fraction of feed -> action
SCHEMA_EVOLUTION: list[dict] = [
    {"ver": 1, "at_frac": 0.40, "action": "add_column", "args": ["lang", "string"]},
    {"ver": 2, "at_frac": 0.60, "action": "rename_column", "args": ["source", "corpus"]},
    {"ver": 3, "at_frac": 0.80, "action": "widen_type", "args": ["n_tok", "bigint"]},
]

_SOURCES = ["web", "books", "code", "wiki"]
_LANGS = ["en", "de", "fr", "zh", "ja", "pt"]


def _h(seed: int, stream: int, *cols) -> F.Column:
    """Non-negative 63-bit hash stream, deterministic in (seed, stream, cols)."""
    return F.abs(F.xxhash64(F.lit(seed), F.lit(stream), *cols))


def generate_binlog(
    spark: SparkSession,
    n_docs: int = 1000,
    n_events: int = 5000,
    seed: int = 42,
    max_tokens: int = 128,
    dup_frac: float = 0.01,
    bad_frac: float = 0.005,
    delete_frac: float = 0.08,
    hot_traffic: float = 0.10,
    with_evolution: bool = True,
) -> DataFrame:
    """Build the change-event DataFrame, ordered by lsn (with duplicates)."""
    n_hot = max(1, n_docs // 1000)
    ev = spark.range(1, n_events + 1).withColumnRenamed("id", "lsn")

    # --- doc choice with hot-key skew ---------------------------------
    is_hot = (_h(seed, 1, F.col("lsn")) % 10_000) < int(hot_traffic * 10_000)
    hot_idx = _h(seed, 2, F.col("lsn")) % n_hot
    cold_idx = _h(seed, 3, F.col("lsn")) % n_docs
    doc_idx = F.when(is_hot, hot_idx).otherwise(cold_idx)
    ev = ev.withColumn("doc_id", F.format_string("doc-%08d", doc_idx.cast("int")))

    # --- op: first event per doc is I; later mostly U, some D ----------
    w = Window.partitionBy("doc_id").orderBy("lsn")
    rn = F.row_number().over(w)
    r_op = _h(seed, 4, F.col("lsn")) % 1000
    ev = ev.withColumn(
        "op",
        F.when(rn == 1, F.lit("I"))
        .when(r_op < int(delete_frac * 1000), F.lit("D"))
        .otherwise(F.lit("U")),
    )

    # --- payload -------------------------------------------------------
    tok_len = (_h(seed, 5, F.col("doc_id"), F.col("lsn")) % max_tokens + 1).cast("int")
    tokens = F.transform(
        F.sequence(F.lit(1), tok_len),
        lambda i: (_h(seed, 6, F.col("doc_id"), F.col("lsn"), i) % VOCAB).cast("int"),
    )
    is_bad = (_h(seed, 7, F.col("lsn")) % 100_000) < int(bad_frac * 100_000)
    ev = (
        ev.withColumn("tokens", F.when(F.col("op") != "D", tokens))
        .withColumn(
            "n_tok",
            F.when(
                F.col("op") != "D",
                F.when(is_bad, F.size("tokens") + 1).otherwise(F.size("tokens")).cast("int"),
            ),
        )
        .withColumn(
            "source",
            F.when(
                F.col("op") != "D",
                F.element_at(
                    F.array(*[F.lit(s) for s in _SOURCES]),
                    (_h(seed, 8, F.col("doc_id")) % len(_SOURCES) + 1).cast("int"),
                ),
            ),
        )
        .withColumn(
            "lang",
            F.when(
                F.col("op") != "D",
                F.element_at(
                    F.array(*[F.lit(s) for s in _LANGS]),
                    (_h(seed, 9, F.col("doc_id")) % len(_LANGS) + 1).cast("int"),
                ),
            ),
        )
    )

    # --- event time: monotone with lsn +- bounded jitter ---------------
    jitter = (_h(seed, 10, F.col("lsn")) % 7).cast("long") - 3
    ev = ev.withColumn(
        "ts",
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("lsn") + jitter),
    )

    # --- schema version steps ------------------------------------------
    if with_evolution:
        sv = F.lit(0)
        for step in SCHEMA_EVOLUTION:
            sv = F.when(F.col("lsn") >= int(step["at_frac"] * n_events), step["ver"]).otherwise(sv)
        ev = ev.withColumn("schema_ver", sv.cast("int"))
    else:
        ev = ev.withColumn("schema_ver", F.lit(0))

    ev = ev.select(
        "lsn", "ts", "op", "doc_id", "tokens", "n_tok", "source", "lang", "schema_ver"
    )

    # --- at-least-once duplicates (same lsn, same payload) -------------
    if dup_frac > 0:
        dups = ev.where((_h(seed, 11, F.col("lsn")) % 100_000) < int(dup_frac * 100_000))
        ev = ev.unionAll(dups)

    return ev


def ddl_events(n_events: int) -> list[dict]:
    """The evolution script with absolute LSN positions for a feed size."""
    return [
        {
            "lsn": int(step["at_frac"] * n_events),
            "ver": step["ver"],
            "action": step["action"],
            "args": step["args"],
        }
        for step in SCHEMA_EVOLUTION
    ]


def write_binlog(
    df: DataFrame,
    path: str,
    n_chunks: int = 8,
) -> list[str]:
    """Write the feed as lsn-range chunk files chunk-0000..chunk-N under
    `path` -- the shape a WAL shipper produces, and what both the batch
    backfill (lsn-range epochs with parquet predicate pushdown) and the
    streaming file source (one chunk per micro-batch) consume.

    Range partitioning keeps each chunk an lsn interval, so an epoch reads
    exactly the files that overlap it.

    Row groups are capped at 8 MB (default 128 MB): the consumer reads
    bounded lsn-range epochs, and the row group is the unit of BOTH
    predicate pruning (tighter per-group lsn bounds at the epoch edges)
    and scan splitting -- with one 50 MB+ row group per segment an
    epoch's parquet decode cannot parallelize past its file count no
    matter the core count (measured: the 8M-event bench feed decodes
    4-wide at 16 cores, and re-laying the same rows into small row
    groups + right-sized splits lifted steady apply 309k -> 438k ev/s).
    A real WAL shipper ships thousands of segments so large deployments
    are file-parallel anyway; small row groups make the few-segment
    shape behave the same.
    """
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, "_stage")
    (
        df.repartitionByRange(n_chunks, F.col("lsn"))
        .sortWithinPartitions("lsn")
        .write.mode("overwrite")
        .option("parquet.block.size", 8 << 20)
        .parquet(tmp)
    )
    import shutil

    parts = sorted(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    out = []
    import time as _time

    base = _time.time() - len(parts)
    for i, p in enumerate(parts):
        dst = os.path.join(path, f"chunk-{i:05d}.parquet")
        shutil.move(os.path.join(tmp, p), dst)
        # strictly increasing mtimes: a WAL shipper writes chunks over time,
        # and the streaming file source orders batches by mod timestamp
        os.utime(dst, (base + i, base + i))
        out.append(dst)
    shutil.rmtree(tmp)
    return out
