"""Demo: the full training-data path over the raw documents corpus --
every stage a large-scale pretraining pipeline runs, composed end-to-end
on this engine:

    quality/repetition filter -> PII scrub -> benchmark decontamination
    -> near-dup pairs -> duplicate-cluster resolution (keep one canonical
    doc per cluster) -> frequency-vocab tokenization -> MERGE into a
    keyed lake token table -> per-source token budgets -> deterministic
    corpus shuffle/sharding -> concat-and-chunk packing + chunk manifest.

Run:  python examples/run_training_pipeline.py [sf_dir]
(default sf_dir /root/testdata/sf0.001; prints per-stage attrition)
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from stratum_spark import get_spark
from stratum_spark.lake.table import LakeTable
from stratum_spark.operators.dedup import (
    contamination_pairs,
    dup_clusters,
    ngram_jaccard_pairs,
)
from stratum_spark.operators.packing import (
    chunk_manifest,
    chunk_token_stream,
    shuffle_shards,
    take_token_budget,
)
from stratum_spark.operators.textops import (
    pii_scrub,
    quality_scores,
    repetition_scores,
)
from stratum_spark.operators.tokenize import build_vocab, tokenize


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("training-pipeline-demo", cores=4)
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    n0 = docs.count()
    print(f"corpus: {n0} docs")

    # 1. quality + repetition filter
    q = quality_scores(docs).select("doc_id", "quality")
    r = repetition_scores(docs).select("doc_id", "repetitive")
    keep = (
        docs.join(q, "doc_id").join(r, "doc_id")
        .where((F.col("quality") >= 0.5) & ~F.col("repetitive"))
        .select("doc_id", "text", "source")
    )
    n1 = keep.count()
    print(f"quality filter: {n1} kept ({n0 - n1} dropped)")

    # 2. PII scrub (redacted text flows downstream)
    keep = (
        keep.join(pii_scrub(keep).select("doc_id", "redacted"), "doc_id")
        .select("doc_id", F.col("redacted").alias("text"), "source")
    )

    # 3. decontamination vs a held-out benchmark slice
    bench = docs.where(F.col("doc_id") % 50 == 0)
    leaked = (
        contamination_pairs(keep, bench, n=3, min_shared=5)
        .select("doc_id").distinct()
    )
    # cache the surviving corpus: everything downstream (pairs, vocab,
    # tokenize, merge) scans it repeatedly
    keep = keep.join(leaked, "doc_id", "left_anti").persist()
    n2 = keep.count()
    print(f"decontamination: {n2} kept ({n1 - n2} leaked docs dropped)")

    # 4. near-dup clusters -> keep the canonical min-id doc per cluster
    pairs = ngram_jaccard_pairs(keep, n=3, tau=0.5)
    clusters = dup_clusters(pairs) if pairs.count() else None
    if clusters is not None:
        losers = clusters.where(F.col("doc_id") != F.col("cluster")) \
            .select("doc_id")
        keep = keep.join(losers, "doc_id", "left_anti").persist()
    n3 = keep.count()
    print(f"dedup: {n3} kept ({n2 - n3} non-canonical dup docs dropped)")

    # 5. tokenize through the corpus frequency vocab
    vocab = build_vocab(keep, vocab_size=24)
    toks = tokenize(keep, vocab).join(
        keep.select("doc_id", "source"), "doc_id")
    print(f"vocab: {vocab.count()} words; "
          f"tokens: {toks.agg(F.sum('n_tok')).first()[0]}")

    # 6. MERGE into a keyed lake token table (the CDC engine's schema)
    wh = tempfile.mkdtemp(prefix="trainpipe_")
    t = LakeTable.create(
        spark, f"{wh}/tokens",
        "doc_id string, tokens array<int>, n_tok int, source string",
        key="doc_id", n_buckets=4)
    t.merge(toks.withColumn("doc_id", F.col("doc_id").cast("string")),
            op_col=None)
    lake = t.read()
    print(f"lake table: {lake.count()} rows committed at {t.root}")

    # 7. per-source token budgets -> shuffle/shard -> concat-and-chunk
    mix = take_token_budget(
        lake.withColumn("doc_id", F.col("doc_id").cast("bigint")),
        budgets={}, default_budget=400)
    n4, ntok = mix.count(), mix.agg(F.sum("n_tok")).first()[0]
    print(f"mix budgets: {n4} docs / {ntok} tokens selected")

    shards = shuffle_shards(mix, n_shards=4)
    per = sorted((r["shard"], r["n"]) for r in
                 shards.groupBy("shard").agg(F.count("*").alias("n")).collect())
    print(f"shards: {per}")

    spans = chunk_token_stream(mix, chunk_tokens=128)
    man = chunk_manifest(spans, chunk_tokens=128)
    rows = man.orderBy("chunk_id").collect()
    full = [r for r in rows if r["n_tokens"] == 128]
    print(f"chunks: {len(rows)} of 128 tokens "
          f"({len(full)} full, tail {rows[-1]['n_tokens']} tokens)")
    assert sum(r["n_tokens"] for r in rows) == ntok
    print("PIPELINE OK: chunk accounting matches selected tokens exactly")
    return 0


if __name__ == "__main__":
    sys.exit(main())
