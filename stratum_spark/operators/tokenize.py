"""Deterministic frequency-vocab tokenizer: the text -> token-id bridge
between the raw `documents` corpus and the `tokens array<int>` tables the
CDC engine ingests.

This is the word-level stand-in for a BPE tokenizer (no tokenizer libs in
this runtime): build a vocabulary of the top-K words by corpus frequency
(ids 1..K by count desc then word asc; 0 reserved for OOV), then map each
document's words to ids in order. Both steps are exact, reproducible, and
SQL-oracle-checkable.

Scale shape: the vocab top-K is Spark's TakeOrderedAndProject (per-
partition partial top-K, driver merge of K rows -- no full sort); the id
window then runs over exactly K rows. Tokenization is posexplode ->
BROADCAST vocab join (a vocabulary is tiny by definition) -> per-doc
re-assembly via array_sort of (pos, id) structs -- the only shuffle is
the per-doc groupBy, partitioned by doc_id, state bounded by document
length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

OOV_ID = 0


def _words(text_col):
    return F.split(F.trim(F.lower(text_col)), r"\s+")


def build_vocab(docs: DataFrame, vocab_size: int = 1000,
                min_count: int = 1) -> DataFrame:
    """(w, n, token_id): the top `vocab_size` corpus words by frequency,
    ids 1..K ordered by (count desc, word asc) -- deterministic under
    ties. id 0 is reserved for OOV and never assigned."""
    counts = (
        docs.select(F.explode(_words(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= min_count)
    )
    # TakeOrderedAndProject: partial top-K per partition, K-row driver
    # merge; the row_number window below sees only those K rows
    top = counts.orderBy(F.desc("n"), F.asc("w")).limit(int(vocab_size))
    w = Window.orderBy(F.desc("n"), F.asc("w"))
    return top.withColumn("token_id", F.row_number().over(w))


def tokenize(docs: DataFrame, vocab: DataFrame,
             text_col: str = "text") -> DataFrame:
    """(doc_id, tokens array<int>, n_tok): each document's words mapped
    to vocabulary ids in order; out-of-vocabulary words map to OOV_ID.
    Output shape matches the CDC engine's token-table schema, so a text
    corpus tokenized here can be ingested/merged directly."""
    words = docs.select(
        "doc_id", F.posexplode(_words(F.col(text_col))).alias("pos", "w"))
    j = words.join(F.broadcast(vocab.select("w", "token_id")), "w", "left")
    toks = (
        j.groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct(
                    "pos", F.coalesce("token_id", F.lit(OOV_ID)).alias("tid")))),
                lambda s: s["tid"],
            ).alias("tokens")
        )
        .withColumn("n_tok", F.size("tokens"))
    )
    return toks
