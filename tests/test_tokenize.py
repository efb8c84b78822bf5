"""Frequency-vocab tokenizer (operators/tokenize.py): known-value id
assignment, OOV handling, and the bridge property -- tokenize output is
directly ingestible by the engine's keyed token tables and satisfies the
applier's n_tok == size(tokens) validity invariant by construction."""

from pyspark.sql import functions as F

from stratum_spark.lake.table import LakeTable
from stratum_spark.operators.tokenize import build_vocab, tokenize


def test_vocab_and_tokenize_known_values(spark):
    docs = spark.createDataFrame(
        [(1, "b a a c"), (2, "a zzz b")], "doc_id bigint, text string")
    vocab = build_vocab(docs, vocab_size=2)
    v = {r["w"]: (r["token_id"], r["n"]) for r in vocab.collect()}
    # a appears 3x -> id 1; b 2x -> id 2; c and zzz fall out of the top-2
    assert v == {"a": (1, 3), "b": (2, 2)}

    out = {r["doc_id"]: (r["tokens"], r["n_tok"])
           for r in tokenize(docs, vocab).collect()}
    assert out[1] == ([2, 1, 1, 0], 4)   # c -> OOV 0
    assert out[2] == ([1, 0, 2], 3)      # zzz -> OOV 0


def test_vocab_tie_break_is_deterministic(spark):
    docs = spark.createDataFrame(
        [(1, "x y"), (2, "y x")], "doc_id bigint, text string")
    v = {r["w"]: r["token_id"]
         for r in build_vocab(docs, vocab_size=2).collect()}
    # equal counts -> word asc
    assert v == {"x": 1, "y": 2}


def test_tokenized_corpus_merges_into_lake_table(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"w{i % 3} common w{i % 5}") for i in range(20)],
        "doc_id bigint, text string")
    out = tokenize(docs, build_vocab(docs, vocab_size=4)).withColumn(
        "doc_id", F.col("doc_id").cast("string"))
    # the applier's validity invariant holds by construction
    assert out.where(F.col("n_tok") != F.size("tokens")).count() == 0

    t = LakeTable.create(
        spark, str(tmp_path / "tok"),
        "doc_id string, tokens array<int>, n_tok int",
        key="doc_id", n_buckets=4)
    t.merge(out, op_col=None)
    back = {r["doc_id"]: list(r["tokens"]) for r in t.read().collect()}
    want = {r["doc_id"]: list(r["tokens"]) for r in out.collect()}
    assert back == want
