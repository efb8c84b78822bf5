"""Token-stream chunking (operators/packing.py): the concat-and-chunk
pretraining layout. The load-bearing property is band-independence --
the banded two-pass prefix sum must produce the exact spans the global
order defines, for ANY band count."""

import random

from pyspark.sql import functions as F

from stratum_spark.operators.packing import chunk_manifest, chunk_token_stream

SCHEMA = "doc_id bigint, n_tok int"


def _mkdocs(spark, n=400, seed=7):
    rng = random.Random(seed)
    rows = [(i, rng.randint(0, 40)) for i in range(n)]
    return rows, spark.createDataFrame(rows, SCHEMA)


def test_spans_match_serial_reference_and_bands_do_not_matter(spark):
    rows, df = _mkdocs(spark)
    C = 64
    # serial reference: one pass over the global order
    want, cum = {}, 0
    for doc, nt in rows:
        if nt <= 0:
            continue
        want[doc] = (cum, cum + nt, cum // C, (cum + nt - 1) // C)
        cum += nt

    for bands in (1, 4, 32):
        got = {
            r["doc_id"]: (r["tok_start"], r["tok_end"],
                          r["chunk_first"], r["chunk_last"])
            for r in chunk_token_stream(
                df, chunk_tokens=C, n_bands=bands).collect()
        }
        assert got == want, f"n_bands={bands}"


def test_manifest_exact_token_accounting(spark):
    rows, df = _mkdocs(spark, n=300, seed=13)
    C = 100
    total = sum(nt for _, nt in rows if nt > 0)
    spans = chunk_token_stream(df, chunk_tokens=C, n_bands=8)
    m = {r["chunk_id"]: (r["n_docs"], r["n_tokens"])
         for r in chunk_manifest(spans, chunk_tokens=C).collect()}
    # contiguous chunk ids, every chunk exactly C tokens except the last
    assert sorted(m) == list(range((total + C - 1) // C))
    last = max(m)
    for cid, (n_docs, n_tokens) in m.items():
        assert n_docs >= 1
        assert n_tokens == (C if cid != last else total - last * C)
    assert sum(v[1] for v in m.values()) == total


def test_zero_token_docs_drop_and_plan_has_no_global_window(spark):
    df = spark.createDataFrame([(1, 0), (2, 5), (3, 0), (4, 3)], SCHEMA)
    out = chunk_token_stream(df, chunk_tokens=4, n_bands=2)
    got = {r["doc_id"]: (r["tok_start"], r["tok_end"]) for r in out.collect()}
    assert got == {2: (0, 5), 4: (5, 8)}
    # scale guard: the window must be partitioned (by band), never a
    # single global-order window
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__band" in plan


def test_take_token_budget_cuts_each_source_deterministically(spark):
    from stratum_spark.operators.packing import take_token_budget

    rows = [
        # source a: cum 10, 30, 60 -> budget 35 keeps docs 1, 2
        (1, "a", 10), (2, "a", 20), (3, "a", 30),
        # source b: cum 5, 10 -> default budget 6 keeps doc 4 only
        (4, "b", 5), (5, "b", 5),
        # zero-token docs never count against (or into) the budget
        (6, "a", 0),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, n_tok int")
    got = sorted(
        r["doc_id"]
        for r in take_token_budget(
            df, {"a": 35}, default_budget=6).collect()
    )
    assert got == [1, 2, 4]


def test_shuffle_shards_balanced_deterministic_and_salted(spark):
    from stratum_spark.operators.packing import shuffle_shards

    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id bigint")
    a = {r["doc_id"]: (r["rank"], r["shard"], r["pos_in_shard"])
         for r in shuffle_shards(df, n_shards=8, n_bands=4).collect()}
    # a permutation: ranks are exactly 0..99; shards balanced within 1
    assert sorted(r for r, _, _ in a.values()) == list(range(100))
    by_shard = {}
    for _, s, _ in a.values():
        by_shard[s] = by_shard.get(s, 0) + 1
    assert set(by_shard) == set(range(8))
    assert max(by_shard.values()) - min(by_shard.values()) <= 1
    # the order is shuffled, not identity
    assert [a[i][0] for i in range(100)] != list(range(100))
    # deterministic: bands don't matter; same salt -> same permutation
    b = {r["doc_id"]: (r["rank"], r["shard"], r["pos_in_shard"])
         for r in shuffle_shards(df, n_shards=8, n_bands=1).collect()}
    assert a == b
    # a different salt is a different permutation
    c = {r["doc_id"]: r["rank"]
         for r in shuffle_shards(df, n_shards=8, salt="epoch1").collect()}
    assert c != {k: v[0] for k, v in a.items()}
    assert sorted(c.values()) == list(range(100))


def test_chunk_manifest_straddling_doc_counted_in_every_chunk(spark):
    # one 10-token doc with C=3 straddles chunks 0..3
    df = spark.createDataFrame([(1, 10)], SCHEMA)
    spans = chunk_token_stream(df, chunk_tokens=3, n_bands=1)
    m = {r["chunk_id"]: (r["n_docs"], r["n_tokens"])
         for r in chunk_manifest(spans, chunk_tokens=3).collect()}
    assert m == {0: (1, 3), 1: (1, 3), 2: (1, 3), 3: (1, 1)}


def test_banded_prefix_pins_one_snapshot_of_nondeterministic_input(spark):
    """_banded_prefix evaluates its input three times (quantile cuts,
    band totals, final windowed plan). The input is localCheckpoint()ed
    so all three passes see ONE snapshot -- with a nondeterministic
    upstream (rand() here; a table mutated mid-query in production) the
    unpinned form lets band totals disagree with the final pass and
    silently corrupts offsets. The output must be one internally
    consistent prefix sum over the rows it returns."""
    df = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        (F.floor(F.rand() * 50) + 1).cast("int").alias("n_tok"),
    )
    out = (
        chunk_token_stream(df, chunk_tokens=64, n_bands=8)
        .orderBy("doc_id")
        .collect()
    )
    assert len(out) == 2000
    cum = 0
    for r in out:
        assert r["tok_start"] == cum, (r, cum)
        cum += r["n_tok"]
        assert r["tok_end"] == cum
