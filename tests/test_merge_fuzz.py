"""Seeded randomized merge semantics fuzz: arbitrary I/U/D sequences applied
epoch-wise through LakeTable.merge must equal a trivial dict replay.
(Deterministic seeds rather than hypothesis shrinking -- each example costs
Spark jobs, and failures replay exactly by seed.)"""

from __future__ import annotations

import random

import pytest

from stratum_spark.cdc.dedup import lww_dedup
from stratum_spark.lake import LakeTable

DDL = "k string, v int, lsn bigint"


def model_replay(events):
    state = {}
    for lsn, op, k, v in sorted(events):
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = (v, lsn)
    return state


@pytest.mark.parametrize("seed", [11, 23, 59])
def test_merge_fuzz_matches_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    keys = [f"k{i}" for i in range(12)]
    events = []
    lsn = 0
    for _ in range(300):
        lsn += 1
        op = rng.choices(["I", "U", "D"], weights=[2, 5, 2])[0]
        events.append((lsn, op, rng.choice(keys), rng.randrange(1000)))

    t = LakeTable.create(spark, str(tmp_path / f"t{seed}"), DDL, key="k", n_buckets=4)
    # apply in 5 epochs of 60 events, LWW dedup within each epoch
    for ep in range(5):
        chunk = events[ep * 60 : (ep + 1) * 60]
        df = spark.createDataFrame(
            [(k, v, lsn_) for (lsn_, op, k, v) in chunk],
            DDL,
        ).join(
            spark.createDataFrame(
                [(lsn_, op) for (lsn_, op, _, _) in chunk], "lsn bigint, op string"
            ),
            "lsn",
        )
        deduped = lww_dedup(df, key="k", order_col="lsn")
        t.merge(deduped, op_col="op", job_id="fuzz", epoch=ep, precedence_col="lsn")

    want = model_replay(events)
    got = {r["k"]: (r["v"], r["lsn"]) for r in t.read().collect()}
    assert got == want, f"seed={seed}"
    # replaying every epoch again changes nothing (exactly-once)
    for ep in range(5):
        st = t.merge(
            spark.createDataFrame([("k0", 1, 9999)], DDL),
            op_col=None,
            job_id="fuzz",
            epoch=ep,
        )
        assert st.epoch_skipped
    assert {r["k"]: (r["v"], r["lsn"]) for r in t.read().collect()} == want


@pytest.mark.parametrize("seed", [7, 31, 101])
def test_mor_fuzz_random_feed_kill_resume_compaction(spark, tmp_path, seed):
    """Merge-on-read fuzz: an ARBITRARY seeded event stream (not the
    generator's shape) with invalid rows, random epoch size, a random
    kill point, a resume in a fresh applier, and a random compaction
    policy must converge to the dict-replay oracle with every
    (doc_id, lsn) applied at most once."""
    import datetime

    from stratum_spark.cdc import CdcApplier, write_binlog
    from stratum_spark.cdc.binlog import BINLOG_DDL
    from stratum_spark.cdc.oracle import replay_binlog, state_as_records

    rng = random.Random(seed)
    rows = []
    for lsn in range(1, 401):
        doc = f"d{rng.randrange(20):02d}"
        op = rng.choices(["I", "U", "D"], weights=[2, 5, 2])[0]
        if op == "D":
            toks, n_tok, source, lang = None, None, None, None
        else:
            toks = [rng.randrange(100) for _ in range(rng.randrange(1, 5))]
            # ~5% invalid rows must land in the DLQ, never the table
            n_tok = len(toks) + (1 if rng.random() < 0.05 else 0)
            source, lang = rng.choice(["web", "books"]), rng.choice(["en", "de"])
        rows.append(
            (lsn, datetime.datetime(2026, 1, 1), op, doc, toks, n_tok, source, lang, 0)
        )
    feed = spark.createDataFrame(rows, BINLOG_DDL)
    binlog = str(tmp_path / "binlog")
    write_binlog(feed, binlog, n_chunks=3)

    epoch_size = rng.choice([60, 90, 130])
    ratio = rng.choice([None, 0.4])
    wh = str(tmp_path / "wh")
    ap1 = CdcApplier(spark, wh, job_id="fz", n_buckets=4, evolution=[],
                     write_mode="mor", auto_compact_ratio=ratio)
    ap1.run_backfill(binlog, epoch_size=epoch_size,
                     stop_after=rng.randrange(1, 3))  # the kill
    ap2 = CdcApplier(spark, wh, job_id="fz", n_buckets=4, evolution=[],
                     write_mode="mor", auto_compact_ratio=ratio)
    ap2.run_backfill(binlog, epoch_size=epoch_size)
    ap2.compact_deltas()

    want = state_as_records(replay_binlog(binlog), table_schema_ver=0)
    got = {r["doc_id"]: r.asDict() for r in ap2.state().collect()}
    assert set(got) == set(want), (set(got) ^ set(want))
    for k, w in want.items():
        assert list(got[k]["tokens"]) == list(w["tokens"]), (k, seed)
        assert got[k]["source"] == w["source"], (k, seed)
    n = ap2.tokens.read().count()
    assert n == ap2.tokens.read().select("doc_id").distinct().count()
