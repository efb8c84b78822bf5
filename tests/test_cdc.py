"""CDC end-to-end: distributed applier vs sequential replay oracle.

Mirrors the reference's integration strategy: exactly-once resume
(crates/engine-tests/src/resume.rs:50-127 -- COUNT(DISTINCT pk) == source,
no gaps/dupes), validation-to-DLQ (integration.rs:570,1177), and mid-stream
schema evolution (generator.rs:274-282), recast on the tokens/binlog domain.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stratum_spark.cdc import CdcApplier, generate_binlog, write_binlog
from stratum_spark.cdc.binlog import ddl_events
from stratum_spark.cdc.dedup import lww_dedup, lww_dedup_window
from stratum_spark.cdc.oracle import replay_binlog, state_as_records

N_DOCS, N_EVENTS, EPOCH = 300, 2000, 400


@pytest.fixture(scope="module")
def binlog_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("binlog")
    df = generate_binlog(spark, n_docs=N_DOCS, n_events=N_EVENTS, seed=42, max_tokens=32)
    write_binlog(df, str(d), n_chunks=5)
    return str(d)


def collect_state(applier):
    return {r["doc_id"]: r.asDict() for r in applier.state().collect()}


def run_full(spark, binlog_dir, warehouse):
    ap = CdcApplier(
        spark, warehouse, job_id="t", n_buckets=8, n_events_hint=N_EVENTS
    )
    stats = ap.run_backfill(binlog_dir, epoch_size=EPOCH)
    return ap, stats


def test_binlog_deterministic(spark):
    a = generate_binlog(spark, n_docs=50, n_events=200, seed=7).orderBy("lsn").collect()
    b = generate_binlog(spark, n_docs=50, n_events=200, seed=7).orderBy("lsn").collect()
    assert a == b
    c = generate_binlog(spark, n_docs=50, n_events=200, seed=8).orderBy("lsn").collect()
    assert a != c


def test_lww_dedup_variants_agree(spark):
    df = generate_binlog(spark, n_docs=20, n_events=500, seed=1, with_evolution=False)
    a = lww_dedup(df, "doc_id", "lsn")
    b = lww_dedup_window(df, "doc_id", "lsn")
    assert a.count() == b.count() == df.select("doc_id").distinct().count()
    ja = {r["doc_id"]: r["lsn"] for r in a.collect()}
    jb = {r["doc_id"]: r["lsn"] for r in b.collect()}
    assert ja == jb


def test_backfill_matches_oracle(spark, binlog_dir, tmp_path):
    ap, stats = run_full(spark, binlog_dir, str(tmp_path / "wh"))
    assert all(not s.skipped for s in stats)

    # schema evolved through the scripted DDL
    assert ap.epoch_state()["schema_ver"] == 3
    names = ap.tokens.snapshot().schema.names
    assert "corpus" in names and "lang" in names and "source" not in names
    assert ap.tokens.snapshot().schema.field_by_name("n_tok").type == "bigint"

    got = collect_state(ap)
    st = replay_binlog(binlog_dir)
    want = state_as_records(st, table_schema_ver=3)
    assert set(got) == set(want)
    for doc_id, w in want.items():
        g = got[doc_id]
        assert g["tokens"] == w["tokens"], doc_id          # per-row token equality
        assert g["n_tok"] == w["n_tok"] and g["corpus"] == w["corpus"]
        assert g["lang"] == w["lang"], doc_id

    # DLQ got exactly the invalid events
    dlq_lsns = sorted(r["lsn"] for r in ap.dlq.read().collect())
    assert dlq_lsns == sorted(st.dlq_lsns)
    assert len(dlq_lsns) > 0, "fixture should produce some invalid rows"

    # lineage has a summary row per epoch with consistent counts
    lin = ap.lineage.read().where(F.col("partition_id") == -1).orderBy("epoch").collect()
    assert len(lin) == len(stats)
    assert sum(r["rows_dlq"] for r in lin) == len(dlq_lsns)


def test_kill_and_resume_converges(spark, binlog_dir, tmp_path):
    # reference: one-shot run
    ap_ref, _ = run_full(spark, binlog_dir, str(tmp_path / "ref"))
    want = collect_state(ap_ref)

    # crashed run: stop after 2 epochs, then new applier resumes same warehouse
    wh = str(tmp_path / "crash")
    ap1 = CdcApplier(spark, wh, job_id="t", n_buckets=8, n_events_hint=N_EVENTS)
    s1 = ap1.run_backfill(binlog_dir, epoch_size=EPOCH, stop_after=2)
    assert len(s1) == 2

    ap2 = CdcApplier(spark, wh, job_id="t", n_buckets=8, n_events_hint=N_EVENTS)
    s2 = ap2.run_backfill(binlog_dir, epoch_size=EPOCH)
    assert s2 and all(not s.skipped for s in s2)

    got = collect_state(ap2)
    assert got == want

    # exactly-once: no duplicate keys
    n, nd = ap2.tokens.read().count(), ap2.tokens.read().select("doc_id").distinct().count()
    assert n == nd


def test_epoch_replay_is_noop(spark, binlog_dir, tmp_path):
    ap = CdcApplier(spark, str(tmp_path / "wh2"), job_id="t", n_buckets=8,
                    n_events_hint=N_EVENTS)
    feed = spark.read.parquet(binlog_dir).where(F.col("lsn") <= EPOCH)
    s1 = ap.apply_epoch(feed, 0)
    assert not s1.skipped
    before = collect_state(ap)
    s2 = ap.apply_epoch(feed, 0)  # re-delivery of the whole epoch
    assert s2.skipped
    assert collect_state(ap) == before


def _oracle_dlq_lsns(binlog_dir, epochs: range) -> list[int]:
    st = replay_binlog(binlog_dir)
    lo, hi = epochs.start * EPOCH + 1, epochs.stop * EPOCH
    return sorted(l for l in st.dlq_lsns if lo <= l <= hi)


def test_dlq_exactly_once_crash_after_dlq_before_merge(spark, binlog_dir, tmp_path):
    """Crash window A: the DLQ append committed but the merge did not. The
    replayed epoch's (bookmarked) DLQ append must be a no-op -- the DLQ lsn
    set stays exact, no duplicates."""
    wh = str(tmp_path / "whA")
    ap1 = CdcApplier(spark, wh, job_id="t", n_buckets=8, evolution=[])
    feed = spark.read.parquet(binlog_dir)
    sl0 = feed.where(F.col("lsn") <= EPOCH)
    # run prepare only: the DLQ future commits, then "crash" before the merge
    prep = ap1._prepare_epoch(sl0, 0)
    prep["dlq_future"].result()
    prep["pool"].shutdown(wait=True)
    prep["events"].unpersist()
    assert ap1.tokens.committed_epoch("t") == -1  # main commit never happened
    assert ap1.dlq.committed_epoch("t") == 0  # DLQ commit survived the crash

    # restart: the full backfill replays epoch 0 end-to-end
    ap2 = CdcApplier(spark, wh, job_id="t", n_buckets=8, evolution=[])
    ap2.run_backfill(binlog_dir, epoch_size=EPOCH)
    got = sorted(r["lsn"] for r in ap2.dlq.read().collect())
    assert got and got == _oracle_dlq_lsns(binlog_dir, range(0, N_EVENTS // EPOCH))


def test_dlq_exactly_once_crash_after_merge_before_dlq(spark, binlog_dir, tmp_path):
    """Crash window B: the merge committed but the DLQ flush was lost. The
    resumed backfill's catch-up must restore exactly that epoch's DLQ rows."""
    wh = str(tmp_path / "whB")
    ap1 = CdcApplier(spark, wh, job_id="t", n_buckets=8, evolution=[])
    # simulate the lost DLQ flush: epoch 0 runs with the DLQ append stubbed out
    ap1._append_dlq_epoch = lambda events, epoch: 0
    ap1.run_backfill(binlog_dir, epoch_size=EPOCH, stop_after=1)
    assert ap1.tokens.committed_epoch("t") == 0
    assert ap1.dlq.committed_epoch("t") == -1 and ap1.dlq.row_count() == 0

    ap2 = CdcApplier(spark, wh, job_id="t", n_buckets=8, evolution=[])
    ap2.run_backfill(binlog_dir, epoch_size=EPOCH)
    got = sorted(r["lsn"] for r in ap2.dlq.read().collect())
    assert got == _oracle_dlq_lsns(binlog_dir, range(0, N_EVENTS // EPOCH))
    # and a second resume changes nothing (idempotent catch-up)
    ap3 = CdcApplier(spark, wh, job_id="t", n_buckets=8, evolution=[])
    ap3.run_backfill(binlog_dir, epoch_size=EPOCH)
    assert sorted(r["lsn"] for r in ap3.dlq.read().collect()) == got


def test_broadcast_lww_tie_copies_identical_payload(spark):
    """The identical-payload-on-tie contract that makes the broadcast LWW
    strategy safe: the at-least-once feed re-emits events with the SAME
    (lsn, payload); lww_dedup_broadcast keeps every tie copy (delta files
    are not (doc_id, lsn)-unique) where the collapsing aggregate keeps
    one -- state-equivalent because all copies of a winner are identical.
    Asserts (a) the feed contract and (b) strategy state-equivalence."""
    import pyspark.sql.functions as F

    from stratum_spark.cdc.dedup import lww_dedup_broadcast

    df = generate_binlog(spark, n_docs=40, n_events=1500, seed=5,
                         dup_frac=0.08, with_evolution=False)
    assert df.count() > df.select("doc_id", "lsn").distinct().count()
    # (a) every (doc_id, lsn) tie group carries exactly ONE distinct payload
    ties = (
        df.groupBy("doc_id", "lsn")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct(
                F.struct("op", "tokens", "n_tok", "source", "schema_ver")
            ).alias("payloads"),
        )
        .where("n > 1")
    )
    assert ties.count() > 0
    assert ties.where("payloads > 1").count() == 0
    # (b) broadcast keeps tie copies; resolving them reproduces lww_dedup
    a = lww_dedup(df, "doc_id", "lsn")
    b = lww_dedup_broadcast(df, "doc_id", "lsn")
    assert b.count() >= a.count()
    want = {r["doc_id"]: (r["lsn"], r["tokens"]) for r in a.collect()}
    got = {r["doc_id"]: (r["lsn"], r["tokens"])
           for r in b.dropDuplicates(["doc_id"]).collect()}
    assert got == want


def test_pick_lww_strategy_cost_model():
    """The auto LWW decision is an EVALUATED cost model, not a constant:
    both bounds must flip it. Numbers shaped like the bench feed
    (2M-event epochs ~512 MB, ~0.7M winners)."""
    from stratum_spark.cdc.dedup import pick_lww_strategy

    s, i = pick_lww_strategy(700_000, 512 << 20, parallelism=4)
    assert s == "broadcast" and i["p_star"] >= 4
    # serial-floor bound: the broadcast build can't amortize past P*
    s, i = pick_lww_strategy(700_000, 512 << 20, parallelism=16)
    assert s == "shuffle" and i["p_star"] < 16
    # cluster traffic bound: winner-relation copies dominate at high
    # executor counts even at low per-executor parallelism
    s, i = pick_lww_strategy(700_000, 512 << 20, parallelism=4, n_executors=200)
    assert s == "shuffle" and i["bc_traffic_bytes"] >= i["shuffle_traffic_bytes"]
    # tiny epochs: the serial build floor dominates at ANY parallelism
    s, _ = pick_lww_strategy(10_000, 4 << 20, parallelism=1)
    assert s == "shuffle"


def test_lww_auto_resolves_from_observed_stats(spark, binlog_dir, tmp_path):
    """lww_strategy='auto' re-evaluates per epoch from the previous
    epoch's observed (winners, bytes); planting stats flips the decision
    both ways, and a real backfill populates the observation."""
    ap = CdcApplier(spark, str(tmp_path / "whL"), job_id="t", n_buckets=8,
                    evolution=[], write_mode="mor")
    assert ap.lww_auto and ap._lww_obs is None
    P = spark.sparkContext.defaultParallelism
    # epoch big enough that P* = 2*bytes/xover > P -> broadcast
    ap._lww_obs = {"winners": 1000, "epoch_bytes": (128 << 20) * P, "rows_in": 10}
    assert ap._lww_strategy_for_epoch(1) == "broadcast"
    # tiny epoch: serial build floor dominates -> shuffle
    ap._lww_obs = {"winners": 1000, "epoch_bytes": 1 << 20, "rows_in": 10}
    assert ap._lww_strategy_for_epoch(2) == "shuffle"

    ap2 = CdcApplier(spark, str(tmp_path / "whL2"), job_id="t", n_buckets=8,
                     evolution=[], write_mode="mor")
    ap2.run_backfill(binlog_dir, epoch_size=EPOCH, stop_after=2)
    assert ap2._lww_obs is not None
    assert ap2._lww_obs["winners"] > 0 and ap2._lww_obs["epoch_bytes"] > 0
    # explicit strategies bypass the model entirely
    ap3 = CdcApplier(spark, str(tmp_path / "whL3"), job_id="t", n_buckets=8,
                     evolution=[], write_mode="mor", lww_strategy="broadcast")
    ap3._lww_obs = {"winners": 1000, "epoch_bytes": 1 << 20, "rows_in": 10}
    assert ap3._lww_strategy_for_epoch(0) == "broadcast"


def test_dlq_pipelined_commits_in_epoch_order(spark, binlog_dir, tmp_path):
    """Overlapped epochs' DLQ appends race the DLQ table's MONOTONIC
    exactly-once bookmark: if epoch N+1's commit lands before epoch N's,
    N's rows are silently dropped (the `epoch <= last` replay guard eats
    them) and _dlq_catchup can never repair it. All DLQ appends therefore
    funnel through one single-worker pool in epoch order. This test makes
    epoch 0's append SLOW while the pipelined loop prefetches epoch 1 --
    under per-epoch pools epoch 1's commit won the race and epoch 0's DLQ
    rows vanished; with the serialized pool the full set survives."""
    import time as _t

    wh = str(tmp_path / "whO")
    ap = CdcApplier(spark, wh, job_id="t", n_buckets=8, evolution=[])
    orig = ap._append_dlq_epoch

    def slow_epoch0(events, epoch):
        if epoch == 0:
            _t.sleep(2.0)  # epoch 1's append would overtake without the pool
        return orig(events, epoch)

    ap._append_dlq_epoch = slow_epoch0
    ap.run_backfill(binlog_dir, epoch_size=EPOCH, pipelined=True)
    got = sorted(r["lsn"] for r in ap.dlq.read().collect())
    assert got == _oracle_dlq_lsns(binlog_dir, range(0, N_EVENTS // EPOCH))


def test_pipelined_backfill_matches_serial(spark, binlog_dir, tmp_path):
    """Epoch pipelining (prepare N+1 concurrent with commit N) must be
    invisible in the final state."""
    ap_s = CdcApplier(spark, str(tmp_path / "ser"), job_id="t", n_buckets=8,
                      n_events_hint=N_EVENTS)
    ap_s.run_backfill(binlog_dir, epoch_size=EPOCH, pipelined=False)
    ap_p = CdcApplier(spark, str(tmp_path / "pipe"), job_id="t", n_buckets=8,
                      n_events_hint=N_EVENTS)
    stats = ap_p.run_backfill(binlog_dir, epoch_size=EPOCH, pipelined=True)
    assert all(not s.skipped for s in stats)
    assert collect_state(ap_p) == collect_state(ap_s)


def test_backfill_validate_off_no_duplicate_keys(spark, tmp_path):
    """With validation OFF, invalid rows merge like any other row -- their
    buckets must still be discovered as touched, otherwise the merge writes
    a key into a bucket whose old files were kept and the key duplicates."""
    from pyspark.sql import functions as F

    from stratum_spark.cdc import CdcApplier, generate_binlog, write_binlog

    feed = generate_binlog(spark, n_docs=60, n_events=300, seed=11, max_tokens=8,
                           with_evolution=False)
    write_binlog(feed, str(tmp_path / "b"), n_chunks=1)
    assert feed.where((F.col("op") != "D") & ~F.col("n_tok").eqNullSafe(F.size("tokens"))).count() > 0
    ap = CdcApplier(spark, str(tmp_path / "wh"), job_id="nv", n_buckets=4,
                    evolution=[], validate=False)
    ap.run_backfill(str(tmp_path / "b"), epoch_size=75)
    st = ap.state()
    assert st.groupBy("doc_id").count().where("count > 1").count() == 0
    assert st.count() == st.select("doc_id").distinct().count()


def test_feed_split_tuning_adaptive_with_hysteresis(spark, tmp_path):
    """_tune_feed_split sizes spark.sql.files.maxPartitionBytes from a
    decaying max of observed epoch bytes: clamps to [8MB, 128MB], ignores
    unrepresentative tiny epochs (a heartbeat must not clamp the session
    right before a large epoch plans its scan), but adapts downward when
    the workload genuinely shrinks."""
    from stratum_spark.cdc import CdcApplier

    key = "spark.sql.files.maxPartitionBytes"
    orig = spark.conf.get(key)
    try:
        ap = CdcApplier(spark, str(tmp_path / "wh"), job_id="tune",
                        n_buckets=4, evolution=[])
        par = max(spark.sparkContext.defaultParallelism, 1)
        ap._tune_feed_split((128 << 20) * 2 * par)     # big epoch
        assert spark.conf.get(key) == str(128 << 20)   # clamped high
        ap._tune_feed_split(1000)                      # heartbeat: ignored
        assert spark.conf.get(key) == str(128 << 20)
        for _ in range(100):                           # genuine shrink
            ap._tune_feed_split(2 << 20)
        assert spark.conf.get(key) == str(8 << 20)     # re-sized down
        mid = 32 * (2 * par) << 20                     # 32MB/core target
        for _ in range(60):
            ap._tune_feed_split(mid)
        assert spark.conf.get(key) == str(32 << 20)
    finally:
        spark.conf.set(key, orig)
