"""Round-6 additions: stats-fold (one less epoch action), per-file lineage
offset ranges from parquet footers, walls-based online LWW calibration, and
zero-extra-job streaming receipts.

Reference parity anchors: the folded stats mirror the reference's per-batch
MetricsSnapshot gathered during the apply itself
(crates/engine-infra/src/metrics.rs:22-31); the persisted cross-over mirrors
its estimator constants (crates/engine-analyzer/src/estimator.rs:22-60) made
observational.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from stratum_spark.cdc import CdcApplier, generate_binlog, write_binlog
from stratum_spark.cdc.dedup import pick_lww_strategy, xover_from_walls
from stratum_spark.cdc.oracle import replay_binlog, state_as_records
from stratum_spark.lake.table import FileEntry


@pytest.fixture(scope="module")
def binlog6(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("r6_binlog")
    df = generate_binlog(spark, n_docs=400, n_events=4000, seed=13,
                         max_tokens=24, with_evolution=False)
    write_binlog(df, str(d), n_chunks=4)
    return str(d)


def _oracle(binlog_dir):
    return state_as_records(replay_binlog(binlog_dir), table_schema_ver=0)


# ---------------------------------------------------------------------------
# planted-walls calibration (round-5 verdict item 3 done-criterion: a test
# planting slow/fast observed walls flips the decision WITHOUT env vars)
# ---------------------------------------------------------------------------
def test_xover_from_walls_flips_decision_without_env():
    epoch_bytes, parallelism = 512 << 20, 4
    # slow broadcast (10 s) vs fast shuffle (2 s) at P=4: the implied
    # cross-over sits BELOW the operating point -> shuffle
    slow_bc = xover_from_walls(10.0, 2.0, epoch_bytes, parallelism)
    s1, i1 = pick_lww_strategy(700_000, epoch_bytes, parallelism, 1,
                               xover_bytes_per_core=slow_bc)
    assert s1 == "shuffle" and i1["p_star"] < parallelism
    # fast broadcast (1 s) vs slow shuffle (5 s): cross-over above -> broadcast
    fast_bc = xover_from_walls(1.0, 5.0, epoch_bytes, parallelism)
    s2, i2 = pick_lww_strategy(700_000, epoch_bytes, parallelism, 1,
                               xover_bytes_per_core=fast_bc)
    assert s2 == "broadcast" and i2["p_star"] > parallelism
    # clamps: a steal-poisoned extreme sample cannot wedge the decision
    assert xover_from_walls(1e6, 1e-9, epoch_bytes, 64) <= 4 << 30
    assert xover_from_walls(1e-9, 1e6, epoch_bytes, 64) >= 8 << 20


def test_lww_probe_calibrates_and_persists(spark, binlog6, tmp_path, monkeypatch):
    """STRATUM_LWW_PROBE=1 forces the one-epoch probe of the non-picked
    strategy; with warm samples of both, the applier calibrates the
    cross-over from the observed walls, logs it, persists it in the table
    properties, and a fresh applier on the same warehouse inherits it.
    State equality with the replay oracle must hold across the probe epoch
    (the strategies are state-equivalent by contract)."""
    monkeypatch.setenv("STRATUM_LWW_PROBE", "1")
    wh = str(tmp_path / "wh_cal")
    ap = CdcApplier(spark, wh, job_id="cal", n_buckets=8, evolution=[],
                    write_mode="mor", lww_strategy="auto")
    ap.run_backfill(binlog6, epoch_size=800)
    assert "broadcast" in ap._lww_walls and "shuffle" in ap._lww_walls
    assert ap._lww_xover is not None and ap._lww_cal is not None
    assert (8 << 20) <= ap._lww_xover <= (4 << 30)
    persisted = ap.tokens.snapshot().properties.get("lww_xover_bytes_per_core")
    assert persisted == str(ap._lww_xover)
    # correctness across the probe epoch
    ap.compact_deltas()
    got = {r["doc_id"]: r["tokens"] for r in ap.state().collect()}
    want = {k: v["tokens"] for k, v in _oracle(binlog6).items()}
    assert got == want
    # inheritance: a new applier on the same warehouse starts calibrated
    ap2 = CdcApplier(spark, wh, job_id="cal2", n_buckets=8, evolution=[],
                     write_mode="mor", lww_strategy="auto")
    assert ap2._lww_xover == ap._lww_xover


def test_lww_probe_auto_skips_when_model_confident(spark, binlog6, tmp_path,
                                                   monkeypatch):
    """Default probe mode 'auto' spends an epoch only inside the 1.5x
    uncertainty band around P*; tiny epochs at parallelism far from the
    cross-over must NOT probe (the bench path stays unperturbed)."""
    monkeypatch.delenv("STRATUM_LWW_PROBE", raising=False)
    ap = CdcApplier(spark, str(tmp_path / "wh_np"), job_id="np", n_buckets=8,
                    evolution=[], write_mode="mor", lww_strategy="auto")
    ap.run_backfill(binlog6, epoch_size=800)
    # tiny epochs: P* = 2*epoch_bytes/xover << parallelism/1.5 -> confident
    assert len(ap._lww_walls) <= 1


# ---------------------------------------------------------------------------
# stats fold: one less driver-synchronous Spark action per mor epoch
# ---------------------------------------------------------------------------
def _jobs_for_epoch(spark, ap, events, epoch):
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup())
    st = ap.apply_epoch(events, epoch)
    ap.flush_lineage()
    after = set(tracker.getJobIdsForGroup())
    assert not st.skipped
    return len(after - before)


def test_stats_fold_removes_one_job_per_epoch(spark, binlog6, tmp_path,
                                              monkeypatch):
    """The folded mor epoch must run exactly one job FEWER than the same
    epoch with the separate stats action (STRATUM_STATS_FOLD=0) -- the
    round-5 verdict's 'fold the parts/stats job into the delta-write job'
    criterion, measured as submitted Spark jobs (AQE inflates both sides
    equally)."""
    monkeypatch.delenv("STRATUM_LWW_PROBE", raising=False)
    feed = spark.read.parquet(binlog6)
    sl = [feed.where((F.col("lsn") >= i * 1000 + 1) & (F.col("lsn") <= (i + 1) * 1000))
          for i in range(4)]
    ap_fold = CdcApplier(spark, str(tmp_path / "wf"), job_id="f", n_buckets=8,
                         evolution=[], write_mode="mor")
    monkeypatch.setenv("STRATUM_STATS_FOLD", "0")
    ap_sep = CdcApplier(spark, str(tmp_path / "ws"), job_id="f", n_buckets=8,
                        evolution=[], write_mode="mor")
    # epoch 0 warms both JVM paths; epoch 1 is the measured one
    monkeypatch.setenv("STRATUM_STATS_FOLD", "1")
    _jobs_for_epoch(spark, ap_fold, sl[0], 0)
    jobs_fold = _jobs_for_epoch(spark, ap_fold, sl[1], 1)
    monkeypatch.setenv("STRATUM_STATS_FOLD", "0")
    _jobs_for_epoch(spark, ap_sep, sl[0], 0)
    jobs_sep = _jobs_for_epoch(spark, ap_sep, sl[2], 1)
    # the stats action costs >= 1 job (2 under AQE: its partial-agg
    # exchange surfaces as a stage-job); folding removes all of it
    assert jobs_fold < jobs_sep and jobs_fold <= 3, (jobs_fold, jobs_sep)
    # both paths produce identical summary lineage counts
    f = ap_fold.lineage.read().where(F.col("partition_id") == -1).orderBy("epoch")
    s = ap_sep.lineage.read().where(F.col("partition_id") == -1).orderBy("epoch")
    assert [r["rows_in"] for r in f.collect()][0] == [r["rows_in"] for r in s.collect()][0]


def test_fold_lineage_detail_is_per_file_offset_ranges(spark, binlog6, tmp_path):
    """Folded epochs record per-FILE lineage rows whose lsn bounds come
    from the parquet footers: every detail row's [lsn_min, lsn_max] must
    sit inside its epoch's slice range, and file row counts must sum to
    the committed delta rows."""
    ap = CdcApplier(spark, str(tmp_path / "wl"), job_id="l", n_buckets=8,
                    evolution=[], write_mode="mor")
    ap.run_backfill(binlog6, epoch_size=1000)
    lin = ap.lineage.read()
    det = lin.where(F.col("partition_id") >= 0).collect()
    assert det, "file-level detail rows must exist"
    for r in det:
        ep = int(r["epoch"])
        lo, hi = ep * 1000 + 1, (ep + 1) * 1000
        assert lo <= r["lsn_min"] <= r["lsn_max"] <= hi
        assert r["rows_in"] > 0
    by_epoch: dict[int, int] = {}
    for r in det:
        by_epoch[int(r["epoch"])] = by_epoch.get(int(r["epoch"]), 0) + int(r["rows_in"])
    assert sum(by_epoch.values()) == ap.deltas.row_count()
    # the manifest itself carries the same bounds (FileEntry.stats)
    assert any(
        e.stats and "lsn" in e.stats for e in ap.deltas.snapshot().files
    )


def test_file_entry_stats_json_roundtrip():
    e = FileEntry("data/x.parquet", (0, 1), 3, 42, stats={"lsn": (7, 99)})
    assert FileEntry.from_json(e.to_json()) == e
    # entries without stats stay wire-compatible with old snapshots
    old = {"path": "p", "buckets": [1], "schema_id": 0, "rows": 1}
    assert FileEntry.from_json(old).stats is None


# ---------------------------------------------------------------------------
# streaming receipts via the write job's own observation (zero extra jobs)
# ---------------------------------------------------------------------------
def test_stream_receipts_use_write_observation(spark, binlog6, tmp_path):
    from stratum_spark.streaming import run_stream_until_idle

    ap = CdcApplier(spark, str(tmp_path / "wst"), job_id="st", n_buckets=8,
                    evolution=[], write_mode="mor")
    run_stream_until_idle(ap, binlog6, str(tmp_path / "ckpt6"),
                          max_files_per_trigger=1)
    # the observation path engaged (zero extra jobs for those receipts) ...
    assert ap._receipts_from_obs >= 1
    # ... and the receipts verify against the committed delta files
    res = ap.verify_epoch_receipts()
    assert res and all(r["status"] == "ok" for r in res)


# ---------------------------------------------------------------------------
# pack.py guards (round-5 ADVICE lows)
# ---------------------------------------------------------------------------
def test_unpack_rejects_interior_misaligned_offsets():
    import pyarrow as pa

    from stratum_spark.functions.pack import unpack_array

    # lengths 2+2: end offsets (0, 4) are 4-byte aligned, the interior
    # boundary (2) is not -- the old ends-only guard passed this silently
    bad = pa.array([b"\x01\x00", b"\x00\x00"], type=pa.binary())
    with pytest.raises(ValueError, match="token-packed"):
        unpack_array(bad)


def test_pack_int32_offset_overflow_guarded(monkeypatch):
    import numpy as np
    import pyarrow as pa

    from stratum_spark.functions import pack as packmod

    # build a list<int32> whose BYTE offsets would exceed int32 without
    # allocating 2 GiB: fake the overflow by patching the iinfo bound
    col = pa.array([[1, 2, 3], [4]], type=pa.list_(pa.int32()))
    real_iinfo = np.iinfo

    class FakeInfo:
        max = 8  # pretend int32 tops out at 8 so 16 B of offsets overflows

    monkeypatch.setattr(packmod.np, "iinfo", lambda t: FakeInfo)
    try:
        with pytest.raises(ValueError, match="too large to pack"):
            packmod.pack_array(col)
    finally:
        monkeypatch.setattr(packmod.np, "iinfo", real_iinfo)
    # sanity: the real bound passes and round-trips
    packed = packmod.pack_array(col)
    assert packmod.unpack_array(packed).to_pylist() == [[1, 2, 3], [4]]


# ---------------------------------------------------------------------------
# combined narrow pass (opt-in, measured negative on this host -- see the
# _prepare_epoch comment + BASELINE.md round 6): the broadcast-LWW winner
# build and the DLQ split share ONE narrow scan, trading the DLQ's token
# decode for a skinny ObjectHashAggregate shuffle. Correctness of both
# paths is pinned here regardless of which a deployment picks.


def test_combined_narrow_pass_matches_separate_scans(spark, binlog6, tmp_path,
                                                     monkeypatch):
    """Differential: STRATUM_COMBINED_NARROW=1 (opt-in) vs =0 (default) must
    produce byte-identical final state AND identical DLQ content (the feed
    carries bad_frac invalid rows, so the DLQ branch is genuinely
    exercised)."""
    monkeypatch.delenv("STRATUM_LWW_PROBE", raising=False)

    def run(flag: str, wh: str):
        monkeypatch.setenv("STRATUM_COMBINED_NARROW", flag)
        ap = CdcApplier(spark, str(tmp_path / wh), job_id="c", n_buckets=8,
                        evolution=[], write_mode="mor",
                        n_events_hint=4000)
        ap.run_backfill(binlog6, epoch_size=1000, pipelined=True)
        state = {
            r["doc_id"]: (list(r["tokens"] or []), r["n_tok"], r["source"])
            for r in ap.state().collect()
        }
        dlq = sorted(
            (r["lsn"], r["doc_id"], r["rule"], r["message"], r["payload"])
            for r in ap.dlq.read().collect()
        )
        return ap, state, dlq

    ap1, state1, dlq1 = run("1", "w1")
    ap0, state0, dlq0 = run("0", "w0")
    assert state1 == state0
    assert len(dlq1) > 0  # the split actually fired
    assert dlq1 == dlq0
    # and both match the sequential replay oracle
    oracle = _oracle(binlog6)
    assert set(state1) == set(oracle)
    for k, w in oracle.items():
        assert state1[k][0] == list(w["tokens"]), k


def test_combined_pass_gated_off_for_shuffle_strategy(spark, binlog6, tmp_path,
                                                      monkeypatch):
    """Under the shuffle LWW strategy there is no winner broadcast build, so
    the combined frame must not be constructed (its skinny shuffle would be
    pure overhead) even when opted in; the DLQ falls back to the narrow-scan
    path and content is unchanged."""
    monkeypatch.delenv("STRATUM_LWW_PROBE", raising=False)
    monkeypatch.setenv("STRATUM_COMBINED_NARROW", "1")
    monkeypatch.setenv("STRATUM_LWW_STRATEGY", "shuffle")
    ap = CdcApplier(spark, str(tmp_path / "wsfl"), job_id="c", n_buckets=8,
                    evolution=[], write_mode="mor", n_events_hint=4000)
    prep = ap._prepare_epoch(
        spark.read.parquet(binlog6).where(F.col("lsn") <= 1000), 0
    )
    try:
        assert prep is not None and prep["small"] is None
        ap._commit_epoch(prep)
    finally:
        monkeypatch.delenv("STRATUM_LWW_STRATEGY", raising=False)
    assert ap.dlq.read().count() > 0


# ---------------------------------------------------------------------------
# DLQ via the write job's observation: the write probe already decodes the
# token column and evaluates the validity predicate, so the epoch's rare
# bad rows ride the SAME CollectMetrics node the stats fold uses and the
# DLQ append becomes a tiny driver-built local relation -- per-epoch token
# decodes drop from 3 to 2 with zero new shuffles (unlike the rejected
# combined-narrow-pass, nothing lands on a critical path).


def test_dlq_via_observation_matches_scan_path(spark, binlog6, tmp_path,
                                               monkeypatch):
    """Differential: STRATUM_DLQ_OBS=1 (default) vs =0 must produce
    identical DLQ content AND final state; the obs path must actually
    engage (bad rows present in the feed)."""
    monkeypatch.delenv("STRATUM_LWW_PROBE", raising=False)

    def run(flag: str, wh: str):
        monkeypatch.setenv("STRATUM_DLQ_OBS", flag)
        ap = CdcApplier(spark, str(tmp_path / wh), job_id="o", n_buckets=8,
                        evolution=[], write_mode="mor", n_events_hint=4000)
        ap.run_backfill(binlog6, epoch_size=1000, pipelined=True)
        state = {r["doc_id"]: (list(r["tokens"] or []), r["n_tok"])
                 for r in ap.state().collect()}
        dlq = sorted(
            (r["lsn"], r["doc_id"], r["rule"], r["message"], r["payload"])
            for r in ap.dlq.read().collect()
        )
        return ap, state, dlq

    ap1, state1, dlq1 = run("1", "wo1")
    ap0, state0, dlq0 = run("0", "wo0")
    assert len(dlq1) > 0
    assert dlq1 == dlq0
    assert state1 == state0
    # obs path really fed the gate counter
    assert ap1._last_bad_count is not None and ap1._last_bad_count > 0
    # and the state matches the sequential replay oracle
    oracle = _oracle(binlog6)
    assert set(state1) == set(oracle)
    for k, w in oracle.items():
        assert state1[k][0] == list(w["tokens"]), k


def test_dlq_obs_cap_flips_to_scan_path(spark, binlog6, tmp_path, monkeypatch):
    """A bad-row count above STRATUM_DLQ_OBS_CAP must flip subsequent
    epochs back to the scan path (driver-memory bound), with DLQ content
    unchanged; an under-cap feed keeps the obs path on."""
    monkeypatch.delenv("STRATUM_LWW_PROBE", raising=False)
    monkeypatch.setenv("STRATUM_DLQ_OBS_CAP", "1")
    ap = CdcApplier(spark, str(tmp_path / "wcap"), job_id="o", n_buckets=8,
                    evolution=[], write_mode="mor", n_events_hint=4000)
    ap.run_backfill(binlog6, epoch_size=1000)
    assert ap._last_bad_count is not None and ap._last_bad_count > 1
    assert not ap._dlq_obs_gate()
    # content equals the no-obs run bit for bit
    monkeypatch.setenv("STRATUM_DLQ_OBS", "0")
    ap0 = CdcApplier(spark, str(tmp_path / "wcap0"), job_id="o", n_buckets=8,
                     evolution=[], write_mode="mor", n_events_hint=4000)
    ap0.run_backfill(binlog6, epoch_size=1000)
    monkeypatch.setenv("STRATUM_DLQ_OBS", "1")
    a = sorted((r["lsn"], r["doc_id"], r["payload"]) for r in ap.dlq.read().collect())
    b = sorted((r["lsn"], r["doc_id"], r["payload"]) for r in ap0.dlq.read().collect())
    assert a == b
    # a fresh prepare on the over-cap applier takes the scan path (probe
    # LAST: the scan path commits its DLQ rows at prepare by design)
    feed = spark.read.parquet(binlog6).where(F.col("lsn") <= 1000)
    prep = ap._prepare_epoch(feed, 99)
    try:
        assert prep["dlq_q"] is None  # scan path (cap exceeded)
    finally:
        ap._abandon_prep(prep)


def _oracle_dlq_lsns6(binlog_dir):
    return sorted(replay_binlog(binlog_dir).dlq_lsns)


def test_dlq_obs_exactly_once_crash_after_dlq_before_merge(spark, binlog6,
                                                           tmp_path):
    """Crash window A under the observation-fed DLQ (mor): the DLQ worker's
    append can commit concurrently with the merge, so a crash after the DLQ
    commit but before commit_epoch_files must leave a resumed backfill with
    the exact oracle DLQ set (the replayed epoch's bookmarked append is a
    no-op)."""
    wh = str(tmp_path / "whOA")
    ap1 = CdcApplier(spark, wh, job_id="t", n_buckets=8, evolution=[],
                     write_mode="mor", n_events_hint=4000)
    real_commit = ap1.deltas.commit_epoch_files

    def crash_commit(entries, **kw):
        # the prep dict isn't reachable here; the DLQ future is the only
        # other in-flight epoch work -- drain the 1-wide pool so the DLQ
        # append has definitely committed, then die before the merge commit
        ap1._dlq_pool.submit(lambda: None).result()
        raise RuntimeError("injected crash before merge commit")

    ap1.deltas.commit_epoch_files = crash_commit
    feed = spark.read.parquet(binlog6).where(F.col("lsn") <= 1000)
    prep = ap1._prepare_epoch(feed, 0)
    assert prep["dlq_q"] is not None  # obs path engaged
    with pytest.raises(RuntimeError, match="injected crash"):
        ap1._commit_epoch(prep)
    ap1.deltas.commit_epoch_files = real_commit
    assert ap1.deltas.committed_epoch("t") == -1  # merge never committed
    assert ap1.dlq.committed_epoch("t") == 0  # DLQ commit survived

    ap2 = CdcApplier(spark, wh, job_id="t", n_buckets=8, evolution=[],
                     write_mode="mor", n_events_hint=4000)
    ap2.run_backfill(binlog6, epoch_size=1000)
    got = sorted(r["lsn"] for r in ap2.dlq.read().collect())
    assert got and got == _oracle_dlq_lsns6(binlog6)
    # state converges to the oracle despite the injected crash
    state = {r["doc_id"]: list(r["tokens"] or []) for r in ap2.state().collect()}
    oracle = _oracle(binlog6)
    assert set(state) == set(oracle)
    for k, w in oracle.items():
        assert state[k] == list(w["tokens"]), k


def test_dlq_obs_exactly_once_crash_after_merge_before_dlq(spark, binlog6,
                                                           tmp_path):
    """Crash window B under the observation-fed DLQ (mor): the merge
    committed but the observation-built DLQ frame was lost. _dlq_catchup's
    scan-path rebuild from the feed slice must restore exactly that epoch's
    DLQ rows on resume, and a second resume must change nothing."""
    wh = str(tmp_path / "whOB")
    ap1 = CdcApplier(spark, wh, job_id="t", n_buckets=8, evolution=[],
                     write_mode="mor", n_events_hint=4000)
    ap1._append_dlq_frame = lambda frame, epoch: 0  # lost DLQ flush
    ap1.run_backfill(binlog6, epoch_size=1000, stop_after=1)
    assert ap1.deltas.committed_epoch("t") == 0
    assert ap1.dlq.committed_epoch("t") == -1 and ap1.dlq.row_count() == 0

    ap2 = CdcApplier(spark, wh, job_id="t", n_buckets=8, evolution=[],
                     write_mode="mor", n_events_hint=4000)
    ap2.run_backfill(binlog6, epoch_size=1000)
    got = sorted(r["lsn"] for r in ap2.dlq.read().collect())
    assert got == _oracle_dlq_lsns6(binlog6)
    ap3 = CdcApplier(spark, wh, job_id="t", n_buckets=8, evolution=[],
                     write_mode="mor", n_events_hint=4000)
    ap3.run_backfill(binlog6, epoch_size=1000)
    assert sorted(r["lsn"] for r in ap3.dlq.read().collect()) == got
