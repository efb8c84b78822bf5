"""Lake maintenance ops: orphan-file sweep and snapshot rollback.

Orphans are designed-in byproducts of the two-phase exactly-once protocol
(phase-1 files land before any snapshot references them — a crash or a
replayed epoch leaves them unreferenced); at 10^10-event scale that garbage
is worth reclaiming. Rollback mirrors Iceberg rollback_to_snapshot: a NEW
version whose content equals an old one, with the exactly-once bookmarks
rolling back alongside the data so replay converges (the reference's
resume-from-checkpoint contract, crates/engine-core/src/state/store.rs).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from stratum_spark.cdc import CdcApplier, generate_binlog, write_binlog
from stratum_spark.cdc.oracle import replay_binlog, state_as_records
from stratum_spark.cli import main

N_EVENTS = 900
N_DOCS = 150


def _mk_feed(spark, tmp_path, with_evolution=False):
    feed = generate_binlog(
        spark, n_docs=N_DOCS, n_events=N_EVENTS, seed=29, max_tokens=12,
        with_evolution=with_evolution,
    )
    write_binlog(feed, str(tmp_path / "binlog"), n_chunks=3)
    return str(tmp_path / "binlog")


def _rows(df):
    out = {}
    for r in df.collect():
        d = r.asDict()
        d["tokens"] = list(d["tokens"] or [])
        out[d["doc_id"]] = d
    return out


def _backdate(root: str, seconds: float = 7200.0) -> None:
    """Make every file/dir under root look `seconds` old (deterministic
    grace-window control — never sleep in tests)."""
    past = time.time() - seconds
    for dirpath, dirnames, filenames in os.walk(root):
        for n in dirnames + filenames:
            os.utime(os.path.join(dirpath, n), (past, past))
        os.utime(dirpath, (past, past))


def test_remove_orphans_sweeps_uncommitted_only(spark, tmp_path):
    binlog = _mk_feed(spark, tmp_path)
    ap = CdcApplier(spark, str(tmp_path / "wh"), job_id="j", n_buckets=8,
                    n_events_hint=N_EVENTS, write_mode="mor")
    ap.run_backfill(binlog, epoch_size=300)
    before = _rows(ap.state())

    # plant a phase-1 write that never commits (the crash window)
    slice0 = spark.read.parquet(binlog).where(F.col("lsn") <= 100)
    mapped = slice0.select("doc_id", "op", "lsn", "tokens", "n_tok", "source")
    orphan_entries = ap.deltas.write_epoch_files(mapped, clustered=False)
    assert orphan_entries
    _backdate(str(tmp_path / "wh"))

    swept = ap.remove_orphans(grace_sec=3600.0)
    assert swept["tokens_deltas"]["files_removed"] >= len(orphan_entries)
    assert swept["tokens_deltas"]["bytes_removed"] > 0
    # committed files all survive: state is byte-identical
    assert _rows(ap.state()) == before
    # the orphaned commit dirs are gone from disk
    for e in orphan_entries:
        assert not os.path.isfile(os.path.join(ap.deltas.root, e.path))
    # idempotent: a second sweep finds nothing
    again = ap.remove_orphans(grace_sec=3600.0)
    assert all(v["files_removed"] == 0 for v in again.values())


def test_remove_orphans_grace_protects_inflight(spark, tmp_path):
    binlog = _mk_feed(spark, tmp_path)
    ap = CdcApplier(spark, str(tmp_path / "wh"), job_id="j", n_buckets=8,
                    n_events_hint=N_EVENTS, write_mode="mor")
    ap.run_backfill(binlog, epoch_size=300)
    slice0 = spark.read.parquet(binlog).where(F.col("lsn") <= 100)
    mapped = slice0.select("doc_id", "op", "lsn", "tokens", "n_tok", "source")
    entries = ap.deltas.write_epoch_files(mapped, clustered=False)
    # files are FRESH (an in-flight pipelined prefetch looks exactly like
    # this): the default grace must keep them
    swept = ap.deltas.remove_orphaned_files(grace_sec=3600.0)
    assert swept["files_removed"] == 0
    for e in entries:
        assert os.path.isfile(os.path.join(ap.deltas.root, e.path))
    # a dir holding Spark staging is skipped even when backdated
    staged = os.path.join(ap.deltas.root, "data", "inprogress123")
    os.makedirs(os.path.join(staged, "_temporary"))
    with open(os.path.join(staged, "part-00000-x.parquet"), "wb") as fh:
        fh.write(b"\x00" * 16)
    _backdate(staged)
    swept = ap.deltas.remove_orphaned_files(grace_sec=3600.0)
    assert os.path.isfile(os.path.join(staged, "part-00000-x.parquet"))


def test_rollback_then_replay_converges(spark, tmp_path):
    binlog = _mk_feed(spark, tmp_path)
    ap = CdcApplier(spark, str(tmp_path / "wh"), job_id="j", n_buckets=8,
                    n_events_hint=N_EVENTS, write_mode="mor")
    ap.run_backfill(binlog, epoch_size=300)  # 3 epochs
    want = _rows(ap.state())
    assert ap.deltas.committed_epoch("j") == 2

    # find the snapshot version whose bookmark says epoch 0 committed
    v_epoch0 = next(
        s.version for s in ap.deltas.history()
        if s.committed.get("j", {}).get("epoch") == 0
    )
    new_v = ap.deltas.rollback(v_epoch0)
    assert new_v > v_epoch0  # history preserved: rollback is a new version
    assert ap.deltas.committed_epoch("j") == 0  # bookmark rolled back too

    # replay from the rolled-back bookmark: exactly-once resume converges
    # to the identical final state
    ap2 = CdcApplier(spark, str(tmp_path / "wh"), job_id="j", n_buckets=8,
                     n_events_hint=N_EVENTS, write_mode="mor")
    ap2.run_backfill(binlog, epoch_size=300)
    got = _rows(ap2.state())
    assert got == want
    oracle = state_as_records(replay_binlog(binlog), table_schema_ver=0)
    assert set(got) == set(oracle)
    for k, w in oracle.items():
        assert got[k]["tokens"] == list(w["tokens"]), k

    # the first run's superseded epoch-1/2 files are still referenced by
    # RETAINED history (rollback preserves it), so the orphan sweep must
    # NOT touch them...
    _backdate(str(tmp_path / "wh"))
    swept = ap2.remove_orphans(grace_sec=3600.0)
    assert swept["tokens_deltas"]["files_removed"] == 0
    # ...until the history is expired — the Iceberg flow (expire, then
    # sweep) reclaims them and the state is untouched
    exp = ap2.deltas.expire_snapshots(keep_last=1)
    assert exp["files_removed"] > 0
    assert _rows(ap2.state()) == got


def test_cli_gc_and_rollback_verbs(spark, tmp_path, capsys):
    binlog = _mk_feed(spark, tmp_path)
    wh = str(tmp_path / "wh")
    args = ["--warehouse", wh, "--events-hint", str(N_EVENTS), "--n-buckets", "8"]
    assert main(["backfill", "--binlog", binlog, "--epoch-size", "300", *args]) == 0
    capsys.readouterr()

    # orphan a phase-1 write, backdate, sweep via the CLI
    ap = CdcApplier(spark, wh, job_id="cdc", n_buckets=8,
                    n_events_hint=N_EVENTS, write_mode="mor")
    slice0 = spark.read.parquet(binlog).where(F.col("lsn") <= 100)
    ap.deltas.write_epoch_files(
        slice0.select("doc_id", "op", "lsn", "tokens", "n_tok", "source"),
        clustered=False,
    )
    _backdate(wh)
    assert main(["gc", "--grace-sec", "3600", *args]) == 0
    out = capsys.readouterr().out
    assert "tokens_deltas:" in out and "total:" in out

    # rollback verb: epoch bookmark visibly rolls back
    v_epoch0 = next(
        s.version for s in ap.deltas.history()
        if s.committed.get("cdc", {}).get("epoch") == 0
    )
    assert main(["rollback", "--version", str(v_epoch0), *args]) == 0
    out = capsys.readouterr().out
    assert "epoch=0" in out
    assert main(["rollback", "--version", "999999", *args]) == 1
