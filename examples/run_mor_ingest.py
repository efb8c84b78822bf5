"""Merge-on-read CDC ingest demo: the O(batch)-per-epoch path.

Generates a deterministic synthetic binlog, applies it as exactly-once
delta commits (write_mode='mor'), compacts periodically, and verifies the
final state against the sequential replay oracle -- the end-to-end shape a
10^10-event ingest runs, at demo scale.

    python examples/run_mor_ingest.py [n_events]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stratum_spark.cdc import CdcApplier, generate_binlog, write_binlog
from stratum_spark.cdc.oracle import replay_binlog, state_as_records
from stratum_spark.session import get_spark


def main() -> int:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_docs = max(200, n_events // 10)
    spark = get_spark("mor_ingest_demo")
    base = tempfile.mkdtemp(prefix="mor_demo_")

    feed = generate_binlog(spark, n_docs=n_docs, n_events=n_events, seed=42, max_tokens=32)
    write_binlog(feed, f"{base}/binlog", n_chunks=8)

    ap = CdcApplier(
        spark, f"{base}/warehouse", job_id="demo", n_buckets=16,
        n_events_hint=n_events, write_mode="mor",
    )
    t0 = time.time()
    stats = ap.run_backfill(f"{base}/binlog", epoch_size=max(1000, n_events // 8),
                            compact_every=4)
    ap.compact_deltas()
    wall = time.time() - t0
    applied = [s for s in stats if not s.skipped]
    print(f"applied {sum(s.rows_in for s in applied)} events in {wall:.1f}s "
          f"({sum(s.rows_in for s in applied)/wall:,.0f} events/s) over "
          f"{len(applied)} epochs; DLQ rows: {sum(s.rows_dlq for s in applied)}")
    print(f"base rows: {ap.tokens.row_count()}, residual deltas: {ap.deltas.row_count()}")
    print(f"epoch receipts persisted: {len(ap.epoch_receipts())}")

    # verify: per-row token-array equality vs the sequential replay oracle
    st = replay_binlog(f"{base}/binlog")
    want = state_as_records(st, table_schema_ver=ap.epoch_state()["schema_ver"])
    got = {r["doc_id"]: r for r in ap.state().collect()}
    assert set(got) == set(want), (len(got), len(want))
    for k, w in want.items():
        assert list(got[k]["tokens"] or []) == list(w["tokens"] or []), k
    print(f"verified: {len(want)} docs match the sequential replay oracle")

    ap.receipt()
    print("full-table receipt verify:", ap.verify())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
