"""End-to-end demo: synthetic binlog -> CDC apply -> verify -> report.

Run:  python examples/run_cdc_demo.py [n_events]

Generates a deterministic change feed (inserts/updates/deletes, duplicate
deliveries, invalid rows, mid-stream DDL), applies it with the epoch
applier (batch mode), then replays it through Structured Streaming into a
second warehouse, verifies both against the sequential oracle and each
other via Merkle receipts, and prints lineage.
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from stratum_spark import get_spark
from stratum_spark.cdc import CdcApplier, generate_binlog, write_binlog
from stratum_spark.cdc.oracle import replay_binlog, state_as_records
from stratum_spark.streaming import run_stream_until_idle
from stratum_spark.verify import merkle_receipt, verify_receipt


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    spark = get_spark("cdc_demo")
    base = tempfile.mkdtemp(prefix="cdc_demo_")
    print(f"workspace: {base}")

    feed = generate_binlog(spark, n_docs=n_events // 10, n_events=n_events, seed=42)
    write_binlog(feed, f"{base}/binlog", n_chunks=8)

    print("== batch backfill ==")
    ap = CdcApplier(spark, f"{base}/wh_batch", job_id="demo", n_buckets=16,
                    n_events_hint=n_events)
    for s in ap.run_backfill(f"{base}/binlog", epoch_size=max(1000, n_events // 5)):
        print(f"  epoch {s.epoch}: in={s.rows_in} applied={s.rows_deduped} "
              f"dlq={s.rows_dlq} wall={s.wall_ms}ms")
    print(f"  state: {ap.epoch_state()}  rows={ap.tokens.row_count()}")

    print("== streaming replay into a second warehouse ==")
    ap2 = CdcApplier(spark, f"{base}/wh_stream", job_id="demo_s", n_buckets=16,
                     n_events_hint=n_events)
    run_stream_until_idle(ap2, f"{base}/binlog", f"{base}/ckpt", max_files_per_trigger=2)

    print("== verification ==")
    st = replay_binlog(f"{base}/binlog")
    want = state_as_records(st, table_schema_ver=3)
    got = {r["doc_id"]: r.asDict() for r in ap.state().collect()}
    ok = set(got) == set(want) and all(
        got[k]["tokens"] == w["tokens"] for k, w in want.items()
    )
    print(f"  batch state == sequential oracle (per-row tokens): {ok}")

    r1 = merkle_receipt(ap.state(), key="doc_id")
    r2 = verify_receipt(ap2.state(), "doc_id", r1)
    print(f"  stream warehouse matches batch warehouse (Merkle): {r2['match']}")
    print(f"  root: {r1.root[:16]}...  rows: {r1.n_rows}  dlq: {ap.dlq.read().count()}")

    print("== lineage (summary rows) ==")
    ap.lineage.read().where("partition_id = -1").orderBy("epoch").show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
