"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>,
   "cdc": {...events/sec + scaling efficiency evidence...}}

Headline metric (BASELINE.json): change-events/sec applied end-to-end
(binlog -> validate -> LWW dedup -> MERGE into the lake table), measured at
two parallelism levels (local[N] and local[4N]) in separate JVMs on the
same input -- the sandbox evidence for the N -> 4N scaling-efficiency
criterion (>= 0.8 target).

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), BENCH_EVENTS, BENCH_DOCS, BENCH_SCALE_LO.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_EVENTS = int(os.environ.get("BENCH_EVENTS", "200000"))
N_DOCS = int(os.environ.get("BENCH_DOCS", "40000"))
SCALE_LO = int(os.environ.get("BENCH_SCALE_LO", str(max(1, CPUS // 4))))

HEADLINE_QUERIES = [
    "agg_pricing",
    "multi_join",
    "left_join_agg",
    "window_lww",
    "merge_upsert_sim",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "ann_topk_bruteforce",
    "ann_topk_lsh",
    "text_quality",
    "text_fingerprint",
]


def _worker_cdc(cores: int, binlog_dir: str, n_events: int) -> None:
    """Subprocess entry: apply the pre-generated binlog at `cores`
    parallelism, print one JSON result line."""
    from stratum_spark.cdc import CdcApplier
    from stratum_spark.session import get_spark

    spark = get_spark(f"bench_cdc_{cores}", cores=cores)
    wh = tempfile.mkdtemp(prefix=f"bench_wh_{cores}_")
    try:
        ap = CdcApplier(
            spark, wh, job_id="bench", n_buckets=64, n_events_hint=n_events, validate=True
        )
        t0 = time.time()
        stats = ap.run_backfill(binlog_dir, epoch_size=max(10_000, n_events // 4))
        wall = time.time() - t0
        for s in stats:
            print(
                f"# epoch={s.epoch} wall_ms={s.wall_ms} rows={s.rows_in} "
                f"merge_ms={s.merge.wall_ms if s.merge else -1}",
                file=sys.stderr,
            )
        rows_in = sum(s.rows_in for s in stats)
        print(
            json.dumps(
                {
                    "cores": cores,
                    "wall_sec": round(wall, 3),
                    "events": rows_in,
                    "events_per_sec": round(rows_in / wall, 1),
                    "epochs": len(stats),
                    "final_rows": ap.tokens.row_count(),
                }
            )
        )
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def _run_cdc_at(cores: int, binlog_dir: str, n_events: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker-cdc", str(cores), binlog_dir, str(n_events)],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=REPO,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"cdc worker ({cores} cores) produced no result: {out.stderr[-2000:]}")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker-cdc":
        _worker_cdc(int(sys.argv[2]), sys.argv[3], int(sys.argv[4]))
        return

    import __spark_entry__ as entrymod
    from stratum_spark.cdc import generate_binlog, write_binlog
    from stratum_spark.session import get_spark

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    t_total0 = time.time()

    # ---- generate the shared binlog once (not timed as apply) -----------
    spark = get_spark("bench_gen", cores=CPUS)
    binlog_dir = tempfile.mkdtemp(prefix="bench_binlog_")
    feed = generate_binlog(
        spark, n_docs=N_DOCS, n_events=N_EVENTS, seed=42, max_tokens=96
    )
    write_binlog(feed, binlog_dir, n_chunks=16)

    # ---- headline query timings on SF_DIR --------------------------------
    qs = entrymod.queries()
    qtimes: dict[str, float] = {}
    for name in HEADLINE_QUERIES:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        n = df.count()
        qtimes[name] = round(time.time() - t0, 3)
    spark.stop()

    # ---- CDC apply at two parallelism levels (fresh JVMs) ---------------
    try:
        lo = _run_cdc_at(SCALE_LO, binlog_dir, N_EVENTS)
        hi = _run_cdc_at(CPUS, binlog_dir, N_EVENTS)
    finally:
        shutil.rmtree(binlog_dir, ignore_errors=True)
    ratio = hi["events_per_sec"] / lo["events_per_sec"]
    factor = CPUS / SCALE_LO
    efficiency = round(ratio / factor, 3)

    total = round(time.time() - t_total0, 3)
    print(
        json.dumps(
            {
                "metric": "cdc_merge_events_per_sec",
                "value": hi["events_per_sec"],
                "unit": "sec",
                "queries": qtimes,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cdc": {
                    "events": hi["events"],
                    "low_parallelism": lo,
                    "high_parallelism": hi,
                    "speedup": round(ratio, 3),
                    "cores_factor": factor,
                    "scaling_efficiency": efficiency,
                },
                "total_wall_sec": total,
            }
        )
    )


if __name__ == "__main__":
    main()
