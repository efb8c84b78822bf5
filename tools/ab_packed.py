"""Interleaved A/B: tokens_packed vs array tokens on the mor CDC hot path.

Round-5 bar-item experiment (round-4 verdict item 1): does packing the
token payload to one binary column cut enough bytes/event to lift 1->4
scaling efficiency? Runs bench.py's --worker-cdc in fresh JVMs per
(cores, packed) cell, interleaved so hypervisor steal waves hit both arms
symmetrically. Prints one JSON line with per-cell steady rates.

Usage: python tools/ab_packed.py [cores ...]   (default 1 4 16)
Env: AB_TRIALS (default 2), AB_EVENTS (default 8000000).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import _bench_tmp_base, _run_cdc_at  # noqa: E402


def main() -> None:
    cores = [int(c) for c in sys.argv[1:]] or [1, 4, 16]
    trials = int(os.environ.get("AB_TRIALS", "2"))
    n_events = int(os.environ.get("AB_EVENTS", "8000000"))
    n_docs = n_events // 10
    base = tempfile.mkdtemp(prefix="ab_packed_", dir=_bench_tmp_base())
    local_dir = os.path.join(base, "sparklocal")
    os.makedirs(local_dir)
    os.environ["BENCH_WRITE_MODE"] = "mor"
    os.environ.setdefault("BENCH_PIPELINED", "1")
    try:
        from stratum_spark.cdc import generate_binlog, write_binlog
        from stratum_spark.session import get_spark

        spark = get_spark("ab_gen", cores=16, extra_conf={"spark.local.dir": local_dir})
        binlog = os.path.join(base, "binlog")
        write_binlog(
            generate_binlog(spark, n_docs=n_docs, n_events=n_events, seed=42,
                            max_tokens=96, with_evolution=False),
            binlog, n_chunks=16,
        )
        spark.stop()

        cells: dict[str, list[dict]] = {}
        for t in range(trials):
            for c in cores:
                for packed in (0, 1):
                    os.environ["STRATUM_TOKENS_PACKED"] = str(packed)
                    # mode passed EXPLICITLY: bench.WRITE_MODE is captured at
                    # import time, before this script sets its env
                    w = _run_cdc_at(c, binlog, n_events, local_dir, mode="mor")
                    key = f"{c}c_{'packed' if packed else 'array'}"
                    cells.setdefault(key, []).append(w)
                    print(
                        f"# trial={t} {key}: steady={w['events_per_sec_steady']} "
                        f"wall={w['wall_sec']} steal={w.get('steal_pct')}",
                        file=sys.stderr, flush=True,
                    )
        os.environ.pop("STRATUM_TOKENS_PACKED", None)
        summary = {
            k: {
                "steady_best": max(w["events_per_sec_steady"] for w in ws),
                "steady_all": [w["events_per_sec_steady"] for w in ws],
                "steal_pct": [w.get("steal_pct") for w in ws],
            }
            for k, ws in cells.items()
        }
        for c in cores:
            a = summary.get(f"{c}c_array", {}).get("steady_best")
            p = summary.get(f"{c}c_packed", {}).get("steady_best")
            if a and p:
                summary[f"{c}c_packed_vs_array"] = round(p / a, 3)
        print(json.dumps({"ab_packed": summary, "events": n_events, "trials": trials}))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
