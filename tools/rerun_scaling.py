"""Targeted scaling-chain rerun: engine + bare-write interleaved per level.

The full bench campaign takes ~55 min, long enough for the hypervisor's
multi-minute steal waves to poison one level (r5 self-run: both 4-core CDC
trials caught an ~8% steal wave and measured 98k ev/s where an A/B an hour
earlier measured 247k). This script reruns ONLY the scaling cells --
engine (mor, pipelined) and the bare-parquet-write exhibit, interleaved at
each level so waves hit both arms -- with more trials, and prints one JSON
line for BASELINE.md / BENCH_SELF augmentation.

Usage: python tools/rerun_scaling.py [cores ...] (default 1 4 16)
Env: RS_TRIALS (default 3), RS_EVENTS (default 8000000).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import _bench_tmp_base, _run_bare_at, _run_cdc_at  # noqa: E402


def main() -> None:
    cores = [int(c) for c in sys.argv[1:]] or [1, 4, 16]
    trials = int(os.environ.get("RS_TRIALS", "3"))
    n_events = int(os.environ.get("RS_EVENTS", "8000000"))
    base = tempfile.mkdtemp(prefix="rerun_", dir=_bench_tmp_base())
    local_dir = os.path.join(base, "sparklocal")
    os.makedirs(local_dir)
    os.environ.setdefault("BENCH_PIPELINED", "1")
    try:
        from stratum_spark.cdc import generate_binlog, write_binlog
        from stratum_spark.session import get_spark

        spark = get_spark("rs_gen", cores=16, extra_conf={"spark.local.dir": local_dir})
        binlog = os.path.join(base, "binlog")
        write_binlog(
            generate_binlog(spark, n_docs=n_events // 10, n_events=n_events,
                            seed=42, max_tokens=96, with_evolution=False),
            binlog, n_chunks=16,
        )
        spark.stop()

        eng: dict[int, list[dict]] = {c: [] for c in cores}
        bare: dict[int, list[dict]] = {c: [] for c in cores}
        for t in range(trials):
            for c in cores:
                w = _run_cdc_at(c, binlog, n_events, local_dir, mode="mor")
                eng[c].append(w)
                b = _run_bare_at(c, binlog, n_events, local_dir)
                bare[c].append(b)
                print(
                    f"# t{t} {c}c engine={w['events_per_sec_steady']} "
                    f"(steal {w.get('steal_pct')}) bare={b['events_per_sec_steady']}",
                    file=sys.stderr, flush=True,
                )
        best = lambda ws: max(w["events_per_sec_steady"] for w in ws)  # noqa: E731
        out = {
            "trials": trials,
            "events": n_events,
            "engine": {
                str(c): {"best": best(ws),
                         "all": [w["events_per_sec_steady"] for w in ws],
                         "steal": [w.get("steal_pct") for w in ws]}
                for c, ws in eng.items()
            },
            "bare": {
                str(c): {"best": best(ws),
                         "all": [w["events_per_sec_steady"] for w in ws]}
                for c, ws in bare.items()
            },
        }
        for lo, hi in zip(cores, cores[1:]):
            f = hi / lo
            e = best(eng[hi]) / best(eng[lo]) / f
            b = best(bare[hi]) / best(bare[lo]) / f
            out[f"eff_{lo}to{hi}"] = {
                "engine": round(e, 3),
                "bare": round(b, 3),
                "engine_vs_bare": round(e / b, 3) if b else None,
            }
        print(json.dumps(out))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
