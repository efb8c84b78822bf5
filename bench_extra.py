"""Round-7 optimization harness (bench.py is FROZEN for measurement; this
file exists so the optimization loop can time queries and capture plans
without touching it).

Mirrors bench.py's query methodology exactly: one Spark session at
$SPARK_GRAFT_CPUS cores, one untimed warmup pass of the first headline
query, then each query timed by `.count()` (same action bench.py uses).
Adds:
  * --reps N          repeat the set N times interleaved, report min/mean
  * --noop            additionally time df.write.format('noop') per query
                      (guide section 1.4: computes every column, isolates
                      the computation from count()'s column pruning)
  * --explain DIR/SUF write .explain('formatted') per query to
                      plans/r07/<query>_<SUF>.txt
  * --queries a,b,c   subset (default: bench.py's HEADLINE_QUERIES)
  * --all             every queries() entry instead of the headline set

Emits one JSON line {"queries": {...}, "queries_noop": {...}} on stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# the frozen harness owns the headline list; import it so the two can
# never drift (bench.py has no import side effects -- main() is guarded)
from bench import HEADLINE_QUERIES  # noqa: E402


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--explain", default=None, help="suffix, e.g. 'before'")
    ap.add_argument("--queries", default=None)
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from stratum_spark.session import get_spark

    qs = entrymod.queries()
    names = list(qs) if args.all else HEADLINE_QUERIES
    if args.queries:
        names = [n for n in args.queries.split(",") if n]
    unknown = [n for n in names if n not in qs]
    if unknown or not names:
        raise SystemExit(
            f"unknown/empty query selection {unknown or names}; "
            f"valid: {sorted(qs)}")
    if args.reps < 1:
        raise SystemExit("--reps must be >= 1")

    spark = get_spark("bench_extra", cores=CPUS)
    sc = spark.sparkContext

    # warmup: same discipline as bench.py (first-query JIT/codegen warmup)
    qs[names[0]](spark, SF_DIR).count()

    samples: dict[str, list[float]] = {n: [] for n in names}
    noop_samples: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(args.reps):
        for name in names:
            sc.setJobDescription(f"{name} count rep{rep}")
            t0 = time.time()
            qs[name](spark, SF_DIR).count()
            samples[name].append(round(time.time() - t0, 3))
            if args.noop:
                sc.setJobDescription(f"{name} noop rep{rep}")
                t0 = time.time()
                qs[name](spark, SF_DIR).write.format("noop").mode(
                    "overwrite").save()
                noop_samples[name].append(round(time.time() - t0, 3))
            sc.setJobDescription(None)

    if args.explain:
        outdir = os.path.join(REPO, "plans", "r07")
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(outdir, f"{name}_{args.explain}.txt"),
                      "w") as fh:
                fh.write(plan)

    def _st(s: list[float]) -> dict:
        return {"min": min(s), "mean": round(sum(s) / len(s), 3),
                "samples": s}

    out = {
        "sf_dir": SF_DIR,
        "cpus": CPUS,
        "reps": args.reps,
        "queries": {n: _st(s) for n, s in samples.items()},
    }
    if args.noop:
        out["queries_noop"] = {n: _st(s) for n, s in noop_samples.items()}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
