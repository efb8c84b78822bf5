"""Extended maintenance ops-fuzz: the tests/test_maintenance.py ops-fuzz
with many more seeds and steps, run standalone so the shakeout can go deep
without inflating the CI suite's wall time.

Random interleavings of MERGE (I/U/D), bin-pack, whole-bucket compaction,
bucket-count evolution, rollback, snapshot expiry and JDBC sync-out;
after every op the table content must equal a pure-Python model, and
after every sync the embedded-Derby target must pass the per-key hash
audit (cdc/sync_out.py::verify_target) -- i.e. the egress direction
converges from ANY maintenance interleaving, including bookmark
regression via rollback and bookmark expiry via expire_snapshots. Usage:

    python tools/ops_fuzz.py [--seeds 11,13,17,...] [--steps 30]
"""

from __future__ import annotations

import argparse
import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stratum_spark.lake.table import LakeTable  # noqa: E402
from stratum_spark.session import get_spark  # noqa: E402

UP_SCHEMA = ("doc_id string, tokens array<int>, n_tok int, "
             "source string, op string")
DERBY_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def _sync_and_audit(spark, t, seed: int, created: set) -> str:
    """Sync the table to an embedded-Derby target and run the per-key
    hash audit; any divergence (convergence failure after rollback/
    expire/rewrites) raises."""
    from stratum_spark.cdc.sync_out import sync_to_jdbc, verify_target

    url = f"jdbc:derby:memory:fz{seed}"
    tgt = f"fz_{seed}"
    if seed not in created:
        conn = spark._jvm.java.sql.DriverManager.getConnection(
            url + ";create=true")
        conn.createStatement().executeUpdate(
            f'CREATE TABLE {tgt} ("doc_id" VARCHAR(64) PRIMARY KEY, '
            '"tokens" VARCHAR(4096), "n_tok" INT, "source" VARCHAR(32))'
        )
        conn.close()
        created.add(seed)
    res = sync_to_jdbc(spark, t, url, tgt, properties=DERBY_PROPS)
    audit = verify_target(spark, t, url, tgt, properties=DERBY_PROPS)
    assert audit["match"], (
        f"SYNC AUDIT MISMATCH seed {seed} mode {res['mode']}: {audit}"
    )
    return res["mode"]


def run_seed(spark, root: str, seed: int, steps: int) -> None:
    rng = random.Random(seed)
    t = LakeTable.create(
        spark, os.path.join(root, f"fz{seed}"),
        "doc_id string, tokens array<int>, n_tok int, source string",
        key="doc_id", n_buckets=4,
        properties={"stats.columns": "n_tok"},  # every write path records
        # bounds, so the sweep also shakes out stats recording + pruning
        # under arbitrary maintenance interleavings
    )
    model: dict[str, list[int]] = {}
    content_at: dict[int, dict] = {t.snapshot().version: dict(model)}
    next_doc = 0
    created: set = set()
    sync_modes: list[str] = []
    for step in range(steps):
        op = rng.choice(["merge", "merge", "merge", "binpack", "compact",
                         "rebucket", "rollback", "expire", "sync"])
        if op == "merge":
            rows = []
            for _ in range(rng.randint(2, 12)):
                kind = rng.choice(["I", "U", "D"])
                if kind == "I" or not model:
                    doc, kind = f"d{next_doc}", "I"
                    next_doc += 1
                else:
                    doc = rng.choice(sorted(model))
                toks = [rng.randint(0, 99) for _ in range(rng.randint(1, 5))]
                rows.append((doc, toks, len(toks), "s", kind))
                if kind == "D":
                    model.pop(doc, None)
                else:
                    model[doc] = toks
            seen = {}
            for r in rows:
                seen[r[0]] = r
            t.merge(spark.createDataFrame(list(seen.values()), UP_SCHEMA),
                    op_col="op", job_id=f"f{seed}", epoch=step)
        elif op == "binpack":
            t.compact_binpack(small_file_bytes=1 << 20)
        elif op == "compact":
            t.compact(target_files_per_bucket=1)
        elif op == "rebucket":
            cur = t.snapshot().n_buckets
            t.rebucket(rng.choice([c for c in (4, 6, 8, 12) if c != cur]))
        elif op == "rollback":
            versions = [s.version for s in t.history()]
            v = rng.choice(versions[:-1]) if len(versions) > 1 else versions[0]
            if v in content_at:
                t.rollback(v)
                model = dict(content_at[v])
        elif op == "expire":
            t.expire_snapshots(keep_last=rng.randint(4, 8))
        elif op == "sync":
            sync_modes.append(_sync_and_audit(spark, t, seed, created))
        got = {r["doc_id"]: list(r["tokens"] or []) for r in t.read().collect()}
        assert got == model, (
            f"MISMATCH seed {seed} step {step} op {op}: "
            f"{len(got)} rows vs model {len(model)}"
        )
        content_at[t.snapshot().version] = dict(model)
    # end-of-seed: manifest-stats pruned scan must stay exact for every
    # predicate after any interleaving of rewrites (prune is superset-
    # preserving; the Spark-side re-filter guarantees exactness)
    for thresh in (1, 3, 5):
        got_scan = {r["doc_id"] for r in t.scan([("n_tok", ">=", thresh)]).collect()}
        want = {d for d, toks in model.items() if len(toks) >= thresh}
        assert got_scan == want, (
            f"SCAN MISMATCH seed {seed} thresh {thresh}: "
            f"{len(got_scan)} vs {len(want)}"
        )
    # ... and key-bucket-pruned point lookups must find exactly the model
    # row for live docs (bucket sets stay sound across every rewrite op)
    for doc in sorted(model)[:3]:
        got_rows = t.lookup(doc).collect()
        assert len(got_rows) == 1 and got_rows[0]["tokens"] == model[doc], (
            f"LOOKUP MISMATCH seed {seed} doc {doc}"
        )
    assert t.lookup("never-a-doc").count() == 0
    # end-of-seed: one final sync + audit so every seed proves egress
    # convergence from whatever state the interleaving left behind
    sync_modes.append(_sync_and_audit(spark, t, seed, created))
    if created:
        # free the seed's in-memory Derby database: without ;drop=true the
        # heap accumulates one database per seed across a multi-seed run
        try:
            spark._jvm.java.sql.DriverManager.getConnection(
                f"jdbc:derby:memory:fz{seed};drop=true")
        except Exception:
            pass  # SQLNonTransientConnectionException 08006 = dropped OK
    print(f"seed {seed}: {steps} steps OK "
          f"({len(model)} live docs, v{t.snapshot().version}, scans exact, "
          f"syncs {'/'.join(sync_modes)} audited)",
          flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="3,11,31,47,59,101,211,307")
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()
    seeds = [int(s) for s in args.seeds.split(",") if s.strip()]
    spark = get_spark("ops_fuzz", shuffle_partitions=8)
    root = tempfile.mkdtemp(prefix="opsfuzz_")
    t0 = time.time()
    try:
        for seed in seeds:
            run_seed(spark, root, seed, args.steps)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(f"ALL OK: {len(seeds)} seeds x {args.steps} steps "
          f"in {time.time() - t0:.1f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
