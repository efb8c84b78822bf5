"""Demo: CDC ingest into the lake, then incremental sync-out to a JDBC
database (embedded Derby standing in for MySQL/PostgreSQL).

Run:  python examples/run_sync_out.py

Flow: synthetic binlog -> mor backfill (epoch 1) -> full sync to Derby ->
epoch 2 applies updates/deletes -> incremental sync ships ONLY the net
diff with the bookmark committed in the same database transaction ->
a repeated sync is a noop. Finally the target is read back over JDBC and
diffed against the engine state.
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from stratum_spark import get_spark
from stratum_spark.cdc import CdcApplier, generate_binlog, write_binlog

URL = "jdbc:derby:memory:syncdemo"
PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def main() -> int:
    spark = get_spark("sync-out-demo", cores=4)
    tmp = tempfile.mkdtemp(prefix="sync_demo_")

    feed = generate_binlog(spark, n_docs=300, n_events=2000, seed=11,
                           max_tokens=16, with_evolution=False)
    write_binlog(feed, f"{tmp}/binlog", n_chunks=4)

    conn = spark._jvm.java.sql.DriverManager.getConnection(URL + ";create=true")
    conn.createStatement().executeUpdate(
        'CREATE TABLE tok ("doc_id" VARCHAR(64) PRIMARY KEY, "tokens" '
        'VARCHAR(4096), "n_tok" INT, "source" VARCHAR(32), "lsn" BIGINT)'
    )
    conn.close()

    ap = CdcApplier(spark, f"{tmp}/wh", job_id="demo", n_buckets=8,
                    write_mode="mor", evolution=[], n_events_hint=2000)
    ap.run_backfill(f"{tmp}/binlog", epoch_size=1000, stop_after=1)
    print("epoch 1:", ap.sync_out(URL, "tok", properties=PROPS))

    ap.run_backfill(f"{tmp}/binlog", epoch_size=1000)
    print("epoch 2:", ap.sync_out(URL, "tok", properties=PROPS))
    print("again:  ", ap.sync_out(URL, "tok", properties=PROPS))

    want = {r["doc_id"] for r in ap.state().collect()}
    got = {r["doc_id"] for r in
           spark.read.jdbc(URL, "tok", properties=PROPS).collect()}
    assert got == want, f"target/state diverged: {len(got)} vs {len(want)}"
    print(f"target == engine state: {len(got)} docs")
    return 0


if __name__ == "__main__":
    sys.exit(main())
