"""Hot-key skew: the north-star scenario -- a large fraction of the change
traffic hammers a handful of doc_ids. Correctness must be unaffected and
the dedup path must not concentrate the hot key's rows on one task (the
partial-aggregate property asserted in test_plan_quality)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stratum_spark.cdc import CdcApplier, generate_binlog, write_binlog
from stratum_spark.cdc.dedup import lww_dedup
from stratum_spark.cdc.oracle import replay_binlog, state_as_records


def test_extreme_hot_key_dedup_and_apply(spark, tmp_path):
    # 60% of events on ~3 hot ids (generator: hot set = n_docs//1000 >= 1)
    feed = generate_binlog(
        spark, n_docs=3000, n_events=20000, seed=4, max_tokens=16,
        hot_traffic=0.6, with_evolution=True,
    )
    hot_share = (
        feed.groupBy("doc_id").count().orderBy(F.desc("count")).limit(3)
        .agg(F.sum("count")).collect()[0][0]
    )
    assert hot_share > 0.5 * 20000, "fixture must actually be skewed"

    # dedup collapses the hot keys to single rows
    ded = lww_dedup(feed, "doc_id", "lsn")
    assert ded.groupBy("doc_id").count().agg(F.max("count")).collect()[0][0] == 1

    # end-to-end apply equals the sequential oracle despite the skew
    write_binlog(feed, str(tmp_path / "binlog"), n_chunks=4)
    ap = CdcApplier(spark, str(tmp_path / "wh"), job_id="skew", n_buckets=8,
                    n_events_hint=20000)
    ap.run_backfill(str(tmp_path / "binlog"), epoch_size=5000)
    want = state_as_records(replay_binlog(str(tmp_path / "binlog")), 3)
    got = {r["doc_id"]: r.asDict() for r in ap.state().collect()}
    assert set(got) == set(want)
    for k, w in want.items():
        assert got[k]["tokens"] == w["tokens"], k
