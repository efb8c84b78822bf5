"""Optimistic-concurrency commit protocol tests: version-file CAS, conflict
surfacing, snapshot isolation for concurrent readers."""

from __future__ import annotations

import pytest

from stratum_spark.lake import LakeTable
from stratum_spark.lake.table import CommitConflict, Snapshot


def test_commit_conflict_raises(spark, tmp_path):
    root = str(tmp_path / "t")
    t1 = LakeTable.create(spark, root, "k string, v int", key="k", n_buckets=2)
    t2 = LakeTable.load(spark, root)

    df = spark.createDataFrame([("a", 1)], "k string, v int")
    t1.append(df)

    # t2 still holds the old snapshot; writing from it targets the same
    # version number t1 just took -> CAS failure
    stale = t2.snapshot(version=1)
    clash = Snapshot(
        version=stale.version + 1,
        schema_id=stale.schema_id,
        schemas=stale.schemas,
        key=stale.key,
        key_field_id=stale.key_field_id,
        n_buckets=stale.n_buckets,
        files=stale.files,
        committed=stale.committed,
        properties=stale.properties,
    )
    with pytest.raises(CommitConflict):
        t2._write_snapshot(clash)

    # a refreshed handle commits fine
    t2.snapshot(refresh=True)
    t2.append(spark.createDataFrame([("b", 2)], "k string, v int"))
    assert {r["k"] for r in t1.read().collect()} == {"a", "b"}


def test_snapshot_isolation_for_readers(spark, tmp_path):
    root = str(tmp_path / "t2")
    t = LakeTable.create(spark, root, "k string, v int", key="k", n_buckets=2)
    t.append(spark.createDataFrame([("a", 1)], "k string, v int"))
    v = t.snapshot().version
    reader_df = t.read(version=v)  # pinned to snapshot v
    t.merge(spark.createDataFrame([("a", 99)], "k string, v int"), op_col=None)
    # the pinned read still sees the old value (immutable files)
    assert reader_df.collect()[0]["v"] == 1
    assert t.read().collect()[0]["v"] == 99
