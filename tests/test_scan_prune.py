"""Manifest-stats file skipping (scan) and timestamp time travel.

The footer pass that gives the manifest its row counts already reads
column bounds; `stats.columns` turns those into Iceberg-style min/max
file pruning: a range scan over a 10^10-row table opens only the files
whose bounds intersect the predicate -- metadata-only, zero jobs. The
prune is a pure superset optimization: the predicate is re-applied in
Spark, so files without stats are kept and results stay exact.
"""

from __future__ import annotations

import time

import pytest

from stratum_spark.lake.table import LakeTable, _bounds_exclude, prune_entries

SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"


def _mk(spark, path, props=None, key="doc_id"):
    return LakeTable.create(
        spark, str(path), SCHEMA, key=key, n_buckets=4,
        properties=props,
    )


def _batch(spark, lo, hi, prefix="d"):
    rows = [(f"{prefix}{i}", [i % 7], i, "s") for i in range(lo, hi)]
    return spark.createDataFrame(rows, SCHEMA)


def test_bounds_exclude_ops():
    b = (10, 20)
    assert _bounds_exclude(b, "=", 5) and _bounds_exclude(b, "=", 25)
    assert not _bounds_exclude(b, "=", 10) and not _bounds_exclude(b, "=", 20)
    assert _bounds_exclude(b, "<", 10) and not _bounds_exclude(b, "<", 11)
    assert _bounds_exclude(b, "<=", 9) and not _bounds_exclude(b, "<=", 10)
    assert _bounds_exclude(b, ">", 20) and not _bounds_exclude(b, ">", 19)
    assert _bounds_exclude(b, ">=", 21) and not _bounds_exclude(b, ">=", 20)
    # incomparable stats type keeps the file (prune must prove, not guess)
    assert not _bounds_exclude(("a", "z"), ">=", 5)
    with pytest.raises(ValueError):
        prune_entries([], [("n_tok", "!=", 5)])


def test_scan_prunes_files_by_manifest_bounds(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", props={"stats.columns": "n_tok"})
    t.append(_batch(spark, 1, 11))        # n_tok 1..10
    t.append(_batch(spark, 100, 111))     # n_tok 100..110
    t.append(_batch(spark, 1000, 1011))   # n_tok 1000..1010
    snap = t.snapshot()
    assert all(e.stats and "n_tok" in e.stats for e in snap.files)

    pruned = t.scan_files([("n_tok", ">=", 500)])
    assert pruned and len(pruned) < len(snap.files)
    assert all(e.stats["n_tok"][1] >= 500 for e in pruned)

    got = sorted(r["n_tok"] for r in t.scan([("n_tok", ">=", 500)]).collect())
    want = sorted(
        r["n_tok"] for r in t.read().filter("n_tok >= 500").collect()
    )
    assert got == want == list(range(1000, 1011))

    # conjunction: a point lookup inside the middle batch
    assert len(t.scan_files([("n_tok", ">=", 100), ("n_tok", "<=", 110)])) < len(
        snap.files
    )
    rows = t.scan([("n_tok", "=", 105)]).collect()
    assert [r["doc_id"] for r in rows] == ["d105"]


def test_scan_keeps_files_without_stats(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.append(_batch(spark, 1, 6))  # written with NO stats recorded
    t.set_properties({"stats.columns": "n_tok"})
    t.append(_batch(spark, 100, 106))
    snap = t.snapshot()
    assert any(not e.stats for e in snap.files)
    # the stats-less files survive every prune; results stay exact
    assert len(t.scan_files([("n_tok", ">=", 100)])) >= sum(
        1 for e in snap.files if not e.stats
    )
    got = sorted(r["n_tok"] for r in t.scan([("n_tok", "<", 100)]).collect())
    assert got == [1, 2, 3, 4, 5]


def test_scan_string_bounds(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", props={"stats.columns": "doc_id"})
    t.append(_batch(spark, 0, 8, prefix="a"))
    t.append(_batch(spark, 0, 8, prefix="z"))
    pruned = t.scan_files([("doc_id", ">=", "z")])
    assert pruned and len(pruned) < len(t.snapshot().files)
    assert t.scan([("doc_id", ">=", "z")]).count() == 8


def test_epoch_appends_prune_by_lsn(spark, tmp_path):
    """The CDC-consumer read: epochs land as appends with lsn bounds; a
    reader catching up from lsn X opens only the files past X."""
    schema = SCHEMA + ", lsn bigint"
    t = LakeTable.create(
        spark, str(tmp_path / "t"), schema, key=None, n_buckets=4,
        properties={"stats.columns": "lsn"},
    )
    for ep in range(4):
        rows = [
            (f"d{ep}_{i}", [i], i, "s", ep * 1000 + i) for i in range(20)
        ]
        t.append_epoch(
            spark.createDataFrame(rows, schema), job_id="j", epoch=ep,
            lsn_max=ep * 1000 + 19,
        )
    snap = t.snapshot()
    assert all(e.stats and "lsn" in e.stats for e in snap.files)
    pruned = t.scan_files([("lsn", ">", 2999)])
    assert pruned and len(pruned) < len(snap.files)
    assert t.scan([("lsn", ">", 2999)]).count() == 20


def test_compact_preserves_stats_and_scan_exactness(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", props={"stats.columns": "n_tok"})
    t.append(_batch(spark, 1, 30))
    t.append(_batch(spark, 100, 130))
    before = sorted(
        (r["doc_id"], r["n_tok"])
        for r in t.scan([("n_tok", ">=", 100)]).collect()
    )
    t.compact(target_files_per_bucket=1)
    snap = t.snapshot()
    assert all(e.stats and "n_tok" in e.stats for e in snap.files)
    after = sorted(
        (r["doc_id"], r["n_tok"])
        for r in t.scan([("n_tok", ">=", 100)]).collect()
    )
    assert after == before


def test_merge_records_property_stats(spark, tmp_path):
    up_schema = SCHEMA + ", op string"
    t = _mk(spark, tmp_path / "t", props={"stats.columns": "n_tok"})
    t.merge(
        spark.createDataFrame(
            [(f"d{i}", [i], i, "s", "I") for i in range(10)], up_schema
        ),
        op_col="op",
    )
    assert all(e.stats and "n_tok" in e.stats for e in t.snapshot().files)


def test_snapshot_at_time_travel(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.append(_batch(spark, 0, 5))
    v1 = t.snapshot()
    time.sleep(0.01)
    t.append(_batch(spark, 5, 10))
    v2 = t.snapshot()
    assert v2.timestamp_ms > v1.timestamp_ms
    assert t.snapshot_at(v1.timestamp_ms).version == v1.version
    assert t.read_as_of(v1.timestamp_ms).count() == 5
    assert t.read_as_of(v2.timestamp_ms).count() == 10
    with pytest.raises(ValueError):
        t.snapshot_at(v1.timestamp_ms - 100000)


def test_xxh64_bit_identical_to_spark(spark):
    """The driver-side XXH64 must match F.xxhash64 exactly -- adversarial
    lengths cover every tail branch (empty, <4, <8, 8..31, 32+, unicode)."""
    from pyspark.sql import functions as F

    from stratum_spark.functions.xxh64 import key_bucket, xxhash64_signed

    cases = ["", "a", "abc", "doc-00000042", "x" * 7, "y" * 8, "z" * 9,
             "q" * 15, "w" * 31, "v" * 32, "u" * 33, "t" * 40,
             "héllo wörld ünïcode", "日本語テスト", "doc-" + "9" * 60]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    rows = df.select(
        "s",
        F.xxhash64(F.col("s").cast("string")).alias("h"),
        F.pmod(F.xxhash64(F.col("s").cast("string")), F.lit(8)).cast("int").alias("b"),
    ).collect()
    for r in rows:
        assert xxhash64_signed(r["s"].encode("utf-8")) == r["h"], r["s"]
        assert key_bucket(r["s"], 8) == r["b"], r["s"]
    # Spark's hash functions skip NULL inputs -> seed (42); the python
    # bucket must agree, not hash the string "None"
    nr = spark.range(1).select(
        F.pmod(F.xxhash64(F.lit(None).cast("string")), F.lit(8))
        .cast("int").alias("b")
    ).first()
    assert key_bucket(None, 8) == nr["b"] == 42 % 8


def test_lookup_prunes_to_single_bucket(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.append(_batch(spark, 1, 81))
    snap = t.snapshot()
    pruned = t.scan_files([("doc_id", "=", "d7")])
    assert pruned and len(pruned) < len(snap.files)
    got = t.lookup("d7").collect()
    assert len(got) == 1 and got[0]["n_tok"] == 7
    assert t.lookup("absent-key").count() == 0


def test_lookup_exact_after_metadata_rebucket(spark, tmp_path):
    """Metadata-only bucket growth remaps each file's bucket set to its
    derived set; lookups must keep finding every key under the new
    modulus."""
    t = _mk(spark, tmp_path / "t")
    t.append(_batch(spark, 1, 41))
    t.rebucket(8)
    for i in (1, 13, 27, 40):
        got = t.lookup(f"d{i}").collect()
        assert len(got) == 1 and got[0]["n_tok"] == i


def test_scan_key_equality_on_keyless_table_stays_exact(spark, tmp_path):
    t = _mk(spark, tmp_path / "k", key=None)
    t.append(_batch(spark, 1, 5))
    with pytest.raises(ValueError):
        t.lookup("d1")
    assert [r["n_tok"] for r in t.scan([("doc_id", "=", "d3")]).collect()] == [3]


def test_append_local_records_key_buckets(spark, tmp_path):
    """append_local on a keyed table must record the exact bucket set so
    key-bucket pruning never misses its rows."""
    t = LakeTable.create(
        spark, str(tmp_path / "kl"), "doc_id string, n int",
        key="doc_id", n_buckets=4,
    )
    t.append_local([{"doc_id": "a", "n": 1}, {"doc_id": "b", "n": 2}])
    e = t.snapshot().files[-1]
    from stratum_spark.functions.xxh64 import key_bucket

    want = {key_bucket("a", 4), key_bucket("b", 4)}
    assert set(e.buckets) == want
    got = t.lookup("a").collect()
    assert len(got) == 1 and got[0]["n"] == 1


def test_sort_columns_clusters_compaction_output(spark, tmp_path):
    """sort.columns (Iceberg sort-order analog): compaction rewrites come
    out physically sorted by the declared column, so parquet row-group
    and manifest bounds are tight; scans stay exact."""
    import pyarrow.parquet as pq

    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key="doc_id", n_buckets=1,
        properties={"stats.columns": "n_tok", "sort.columns": "n_tok"},
    )
    # interleaved ranges across appends -> unsorted input to compaction
    t.append(_batch(spark, 50, 100, prefix="a"))
    t.append(_batch(spark, 1, 50, prefix="b"))
    t.append(_batch(spark, 100, 150, prefix="c"))
    t.compact(target_files_per_bucket=1)
    snap = t.snapshot()
    import os as _os

    for e in snap.files:
        vals = pq.read_table(
            _os.path.join(t.root, e.path), columns=["n_tok"]
        )["n_tok"].to_pylist()
        assert vals == sorted(vals), f"file {e.path} not sorted"
        assert e.stats["n_tok"] == (min(vals), max(vals))
    got = sorted(r["n_tok"] for r in t.scan([("n_tok", "<", 30)]).collect())
    assert got == list(range(1, 30))
