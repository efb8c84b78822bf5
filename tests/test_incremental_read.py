"""Incremental changes-between-snapshots read (LakeTable.read_changes).

Public analogs: Iceberg incremental read / Delta Change Data Feed. A
downstream consumer of the CDC-ingested lake (tokenizer shard refresh,
dedup index update) re-processes exactly the changed rows instead of
rescanning the table; the prune is metadata-only (changed_buckets compares
immutable file sets per bucket).
"""

from __future__ import annotations

import pytest

from stratum_spark.lake import LakeTable

DDL = "doc_id string, tokens array<int>, n_tok int, source string"


def by_key(df, key="doc_id"):
    return {r[key]: r.asDict() for r in df.collect()}


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "tok"), DDL, key="doc_id", n_buckets=4)
    t.append(
        spark.createDataFrame(
            [
                ("d1", [1, 2, 3], 3, "web"),
                ("d2", [4, 5], 2, "books"),
                ("d3", [6], 1, "code"),
            ],
            DDL,
        )
    )
    return t


def test_read_changes_insert_update_delete(spark, table):
    v1 = table.snapshot().version
    table.merge(
        spark.createDataFrame(
            [
                ("U", "d1", [9, 9], 2, "web"),
                ("I", "d4", [7, 8, 9], 3, "wiki"),
                ("D", "d2", None, None, None),
            ],
            f"op string, {DDL}",
        ),
        op_col="op",
    )
    ch = by_key(table.read_changes(v1))
    assert set(ch) == {"d1", "d2", "d4"}
    assert ch["d4"]["_change_type"] == "insert"
    assert ch["d4"]["tokens"] == [7, 8, 9]
    assert ch["d1"]["_change_type"] == "update_postimage"
    assert ch["d1"]["tokens"] == [9, 9]  # postimage = `to` side
    # delete carries the PREIMAGE (the `from` side's last visible row)
    assert ch["d2"]["_change_type"] == "delete"
    assert ch["d2"]["tokens"] == [4, 5]
    assert ch["d2"]["source"] == "books"


def test_read_changes_same_version_is_empty(table):
    v = table.snapshot().version
    assert table.read_changes(v, v).count() == 0


def test_read_changes_rejects_inverted_range(spark, table):
    v1 = table.snapshot().version
    table.merge(
        spark.createDataFrame([("I", "d5", [1], 1, "web")], f"op string, {DDL}"),
        op_col="op",
    )
    v2 = table.snapshot().version
    with pytest.raises(ValueError):
        table.read_changes(v2, v1)


def test_changed_buckets_prunes_untouched(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "pr"), DDL, key="doc_id", n_buckets=16)
    t.append(
        spark.createDataFrame(
            [(f"d{i}", [i], 1, "web") for i in range(64)], DDL
        ).repartition(16)
    )
    v1 = t.snapshot().version
    t.merge(
        spark.createDataFrame([("U", "d7", [99], 1, "web")], f"op string, {DDL}"),
        op_col="op",
    )
    v2 = t.snapshot().version
    changed = t.changed_buckets(v1, v2)
    # the single-key merge rewrites one bucket's files; the other buckets'
    # file sets are identical between versions and are never read
    assert len(changed) < 16
    ch = by_key(t.read_changes(v1, v2))
    assert set(ch) == {"d7"}
    assert ch["d7"]["_change_type"] == "update_postimage"


def test_compaction_is_invisible_to_read_changes(spark, table):
    table.merge(
        spark.createDataFrame(
            [("U", "d1", [9], 1, "web"), ("I", "d4", [7], 1, "wiki")],
            f"op string, {DDL}",
        ),
        op_col="op",
    )
    v2 = table.snapshot().version
    table.compact(target_files_per_bucket=1)
    v3 = table.snapshot().version
    if v3 != v2:  # compact may no-op when already at target
        # a pure rewrite changes file sets (buckets ARE re-read) but the
        # row-level diff is empty
        assert table.read_changes(v2, v3).count() == 0


def test_read_changes_across_schema_evolution(spark, table):
    v1 = table.snapshot().version
    table.add_column("lang", "string")
    table.merge(
        spark.createDataFrame(
            [("U", "d3", [6, 6], 2, "code", "en")],
            f"op string, {DDL}, lang string",
        ),
        op_col="op",
    )
    ch = by_key(table.read_changes(v1))
    # the from-side resolves to the `to` schema (lang=null) before diffing
    assert set(ch) == {"d3"}
    assert ch["d3"]["_change_type"] == "update_postimage"
    assert ch["d3"]["lang"] == "en"
    assert "lang" in table.read_changes(v1).columns


def test_read_changes_keyless_multiplicity(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "log"), "a int, b string", n_buckets=2)
    t.append(spark.createDataFrame([(1, "x"), (1, "x"), (2, "y")], "a int, b string"))
    v1 = t.snapshot().version
    t.append(spark.createDataFrame([(1, "x"), (3, "z")], "a int, b string"))
    ch = t.read_changes(v1).collect()
    types = sorted((r["a"], r["b"], r["_change_type"]) for r in ch)
    # append-only: the third (1,x) copy and the new (3,z) are inserts
    assert types == [(1, "x", "insert"), (3, "z", "insert")]
