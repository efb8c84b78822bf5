"""Pipeline spec + DAG tests, mirroring the reference's integration suite
(crates/engine-tests/src/integration.rs: filters, multi-join + mappings,
MAP_ONLY pruning, computed when-tiers, validation skip/warn/fail;
dag_integration.rs topologies)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stratum_spark.functions import Bin, Call, Ident, Lit, When
from stratum_spark.lake import LakeTable
from stratum_spark.plans import (
    Catalog,
    JoinSpec,
    PipelineSpec,
    ValidationRule,
    compile_pipeline,
    run_dag,
    run_pipeline,
)


@pytest.fixture(scope="module")
def catalog(spark, sf_dir):
    return Catalog(
        spark,
        {
            name: f"{sf_dir}/{name}.parquet"
            for name in ["region", "nation", "customer", "orders", "lineitem"]
        },
    )


def test_filter_restricts_rows(spark, catalog, sf_dir):
    # integration.rs:445 where_filter_restricts_migrated_rows
    spec = PipelineSpec(
        name="filtered",
        source="orders",
        destination="dst",
        filter=Bin("==", Ident("o_orderstatus"), Lit("F")),
    )
    df, failed, _ = compile_pipeline(spec, catalog)
    n_f = spark.read.parquet(f"{sf_dir}/orders.parquet").where("o_orderstatus = 'F'").count()
    assert df.count() == n_f and failed is None


def test_multi_join_mapping_map_only(spark, catalog):
    # integration.rs:377 multi_join_with_column_mappings_copies_joined_data
    spec = PipelineSpec(
        name="joined",
        source="orders",
        destination="dst",
        joins=(
            JoinSpec("c", "customer", (("o_custkey", "c_custkey"),)),
            JoinSpec("n", "nation", (("c.c_nationkey", "n_nationkey"),)),
        ),
        mappings=(
            ("order_id", "o_orderkey"),
            ("customer_name", "c_name"),
            ("nation_name", "n_name"),
            ("total", "o_totalprice"),
        ),
        copy_columns="MAP_ONLY",
    )
    df, _, _ = compile_pipeline(spec, catalog)
    assert df.columns == ["order_id", "customer_name", "nation_name", "total"]
    assert df.count() == catalog.df("orders").count()  # FK complete
    # broadcast hint took: dims should broadcast, not shuffle
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_computed_when_tiers(spark, catalog):
    # when.smql computed-tier example; computed cols see earlier outputs
    spec = PipelineSpec(
        name="tiers",
        source="orders",
        destination="dst",
        mappings=(
            ("price_k", Bin("/", Ident("o_totalprice"), Lit(1000.0))),
            (
                "tier",
                When(
                    branches=(
                        (Bin(">", Ident("price_k"), Lit(200.0)), Lit("high")),
                        (Bin(">", Ident("price_k"), Lit(100.0)), Lit("mid")),
                    ),
                    default=Lit("low"),
                ),
            ),
            ("label", Call("concat", (Ident("tier"), Lit(":"), Ident("o_orderkey")))),
        ),
    )
    df, _, _ = compile_pipeline(spec, catalog)
    row = df.where("tier = 'high'").select("price_k", "label").first()
    assert row["price_k"] > 200 and row["label"].startswith("high:")


def test_validation_skip_and_warn(spark, catalog):
    spec = PipelineSpec(
        name="validated",
        source="lineitem",
        destination="dst",
        validations=(
            ValidationRule("qty_pos", Bin(">", Ident("l_quantity"), Lit(25.0)), "skip"),
            ValidationRule("has_flag", Bin("!=", Ident("l_returnflag"), Lit("")), "warn"),
        ),
    )
    df, failed, warns = compile_pipeline(spec, catalog)
    total = catalog.df("lineitem").count()
    assert df.count() + failed.count() == total
    assert failed.count() > 0
    assert [w.name for w in warns] == ["has_flag"]


def test_warn_counts_cover_only_gate_passing_rows(spark, catalog, tmp_path):
    """Overlapping skip+warn rules: rows removed by the skip-action gate
    never reach the destination, so they must not inflate warn counts."""
    wh = {
        "dst": LakeTable.create(
            spark, str(tmp_path / "dstw"),
            "o_orderkey bigint, o_totalprice double", n_buckets=2,
        )
    }
    spec = PipelineSpec(
        name="warnscope",
        source="orders",
        destination="dst",
        mappings=(("o_orderkey", "o_orderkey"), ("o_totalprice", "o_totalprice")),
        copy_columns="MAP_ONLY",
        validations=(
            ValidationRule("gate_small", Bin("<", Ident("o_totalprice"), Lit(300000.0)), "skip"),
            ValidationRule("warn_big", Bin("<", Ident("o_totalprice"), Lit(200000.0)), "warn"),
        ),
    )
    res = run_pipeline(spec, catalog, wh)
    orders = catalog.df("orders")
    # warn count = rows that PASSED the gate but failed the warn rule
    want_warn = orders.where(
        "o_totalprice >= 200000.0 AND o_totalprice < 300000.0"
    ).count()
    want_gate = orders.where("o_totalprice >= 300000.0").count()
    assert want_warn > 0 and want_gate > 0  # fixture actually overlaps
    assert res.rows_failed == want_gate
    assert res.warnings.get("warn_big", 0) == want_warn


def test_failing_after_hook_keeps_write_stats(spark, catalog, tmp_path):
    """An after-hook failure surfaces on the result that carries the write
    stats -- the write already committed durably and must not be reported
    as having written nothing."""
    wh = {"dsth": LakeTable.create(spark, str(tmp_path / "dsth"), "order_id bigint", n_buckets=2)}
    spec = PipelineSpec(
        name="hooked",
        source="orders",
        destination="dsth",
        mappings=(("order_id", "o_orderkey"),),
        copy_columns="MAP_ONLY",
    )
    res = run_dag(
        [spec], catalog, wh,
        hooks={"hooked": {"after": ["SELECT * FROM missing_table_xyz"]}},
    )["hooked"]
    assert res.error is not None  # hook failure surfaced...
    assert res.rows_written > 0  # ...on the result carrying the committed write
    assert wh["dsth"].row_count() == res.rows_written


def test_validation_fail_aborts(spark, catalog, tmp_path):
    wh = {"dst": LakeTable.create(spark, str(tmp_path / "dst"), "o_orderkey bigint", n_buckets=2)}
    spec = PipelineSpec(
        name="failing",
        source="orders",
        destination="dst",
        mappings=(("o_orderkey", "o_orderkey"),),
        copy_columns="MAP_ONLY",
        validations=(
            ValidationRule("impossible", Bin("<", Ident("o_orderkey"), Lit(0)), "fail"),
        ),
    )
    with pytest.raises(RuntimeError, match="fail-action"):
        run_pipeline(spec, catalog, wh)


def test_pipeline_write_modes_and_dag(spark, catalog, tmp_path):
    wh = {
        "cust_flat": LakeTable.create(
            spark,
            str(tmp_path / "cust_flat"),
            "custkey bigint, name string, nation string",
            key="custkey",
            n_buckets=4,
        ),
        "order_sum": LakeTable.create(
            spark,
            str(tmp_path / "order_sum"),
            "orderkey bigint, total double",
            key="orderkey",
            n_buckets=4,
        ),
    }
    p1 = PipelineSpec(
        name="cust",
        source="customer",
        destination="cust_flat",
        joins=(JoinSpec("n", "nation", (("c_nationkey", "n_nationkey"),)),),
        mappings=(("custkey", "c_custkey"), ("name", "c_name"), ("nation", "n_name")),
        copy_columns="MAP_ONLY",
        write_mode="upsert",
        key="custkey",
    )
    p2 = PipelineSpec(
        name="ord",
        source="orders",
        destination="order_sum",
        mappings=(("orderkey", "o_orderkey"), ("total", "o_totalprice")),
        copy_columns="MAP_ONLY",
        write_mode="upsert",
        key="orderkey",
        after=("cust",),
    )
    p3 = PipelineSpec(  # independent failing pipeline: bad source
        name="bad",
        source="nope",
        destination="order_sum",
    )
    p4 = PipelineSpec(name="bad_child", source="orders", destination="order_sum", after=("bad",))
    results = run_dag([p1, p2, p3, p4], catalog, wh, max_parallel=2)
    assert results["cust"].error is None and results["cust"].rows_written == 150
    assert results["ord"].error is None and results["ord"].rows_written == 1500
    assert results["bad"].error is not None
    assert results["bad_child"].skipped  # poisoned by dependency
    # upsert idempotence: re-running changes nothing
    again = run_pipeline(p1, catalog, wh)
    assert again.rows_written == 150
    assert wh["cust_flat"].read().count() == 150
