"""Dry-run plan report tests (the `stratum plan` analog: analyzers,
validation estimation, destination diagnostics, physical-plan preview)."""

from __future__ import annotations

from stratum_spark.functions import Bin, Ident, Lit
from stratum_spark.lake import LakeTable
from stratum_spark.plans import Catalog, JoinSpec, PipelineSpec, ValidationRule
from stratum_spark.plans.report import plan_report


def test_plan_report(spark, sf_dir, tmp_path):
    cat = Catalog(
        spark, {n: f"{sf_dir}/{n}.parquet" for n in ["orders", "customer"]}
    )
    wh = {
        "dst": LakeTable.create(
            spark, str(tmp_path / "dst"),
            "order_id bigint, name string",
            key="order_id", n_buckets=2,
        )
    }
    spec = PipelineSpec(
        name="p",
        source="orders",
        destination="dst",
        joins=(JoinSpec("c", "customer", (("o_custkey", "c_custkey"),)),),
        mappings=(("order_id", "o_orderkey"), ("name", "c.c_name"),
                  ("bogus", Bin("+", Ident("o_totalprice"), Lit(1.0)))),
        copy_columns="MAP_ONLY",
        validations=(ValidationRule("pricey", Bin(">", Ident("order_id"), Lit(100)), "skip"),),
        write_mode="upsert",
        key="order_id",
    )
    rep = plan_report([spec], cat, wh)["p"]
    assert rep.source_rows == 1500
    assert rep.output_columns == ["order_id", "name", "bogus"]
    assert rep.joins[0]["broadcast"] is True
    assert rep.validation_estimates["pricey"]["failures"] > 0
    # 'bogus' not in destination -> error diagnostic
    assert any(d.level == "error" and "bogus" in d.message for d in rep.diagnostics)
    assert "BroadcastHashJoin" in rep.physical_plan


def test_plan_report_missing_destination(spark, sf_dir):
    cat = Catalog(spark, {"orders": f"{sf_dir}/orders.parquet"})
    spec = PipelineSpec(name="p2", source="orders", destination="nope")
    rep = plan_report([spec], cat, warehouse={})["p2"]
    assert any(d.level == "error" and "unknown destination" in d.message for d in rep.diagnostics)


def test_plan_duration_estimate(spark, sf_dir, tmp_path):
    """The planner publishes a duration estimate built from the reference's
    cost-model priors (estimator.rs:22-60): present, positive, scaling with
    row count, and degraded by join count."""
    from stratum_spark.plans.report import estimate_duration, plan_report

    cat = Catalog(spark, {n: f"{sf_dir}/{n}.parquet" for n in ["orders", "customer"]})
    wh = {"d": LakeTable.create(spark, str(tmp_path / "d"), "order_id bigint")}
    spec = PipelineSpec(
        name="p3", source="orders", destination="d",
        mappings=(("order_id", "o_orderkey"),), copy_columns="MAP_ONLY",
    )
    rep = plan_report([spec], cat, wh)["p3"]
    assert rep.estimated_duration_s > 0
    assert rep.estimate_detail["rows"] == rep.source_rows

    # scales linearly in rows, monotonically worse with joins/exprs
    e1 = estimate_duration(1_000_000, n_joins=0, n_exprs=0)
    e2 = estimate_duration(10_000_000, n_joins=0, n_exprs=0)
    assert e2["row_phase_s"] / e1["row_phase_s"] == 10.0
    e3 = estimate_duration(1_000_000, n_joins=3, n_exprs=25)
    assert e3["total_s"] > e1["total_s"]
    # rate floor (the reference's MIN_SAFE guard)
    assert estimate_duration(100, 99, 99)["rate_rows_per_s"] >= 100.0
