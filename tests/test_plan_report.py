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
