"""Physical-plan quality gates: the properties that make these operators
viable at 100 TB (pushdown reaching the scan, broadcast dimension joins,
whole-stage codegen, no cartesian products, partial aggregation for the
LWW dedup). Guard rails against regressions that would only show up at
scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as em
from stratum_spark.cdc import generate_binlog
from stratum_spark.cdc.dedup import lww_dedup


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def full_plan(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    df = em.queries()["filter_pushdown"](spark, sf_dir)
    plan = full_plan(df)
    assert "PushedFilters" in plan
    assert "o_orderstatus" in plan.split("PushedFilters")[1][:400]


def test_projection_prunes_scan_columns(spark, sf_dir):
    df = em.queries()["scan_projection"](spark, sf_dir)
    plan = full_plan(df)
    read_schema = plan.split("ReadSchema")[1][:300]
    assert "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema  # unused column not scanned


def test_dim_joins_broadcast(spark, sf_dir):
    plan = plan_of(em.queries()["multi_join"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan


def test_no_cartesian_product_in_lsh(spark, sf_dir):
    plan = plan_of(em.queries()["ann_topk_lsh"](spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_no_cartesian_in_embedding_neardup(spark, sf_dir):
    """The gated near-dup entry must route through the LSH bucket join --
    an all-pairs id_a < id_b join would be O(n^2) at corpus scale."""
    plan = plan_of(em.queries()["dedup_embedding_cosine"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_validation_counts_single_pass(spark, tmp_path):
    """N warn rules must NOT cost N extra jobs: the counts ride the write
    via Observation, so a 3-rule pipeline runs the same number of Spark
    jobs as a 0-rule pipeline."""
    from stratum_spark.functions.parser import parse_expr
    from stratum_spark.lake import LakeTable
    from stratum_spark.plans.pipeline import Catalog, PipelineSpec, ValidationRule, run_pipeline

    src = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 10).alias("v")
    )
    cat = Catalog(spark, {"src": src})

    def mk(name, rules):
        return PipelineSpec(
            name=name, source="src", destination="dst",
            mappings=(("k", "k"), ("v", "v")), copy_columns="MAP_ONLY",
            validations=rules,
        )

    rules3 = tuple(
        ValidationRule(f"r{i}", parse_expr(f"v != {i}"), "warn") for i in range(3)
    )
    sc = spark.sparkContext

    def jobs_for(spec, dst_dir):
        wh = {"dst": LakeTable.create(spark, dst_dir, "k bigint, v bigint")}
        sc.setJobGroup(spec.name, spec.name)
        try:
            res = run_pipeline(spec, cat, wh)
        finally:
            sc.setJobGroup(None, None)
        return len(sc.statusTracker().getJobIdsForGroup(spec.name)), res

    n0, _ = jobs_for(mk("zero_rules", ()), str(tmp_path / "d0"))
    n3, res3 = jobs_for(mk("three_rules", rules3), str(tmp_path / "d3"))
    assert n3 == n0, f"validation rules added jobs: {n0} -> {n3}"
    # rule 'v != i' fails exactly where v == i: 100 of the 1000 rows each
    assert res3.warnings == {"r0": 100, "r1": 100, "r2": 100}


def test_agg_uses_whole_stage_codegen_and_partial_agg(spark, sf_dir):
    df = em.queries()["agg_pricing"](spark, sf_dir)
    df.collect()  # finalize the adaptive plan so codegen spans materialize
    plan = plan_of(df)
    # '*(n)' operator prefixes mark whole-stage-codegen spans
    assert "*(" in plan
    # partial (map-side) aggregation before the exchange
    assert "partial_sum" in plan and plan.count("HashAggregate") >= 2


def test_lww_dedup_is_partial_aggregate_not_window(spark):
    """The skew-critical property: dedup must plan as a hash aggregate with
    a partial phase (map-side combine of hot keys), not a window sort."""
    # localCheckpoint truncates the generator's lineage (it uses a window
    # itself) so the inspected plan is dedup-only
    df = generate_binlog(
        spark, n_docs=50, n_events=500, seed=1, with_evolution=False
    ).localCheckpoint()
    plan = plan_of(lww_dedup(df, "doc_id", "lsn"))
    assert "Window" not in plan
    # partial_max_by below the exchange = map-side combine of hot keys
    assert "partial_max_by" in plan


def test_semi_join_stays_semi(spark, sf_dir):
    plan = plan_of(em.queries()["semi_join"](spark, sf_dir))
    assert "LeftSemi" in plan
