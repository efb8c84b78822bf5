"""Dry-run plan analysis -- the `stratum plan` entry point reimplemented.

Mirrors the reference's ReportBuilder pipeline
(crates/engine-planner/src/builder/mod.rs:161-257): per-pipeline source
analysis (row counts, columns), join/broadcast decisions, sampled
validation-failure estimation (generator.rs:525-570), destination schema
compatibility diagnostics, and the physical plan (our analog of the
dry-run SQL preview). Diagnostics carry Error/Warning/Info levels
(crates/engine-planner/src/plan/diagnostics/level.rs:5-10).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import functions as F

from stratum_spark.functions.expr import compile_expr
from stratum_spark.lake import LakeTable
from stratum_spark.plans.pipeline import Catalog, PipelineSpec, compile_pipeline


@dataclass
class Diagnostic:
    level: str  # error | warning | info | hint
    message: str


@dataclass
class PipelinePlan:
    name: str
    source_rows: int
    output_columns: list[str]
    joins: list[dict]
    validation_estimates: dict[str, dict]
    physical_plan: str
    diagnostics: list[Diagnostic] = field(default_factory=list)
    estimated_failures: int = 0
    sample_rows: list[dict] = field(default_factory=list)
    estimated_duration_s: float = 0.0
    estimate_detail: dict = field(default_factory=dict)


def estimate_duration(
    rows: int,
    n_joins: int,
    n_exprs: int,
    write_mode: str = "insert",
    parallelism: int = 1,
) -> dict:
    """Plan-time duration estimate, reimplementing the reference planner's
    published cost model (crates/engine-planner/src/builder/estimator.rs:
    22-60): a base per-row rate degraded by join-count and expression-count
    factors, plus fixed setup/checkpoint overheads. The base rates are the
    reference's own calibration constants used as PRIORS (its single-node
    COPY/INSERT throughput); `parallelism` scales the row phase for a
    multi-executor Spark run, which the reference (single-node) fixes at 1."""
    base = 40_000.0 if write_mode in ("insert", "replace") else 10_000.0
    join_f = {0: 1.0, 1: 0.9, 2: 0.8, 3: 0.7}.get(n_joins, 0.5)
    if n_exprs <= 2:
        expr_f = 1.0
    elif n_exprs <= 5:
        expr_f = 0.95
    elif n_exprs <= 10:
        expr_f = 0.90
    elif n_exprs <= 20:
        expr_f = 0.80
    else:
        expr_f = 0.70
    rate = max(base * join_f * expr_f * max(parallelism, 1), 100.0)
    setup_s = 1.0  # connection/session setup prior
    row_s = rows / rate
    return {
        "rows": rows,
        "rate_rows_per_s": round(rate, 1),
        "join_factor": join_f,
        "expr_factor": expr_f,
        "setup_s": setup_s,
        "row_phase_s": round(row_s, 3),
        "total_s": round(setup_s + row_s, 3),
    }


def plan_pipeline(
    spec: PipelineSpec,
    catalog: Catalog,
    warehouse: dict[str, LakeTable] | None = None,
    sample_size: int = 1000,
) -> PipelinePlan:
    diags: list[Diagnostic] = []
    src = catalog.df(spec.source)
    source_rows = src.count()  # parquet: metadata-only count

    df, failed, warn_rules = compile_pipeline(spec, catalog)

    # sampled validation estimation (the COUNT FILTER/SUM CASE estimate)
    est: dict[str, dict] = {}
    total_failures = 0
    sample = None
    gate = [v for v in spec.validations]
    if gate:
        base, _, _ = compile_pipeline(
            PipelineSpec(
                name=spec.name,
                source=spec.source,
                destination=spec.destination,
                filter=spec.filter,
                joins=spec.joins,
                mappings=spec.mappings,
                copy_columns=spec.copy_columns,
            ),
            catalog,
        )
        sample = base.limit(sample_size)
        aggs = [F.count("*").alias("__total")]
        for v in gate:
            pred = ~compile_expr(v.check, sample).cast("boolean").eqNullSafe(F.lit(True))
            aggs.append(F.sum(pred.cast("long")).alias(v.name))
        try:
            row = sample.agg(*aggs).collect()[0].asDict()
        except Exception as e:
            # a dry-run REPORTS problems instead of crashing: the usual
            # culprit is a validation referencing a source column that
            # MAP_ONLY pruning removed (validators run after the pruner,
            # the reference's producer order -- transform/pruner.rs then
            # validators) -- surface it as an error diagnostic
            msg = str(e).split("\n")[0]
            diags.append(
                Diagnostic(
                    "error",
                    "validation estimation failed (do the rules reference "
                    f"pruned source columns?): {msg}",
                )
            )
            row = {"__total": 0}
        total = row.pop("__total")
        for v in gate:
            n = int(row.get(v.name) or 0)
            est[v.name] = {"sampled": total, "failures": n, "action": v.action}
            if v.action in ("skip", "fail"):
                total_failures += n
            if n and v.action == "fail":
                diags.append(
                    Diagnostic("error", f"validation '{v.name}' would abort: {n}/{total} sampled rows fail")
                )
            elif n:
                diags.append(
                    Diagnostic("warning", f"validation '{v.name}': {n}/{total} sampled rows fail ({v.action})")
                )

    # destination compatibility
    if warehouse is not None and spec.destination in warehouse:
        dest_schema = warehouse[spec.destination].snapshot().schema
        dest_cols = {f.name.lower() for f in dest_schema.fields}
        out_cols = {c.lower() for c in df.columns}
        missing = dest_cols - out_cols
        extra = out_cols - dest_cols
        if extra:
            diags.append(Diagnostic("error", f"output columns not in destination: {sorted(extra)}"))
        if missing:
            diags.append(Diagnostic("info", f"destination columns filled with NULL: {sorted(missing)}"))
        if spec.write_mode in ("upsert", "update") and warehouse[spec.destination].snapshot().key is None:
            diags.append(Diagnostic("error", "upsert/update write mode needs a keyed destination"))
    elif warehouse is not None:
        diags.append(Diagnostic("error", f"unknown destination table: {spec.destination}"))

    # preview sample (stratum `plan --sample [--sample-size N]`,
    # crates/engine-planner/src/builder/analyzers/sample.rs:78-82 --
    # ORDER BY RANDOM() with a seed for determinism)
    sample_rows = [
        r.asDict() for r in df.orderBy(F.rand(seed=42)).limit(5).collect()
    ]

    joins = [
        {"alias": j.alias, "table": j.table, "kind": j.kind, "broadcast": j.broadcast}
        for j in spec.joins
    ]
    jvm = df.sparkSession._jvm
    plan_str = jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    n_exprs = sum(1 for _, m in spec.mappings if not isinstance(m, str))
    est_detail = estimate_duration(
        rows=source_rows,
        n_joins=len(spec.joins),
        n_exprs=n_exprs,
        write_mode=spec.write_mode,
        parallelism=df.sparkSession.sparkContext.defaultParallelism,
    )
    return PipelinePlan(
        name=spec.name,
        source_rows=source_rows,
        output_columns=df.columns,
        joins=joins,
        validation_estimates=est,
        physical_plan=plan_str,
        diagnostics=diags,
        estimated_failures=total_failures,
        sample_rows=sample_rows,
        estimated_duration_s=est_detail["total_s"],
        estimate_detail=est_detail,
    )


def plan_report(
    specs: list[PipelineSpec],
    catalog: Catalog,
    warehouse: dict[str, LakeTable] | None = None,
) -> dict[str, PipelinePlan]:
    return {s.name: plan_pipeline(s, catalog, warehouse) for s in specs}
