"""Declarative pipeline spec -> DataFrame DAG (stratum's Pipeline analog).

Model mirror: crates/model/src/execution/pipeline.rs:10-24 (source ->
transformations -> validations -> destination + write mode) with the
transform stage order of the reference's producer assembly
(crates/engine-processing/src/producer/mod.rs:36-94):
TableMapper -> FieldMapper -> [plugin transforms] -> ComputedTransform ->
FieldPruner -> Validators. Here each stage is a declarative DataFrame
rewrite, so Catalyst gets the whole plan (pushdown/pruning come free --
the reference implements both by hand, SURVEY.md §4).

Joins are the `with {alias from table where cond}` construct
(crates/connectors/src/sql/join/clause.rs:4-34): equi-conditions only,
INNER/LEFT/RIGHT/FULL kinds; small dimension tables are broadcast.

Validations (crates/model/src/execution/pipeline.rs:88-119): action
`skip` drops failing rows to the DLQ DataFrame, `warn` keeps them and
counts, `fail` aborts the pipeline if any row fails.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stratum_spark.functions.expr import Expr, compile_expr
from stratum_spark.lake import LakeTable


@dataclass(frozen=True)
class JoinSpec:
    alias: str
    table: str
    # equi-conditions: [(left_col, right_col)] where left refers to the
    # accumulated join tree and right to the newly joined table
    on: tuple[tuple[str, str], ...]
    kind: str = "inner"  # inner | left | right | full
    broadcast: bool = True  # dims default to broadcast (scale: avoid shuffle)


@dataclass(frozen=True)
class ValidationRule:
    name: str
    check: Expr  # row passes when check is TRUE
    action: str = "skip"  # skip | warn | fail


@dataclass(frozen=True)
class PipelineSpec:
    name: str
    source: str
    destination: str
    filter: Expr | None = None
    joins: tuple[JoinSpec, ...] = ()
    # target column -> source column name (rename) or Expr (computed);
    # evaluated in declaration order, later exprs see earlier outputs
    # (crates/engine-processing/src/transform/computed.rs:23-45)
    mappings: tuple[tuple[str, str | Expr], ...] = ()
    copy_columns: str = "ALL"  # ALL | MAP_ONLY (FieldPruner, transform/pruner.rs:15-72)
    validations: tuple[ValidationRule, ...] = ()
    write_mode: str = "insert"  # insert | upsert | update | replace
    key: str | None = None
    after: tuple[str, ...] = ()  # DAG dependencies (dag/builder.rs)


@dataclass
class PipelineResult:
    name: str
    rows_written: int = 0
    rows_failed: int = 0
    warnings: dict[str, int] = field(default_factory=dict)
    error: str | None = None
    skipped: bool = False
    hooks_run: list[str] = field(default_factory=list)


class Catalog:
    """Name -> DataFrame resolver over parquet paths, lake tables, or DFs."""

    def __init__(self, spark: SparkSession, entries: dict[str, object] | None = None):
        self.spark = spark
        self.entries: dict[str, object] = dict(entries or {})

    def register(self, name: str, source: object) -> None:
        self.entries[name] = source

    def df(self, name: str) -> DataFrame:
        src = self.entries[name]
        if isinstance(src, DataFrame):
            return src
        if isinstance(src, LakeTable):
            return src.read()
        if isinstance(src, str):
            return self.spark.read.parquet(src)
        raise TypeError(f"unresolvable catalog entry {name}: {type(src)}")


def compile_pipeline(
    spec: PipelineSpec, catalog: Catalog
) -> tuple[DataFrame, DataFrame | None, list[ValidationRule]]:
    """Returns (valid_rows, failed_rows|None, warn_rules). Lazy -- nothing
    executes until the caller writes/collects."""
    df = catalog.df(spec.source).alias(spec.source)

    # joins (equi-only, dims broadcast)
    for j in spec.joins:
        right = catalog.df(j.table).alias(j.alias)
        if j.broadcast:
            right = F.broadcast(right)
        cond = None
        for lcol, rcol in j.on:
            lref = F.col(lcol if "." in lcol else f"{spec.source}.{lcol}")
            rref = F.col(rcol if "." in rcol else f"{j.alias}.{rcol}")
            c = lref == rref
            cond = c if cond is None else (cond & c)
        df = df.join(right, cond, j.kind)

    # filter (Catalyst pushes it down past the join to the scans)
    if spec.filter is not None:
        df = df.where(compile_expr(spec.filter, df))

    # field mapping / computed columns, in declaration order
    mapped_targets: list[str] = []
    for target, src in spec.mappings:
        col = F.col(src) if isinstance(src, str) else compile_expr(src, df)
        df = df.withColumn(target, col)
        mapped_targets.append(target)

    # pruner
    if spec.copy_columns == "MAP_ONLY":
        df = df.select(*mapped_targets)

    # validations
    warn_rules = [v for v in spec.validations if v.action == "warn"]
    gate_rules = [v for v in spec.validations if v.action in ("skip", "fail")]
    failed = None
    if gate_rules:
        fail_pred = _gate_pred(spec, df)
        failed = df.where(fail_pred)
        df = df.where(~fail_pred)
    return df, failed, warn_rules


def _gate_pred(spec: PipelineSpec, df: DataFrame):
    """OR of the failure predicates of all skip/fail rules (row fails the
    gate when ANY such rule fails)."""
    fail_pred = None
    for v in spec.validations:
        if v.action not in ("skip", "fail"):
            continue
        p = ~compile_expr(v.check, df).cast("boolean").eqNullSafe(F.lit(True))
        fail_pred = p if fail_pred is None else (fail_pred | p)
    return fail_pred


def _pre_validation_frame(spec: PipelineSpec, catalog: Catalog) -> DataFrame:
    """The pipeline frame up to (but not including) the validation split."""
    no_valid = PipelineSpec(
        name=spec.name,
        source=spec.source,
        destination=spec.destination,
        filter=spec.filter,
        joins=spec.joins,
        mappings=spec.mappings,
        copy_columns=spec.copy_columns,
        validations=(),
        write_mode=spec.write_mode,
        key=spec.key,
        after=spec.after,
    )
    df, _, _ = compile_pipeline(no_valid, catalog)
    return df


def run_pipeline(
    spec: PipelineSpec,
    catalog: Catalog,
    warehouse: dict[str, LakeTable],
) -> PipelineResult:
    """Execute: write valid rows to the destination table per write_mode,
    failed rows count as DLQ. warehouse maps destination name -> LakeTable.

    Validation counting is SINGLE-PASS: all warn-rule failure counts plus
    the gate (skip/fail) failure count are computed together -- via an
    Observation riding the destination write when no fail-action rule
    exists (zero extra jobs for N rules), or via one combined aggregation
    job when a fail-action rule requires aborting BEFORE any write. The
    reference runs validators inline in its producer pass
    (crates/engine-processing/src/producer/mod.rs:36-94) -- never one scan
    per rule."""
    res = PipelineResult(spec.name)
    df = _pre_validation_frame(spec, catalog)
    warn_rules = [v for v in spec.validations if v.action == "warn"]
    gate_pred = _gate_pred(spec, df)
    has_fail_action = any(v.action == "fail" for v in spec.validations)

    # warn counts cover only rows that PASS the gate (rows a skip-action
    # rule removes never reach the destination, so they must not inflate
    # the warning counts) -- the warn predicate is AND-ed with ~gate_pred
    # inside the single shared aggregation pass
    def _warn_fail(v):
        p = ~compile_expr(v.check, df).cast("boolean").eqNullSafe(F.lit(True))
        return (p & ~gate_pred) if gate_pred is not None else p

    aggs = [
        F.sum(_warn_fail(v).cast("long")).alias(f"w_{i}")
        for i, v in enumerate(warn_rules)
    ]
    if gate_pred is not None:
        aggs.append(F.sum(gate_pred.cast("long")).alias("__gate_failed"))

    def _apply_counts(row) -> None:
        for i, v in enumerate(warn_rules):
            n = int(row[f"w_{i}"] or 0)
            if n:
                res.warnings[v.name] = n
        if gate_pred is not None:
            res.rows_failed = int(row["__gate_failed"] or 0)

    obs = None
    if aggs:
        if has_fail_action:
            # must abort before writing anything: ONE aggregation job
            # covering every rule (not one job per rule)
            _apply_counts(df.agg(*aggs).first())
            if res.rows_failed:
                raise RuntimeError(
                    f"pipeline {spec.name}: {res.rows_failed} rows failed a "
                    "fail-action validation"
                )
        else:
            from pyspark.sql import Observation

            obs = Observation(f"pipeline_{spec.name}_{time.monotonic_ns()}")
            df = df.observe(obs, *aggs)

    valid = df.where(~gate_pred) if gate_pred is not None else df
    dest = warehouse[spec.destination]
    if spec.write_mode == "insert":
        res.rows_written = dest.append(valid)
    elif spec.write_mode == "replace":
        res.rows_written = dest.overwrite(valid)
    elif spec.write_mode in ("upsert", "update"):
        stats = dest.merge(
            valid, op_col=None, mode="upsert" if spec.write_mode == "upsert" else "update"
        )
        res.rows_written = stats.rows_inserted + stats.rows_updated
    else:
        raise ValueError(f"unknown write_mode {spec.write_mode}")
    if obs is not None:
        _apply_counts(obs.get)  # fired during the write scan
    return res
