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
        fail_pred = None
        for v in gate_rules:
            p = ~compile_expr(v.check, df).cast("boolean").eqNullSafe(F.lit(True))
            fail_pred = p if fail_pred is None else (fail_pred | p)
        failed = df.where(fail_pred)
        df = df.where(~fail_pred)
    return df, failed, warn_rules


def run_pipeline(
    spec: PipelineSpec,
    catalog: Catalog,
    warehouse: dict[str, LakeTable],
) -> PipelineResult:
    """Execute: write valid rows to the destination table per write_mode,
    failed rows count as DLQ. warehouse maps destination name -> LakeTable."""
    res = PipelineResult(spec.name)
    valid, failed, warn_rules = compile_pipeline(spec, catalog)

    for v in warn_rules:
        n = valid.where(
            ~compile_expr(v.check, valid).cast("boolean").eqNullSafe(F.lit(True))
        ).count()
        if n:
            res.warnings[v.name] = n

    has_fail_action = any(v.action == "fail" for v in spec.validations)
    if failed is not None:
        res.rows_failed = failed.count()
        if res.rows_failed and has_fail_action:
            raise RuntimeError(
                f"pipeline {spec.name}: {res.rows_failed} rows failed a fail-action validation"
            )

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
    return res
