"""Parser for the reference's config-file text format (.smql).

Parses the document shape the reference's pest grammar defines
(crates/smql-syntax/src/grammar/smql_v2.1.pest; builder
crates/smql-syntax/src/builder.rs) -- the block structure visible in its
examples/configs/*.smql -- into PipelineSpec objects this engine runs:

    define { name = env("VAR") ... }
    connection "src" { driver = "mysql" url = define.name }
    pipeline "p" {
        after = ["other"]
        from { connection = connection.src  table = "t" }
        to   { connection = connection.dst  table = "u" }
        with { alias from other_table where alias.col == t.col  ... }
        where "name" { <expr> }
        select { target = <expr> ... }
        validate { assert|warn "rule" { check = <expr>
                                        message = "..." action = skip } }
        on_error { failed_rows { action = "save_to_table"
                                 table { connection = c  table = "dlq" } } }
        settings { copy_columns = "MAP_ONLY" batch_size = 1000 ... }
    }

Expressions (select values, where bodies, validate checks, join conditions)
are the expression language of functions/parser.py, embedded via
parse_expr_at. Connections are metadata here: table names resolve through
the engine's Catalog, and `define` values (including env() lookups) resolve
at parse time like the reference's plan build
(crates/engine-core/src/plan/builder.rs env resolution).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from stratum_spark.functions.expr import Bin, Call, DotPath, Expr, Lit
from stratum_spark.functions.parser import ParseError, parse_expr_at, tokenize
from stratum_spark.functions.scalars import resolve_env
from stratum_spark.plans.pipeline import JoinSpec, PipelineSpec, ValidationRule


@dataclass
class SmqlDocument:
    defines: dict[str, object] = field(default_factory=dict)
    execution: dict = field(default_factory=dict)
    paginate: dict[str, dict] = field(default_factory=dict)  # pipeline -> strategy
    connections: dict[str, dict] = field(default_factory=dict)
    pipelines: list[PipelineSpec] = field(default_factory=list)
    settings: dict[str, dict] = field(default_factory=dict)  # pipeline -> settings
    dlq_tables: dict[str, str] = field(default_factory=dict)  # pipeline -> table
    hooks: dict[str, dict] = field(default_factory=dict)  # pipeline -> {before/after: [sql]}


class _Walk:
    def __init__(self, text: str):
        self.toks = tokenize(text)
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def at(self, kind, val=None):
        k, v = self.peek()
        return k == kind and (val is None or v == val)

    def expect(self, kind, val=None):
        k, v = self.next()
        if k != kind or (val is not None and v != val):
            raise ParseError(f"expected {val or kind}, got {v!r}")
        return v

    def string(self) -> str:
        v = self.expect("string")
        return v[1:-1]

    def expr(self) -> Expr:
        e, self.i = parse_expr_at(self.toks, self.i)
        return e


def _const(doc: SmqlDocument, e: Expr):
    """Evaluate a config-value expression to a python constant: literals,
    env() calls, define.x references."""
    if isinstance(e, Lit):
        return e.value
    if isinstance(e, Call) and e.name.lower() == "env":
        args = [_const(doc, a) for a in e.args]
        return resolve_env(*args)
    if isinstance(e, DotPath) and e.qualifier == "define":
        return doc.defines[e.name]
    if isinstance(e, DotPath):  # connection.src etc. -- symbolic reference
        return f"{e.qualifier}.{e.name}"
    from stratum_spark.functions.expr import Arr

    if isinstance(e, Arr):
        return [_const(doc, i) for i in e.items]
    raise ParseError(f"not a constant config value: {e!r}")


def parse_smql(text: str) -> SmqlDocument:
    doc = SmqlDocument()
    w = _Walk(text)
    while not w.at("eof"):
        word = w.expect("word")
        if word == "define":
            w.expect("op", "{")
            while not w.at("op", "}"):
                name = w.expect("word")
                w.expect("op", "=")
                doc.defines[name] = _const(doc, w.expr())
            w.next()
        elif word == "connection":
            name = w.string()
            w.expect("op", "{")
            props = {}
            while not w.at("op", "}"):
                key = w.expect("word")
                w.expect("op", "=")
                props[key] = _const(doc, w.expr())
            w.next()
            doc.connections[name] = props
        elif word == "pipeline":
            _parse_pipeline(doc, w)
        elif word == "execution":
            # execution { strategy = "parallel" max_concurrency = 4 ... }
            # -> DAG runner knobs (plans/dag.py max_parallel)
            doc.execution = _parse_block_props(doc, w)
        else:
            raise ParseError(f"unexpected top-level block: {word}")
    return doc


def _parse_block_props(doc: SmqlDocument, w: _Walk) -> dict:
    w.expect("op", "{")
    props = {}
    while not w.at("op", "}"):
        key = w.expect("word")
        w.expect("op", "=")
        props[key] = _const(doc, w.expr())
    w.next()
    return props


def _parse_pipeline(doc: SmqlDocument, w: _Walk) -> None:
    name = w.string()
    w.expect("op", "{")
    source = destination = None
    joins: list[JoinSpec] = []
    mappings: list[tuple[str, Expr]] = []
    validations: list[ValidationRule] = []
    filters: list[Expr] = []
    after: list[str] = []
    settings: dict = {}

    while not w.at("op", "}"):
        block = w.expect("word")
        if block in ("before", "after") and w.at("op", "{"):
            # lifecycle hook block: before/after { sql = ["...", ...] }
            # (reference hooks, crates/engine-runtime orchestrator pre/post)
            props = _parse_block_props(doc, w)
            doc.hooks.setdefault(name, {})[block] = props.get("sql", [])
        elif block == "after":
            w.expect("op", "=")
            w.expect("op", "[")
            while not w.at("op", "]"):
                # both spellings appear in the reference's examples:
                # after = ["name"] and after = [pipeline.name]
                if w.at("string"):
                    after.append(w.string())
                else:
                    ref = w.expect("word")
                    after.append(ref.split(".", 1)[1] if ref.startswith("pipeline.") else ref)
                if w.at("op", ","):
                    w.next()
            w.next()
        elif block in ("from", "to"):
            props = _parse_block_props(doc, w)
            if block == "from":
                source = props["table"]
            else:
                destination = props["table"]
        elif block == "with":
            w.expect("op", "{")
            while not w.at("op", "}"):
                alias = w.expect("word")
                w.expect("word")  # 'from'
                table = w.expect("word")
                kw = w.expect("word")
                if kw != "where":
                    raise ParseError(f"expected 'where' in with-join, got {kw}")
                cond = w.expr()
                joins.append(_join_from_cond(alias, table, cond))
            w.next()
        elif block == "where":
            if w.at("string"):
                w.string()  # optional rule name, informational
            w.expect("op", "{")
            # a where block may hold several newline-separated conditions,
            # implicitly ANDed (reference examples/plan-generation.smql:161-164)
            while not w.at("op", "}"):
                filters.append(w.expr())
            w.next()
        elif block == "select":
            w.expect("op", "{")
            while not w.at("op", "}"):
                target = w.expect("word")
                w.expect("op", "=")
                mappings.append((target, w.expr()))
            w.next()
        elif block == "validate":
            w.expect("op", "{")
            while not w.at("op", "}"):
                kind = w.expect("word")  # assert | warn
                rname = w.string()
                props = {}
                w.expect("op", "{")
                while not w.at("op", "}"):
                    key = w.expect("word")
                    w.expect("op", "=")
                    if key == "check":
                        props["check"] = w.expr()
                    else:
                        props[key] = _const(doc, w.expr()) if not w.at("word") else w.expect("word")
                w.next()
                action = str(props.get("action", "warn" if kind == "warn" else "fail"))
                validations.append(ValidationRule(rname, props["check"], action))
            w.next()
        elif block == "on_error":
            w.expect("op", "{")
            while not w.at("op", "}"):
                sub = w.expect("word")  # failed_rows
                w.expect("op", "{")
                while not w.at("op", "}"):
                    key = w.expect("word")
                    if w.at("op", "="):
                        w.next()
                        _const(doc, w.expr())
                    elif w.at("op", "{"):
                        props = _parse_block_props(doc, w)
                        if sub == "failed_rows" and key == "table":
                            doc.dlq_tables[name] = props.get("table", "")
                    else:
                        raise ParseError(f"bad on_error entry {key}")
                w.next()
            w.next()
        elif block == "settings":
            settings = _parse_block_props(doc, w)
        elif block == "paginate":
            # deterministic keyset-pagination strategy (offsets.rs); batch
            # epochs / ordered reads use it as the cursor spec
            doc.paginate[name] = _parse_block_props(doc, w)
        else:
            raise ParseError(f"unknown pipeline block: {block}")
    w.next()

    if source is None or destination is None:
        raise ParseError(f"pipeline {name}: from/to required")
    filters = [_substitute_defines(doc, f) for f in filters]
    mappings = [(t, _substitute_defines(doc, e)) for t, e in mappings]
    validations = [
        ValidationRule(v.name, _substitute_defines(doc, v.check), v.action) for v in validations
    ]
    filt = None
    for f in filters:
        filt = f if filt is None else Bin("and", filt, f)
    doc.settings[name] = settings
    doc.pipelines.append(
        PipelineSpec(
            name=name,
            source=source,
            destination=destination,
            filter=filt,
            joins=tuple(joins),
            mappings=tuple(mappings),
            copy_columns=str(settings.get("copy_columns", "ALL")),
            validations=tuple(validations),
            write_mode=str(settings.get("write_mode", "insert")),
            key=settings.get("key"),
            after=tuple(after),
        )
    )


def run_document(
    doc: SmqlDocument,
    catalog,
    warehouse: dict,
    max_parallel: int = 4,
) -> dict:
    """Execute a parsed .smql document end-to-end: register every catalog
    source as a session temp view (so lifecycle-hook SQL can reference the
    same names the pipelines read), then run the pipeline DAG with the
    document's before/after hooks wired in. Mirrors the reference's
    orchestrated run: hooks -> data migration -> hooks
    (crates/engine-runtime/src/execution/orchestrator.rs:76-93)."""
    from stratum_spark.plans.dag import run_dag

    for name in catalog.entries:
        catalog.df(name).createOrReplaceTempView(name)
    exec_conf = doc.execution or {}
    return run_dag(
        doc.pipelines,
        catalog,
        warehouse,
        max_parallel=int(exec_conf.get("max_concurrency", max_parallel)),
        hooks=doc.hooks,
    )


def _substitute_defines(doc: SmqlDocument, e: Expr) -> Expr:
    """Replace define.x references inside expressions with their constant
    values (the reference substitutes defines at plan build,
    crates/engine-core/src/plan/builder.rs)."""
    from dataclasses import fields as dc_fields

    from stratum_spark.functions.expr import Arr, Bin, Call, IsNotNull, IsNull, Un, When

    if isinstance(e, DotPath) and e.qualifier == "define":
        return Lit(doc.defines[e.name])
    if isinstance(e, Bin):
        return Bin(e.op, _substitute_defines(doc, e.left), _substitute_defines(doc, e.right))
    if isinstance(e, Un):
        return Un(e.op, _substitute_defines(doc, e.operand))
    if isinstance(e, Call):
        return Call(e.name, tuple(_substitute_defines(doc, a) for a in e.args))
    if isinstance(e, Arr):
        return Arr(tuple(_substitute_defines(doc, a) for a in e.items))
    if isinstance(e, When):
        return When(
            tuple((_substitute_defines(doc, c), _substitute_defines(doc, v)) for c, v in e.branches),
            _substitute_defines(doc, e.default) if e.default is not None else None,
        )
    if isinstance(e, IsNull):
        return IsNull(_substitute_defines(doc, e.operand))
    if isinstance(e, IsNotNull):
        return IsNotNull(_substitute_defines(doc, e.operand))
    return e


def _join_from_cond(alias: str, table: str, cond: Expr) -> JoinSpec:
    """The reference's join conditions are equi-only
    (crates/connectors/src/sql/join/clause.rs:26-34): extract the pair,
    orienting the new alias's column to the right side."""
    pairs = []

    def walk(e: Expr):
        if isinstance(e, Bin) and e.op == "and":
            walk(e.left)
            walk(e.right)
        elif isinstance(e, Bin) and e.op == "==":
            l, r = e.left, e.right
            if not (isinstance(l, DotPath) and isinstance(r, DotPath)):
                raise ParseError(f"with-join condition must be column == column: {e}")
            if l.qualifier == alias:
                pairs.append((f"{r.qualifier}.{r.name}", f"{l.qualifier}.{l.name}"))
            else:
                pairs.append((f"{l.qualifier}.{l.name}", f"{r.qualifier}.{r.name}"))
        else:
            raise ParseError(f"unsupported join condition: {e}")

    walk(cond)
    return JoinSpec(alias=alias, table=table, on=tuple(pairs), kind="inner")
