"""Expression IR + compiler to Spark Columns with the reference's semantics.

IR mirrors CompiledExpression (crates/model/src/execution/expr.rs:6-31):
Literal | Identifier | DotPath | Binary | Unary | FunctionCall | Array |
When{branches,else} | IsNull | IsNotNull. BinaryOp set (:35-52):
Add Sub Mul Div Mod Eq Ne Gt Lt Ge Le And Or.

Verified reference semantics we reproduce (SURVEY.md §2.3):
  * NULL equality is NULL-SAFE, not SQL ternary: NULL == NULL -> TRUE,
    NULL == x -> FALSE, `!=` is its negation
    (crates/expression-engine/src/eval/binary.rs:225-239) -> eqNullSafe.
  * integer `/` TRUNCATES (eval/binary.rs:88-96) -> `DIV` when both sides
    infer integral, ordinary `/` otherwise.
  * string `+` concatenates; comparisons are lexicographic
    (eval/binary.rs:196-210).
  * `when` chains are first-match-wins top to bottom; no-else-no-match
    yields NULL here (the reference fails the row -- eval/runtime.rs:109-123;
    divergence documented, validations can be used to reproduce row-fail).
  * Unary Not/Negate work correctly here (the reference stubs them to a
    pass-through TODO, eval/runtime.rs:101-105 -- we do not copy the bug).
  * env(name[, default]) resolves at compile time on the driver.

Documented-only float-eq epsilon (eval/binary.rs:147-148): plain IEEE
equality by default (documented divergence), with the reference's
epsilon comparison available as an opt-in via STRATUM_FLOAT_EQ_EPSILON
(see _eq).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stratum_spark.functions.scalars import FUNCTIONS, resolve_env

# ---------------------------------------------------------------------------
# IR
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Expr:
    pass


@dataclass(frozen=True)
class Lit(Expr):
    value: object


@dataclass(frozen=True)
class Ident(Expr):
    name: str


@dataclass(frozen=True)
class DotPath(Expr):
    qualifier: str
    name: str


@dataclass(frozen=True)
class Bin(Expr):
    op: str  # + - * / % == != > < >= <= and or
    left: Expr
    right: Expr


@dataclass(frozen=True)
class Un(Expr):
    op: str  # not | -
    operand: Expr


@dataclass(frozen=True)
class Call(Expr):
    name: str
    args: tuple[Expr, ...] = ()


@dataclass(frozen=True)
class Arr(Expr):
    items: tuple[Expr, ...] = ()


@dataclass(frozen=True)
class When(Expr):
    branches: tuple[tuple[Expr, Expr], ...]
    default: Expr | None = None


@dataclass(frozen=True)
class IsNull(Expr):
    operand: Expr


@dataclass(frozen=True)
class IsNotNull(Expr):
    operand: Expr


# ---------------------------------------------------------------------------
# type inference (just enough to pick integer-div and string-+)
# ---------------------------------------------------------------------------

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _infer(e: Expr, schema: T.StructType | None) -> T.DataType | None:
    if isinstance(e, Lit):
        if isinstance(e.value, bool):
            return T.BooleanType()
        if isinstance(e.value, int):
            return T.LongType()
        if isinstance(e.value, float):
            return T.DoubleType()
        if isinstance(e.value, str):
            return T.StringType()
        return None
    if isinstance(e, (Ident, DotPath)) and schema is not None:
        name = e.name if isinstance(e, Ident) else e.name
        for f in schema.fields:
            if f.name.lower() == name.lower():
                return f.dataType
        return None
    if isinstance(e, Bin) and e.op in {"+", "-", "*", "/", "%"}:
        lt, rt = _infer(e.left, schema), _infer(e.right, schema)
        if isinstance(lt, T.StringType) or isinstance(rt, T.StringType):
            return T.StringType()
        if e.op == "/" and isinstance(lt, _INTEGRAL) and isinstance(rt, _INTEGRAL):
            return T.LongType()
        if isinstance(lt, (T.DoubleType, T.FloatType)) or isinstance(rt, (T.DoubleType, T.FloatType)):
            return T.DoubleType()
        return lt or rt
    if isinstance(e, When):
        for _, v in e.branches:
            t = _infer(v, schema)
            if t is not None:
                return t
        return _infer(e.default, schema) if e.default else None
    if isinstance(e, Un):
        return T.BooleanType() if e.op == "not" else _infer(e.operand, schema)
    if isinstance(e, Bin):
        return T.BooleanType()
    return None


# ---------------------------------------------------------------------------
# compiler
# ---------------------------------------------------------------------------


def compile_expr(e: Expr, df: DataFrame | None = None) -> Column:
    """Compile IR to a Column. Passing the target DataFrame enables type
    inference (integer-division truncation, string '+')."""
    schema = df.schema if df is not None else None
    return _compile(e, schema)


def _compile(e: Expr, schema: T.StructType | None) -> Column:
    if isinstance(e, Lit):
        return F.lit(e.value)
    if isinstance(e, Ident):
        return F.col(e.name)
    if isinstance(e, DotPath):
        return F.col(f"{e.qualifier}.{e.name}")
    if isinstance(e, IsNull):
        return _compile(e.operand, schema).isNull()
    if isinstance(e, IsNotNull):
        return _compile(e.operand, schema).isNotNull()
    if isinstance(e, Arr):
        return F.array(*[_compile(i, schema) for i in e.items])
    if isinstance(e, Un):
        if e.op == "not":
            return ~_compile(e.operand, schema)
        if e.op == "-":
            return -_compile(e.operand, schema)
        raise ValueError(f"unknown unary op: {e.op}")
    if isinstance(e, When):
        out: Column | None = None
        for cond, val in e.branches:
            c, v = _compile(cond, schema), _compile(val, schema)
            out = F.when(c, v) if out is None else out.when(c, v)
        if out is None:
            raise ValueError("when{} needs at least one branch")
        return out.otherwise(_compile(e.default, schema)) if e.default is not None else out
    if isinstance(e, Call):
        name = e.name.lower()
        if name == "env":
            args = [a.value if isinstance(a, Lit) else None for a in e.args]
            if not args or args[0] is None:
                raise ValueError("env() needs a literal name")
            return F.lit(resolve_env(*[a for a in args if a is not None]))
        fn = FUNCTIONS.get(name)
        if fn is None:
            raise ValueError(f"unknown function: {e.name}")
        return fn(*[_compile(a, schema) for a in e.args])
    if isinstance(e, Bin):
        l, r = _compile(e.left, schema), _compile(e.right, schema)
        lt, rt = _infer(e.left, schema), _infer(e.right, schema)
        op = e.op.lower()
        if op == "+":
            if isinstance(lt, T.StringType) or isinstance(rt, T.StringType):
                return F.concat(l.cast("string"), r.cast("string"))
            return l + r
        if op == "-":
            return l - r
        if op == "*":
            return l * r
        if op == "/":
            if isinstance(lt, _INTEGRAL) and isinstance(rt, _INTEGRAL):
                return _int_div(l, r)
            return l / r
        if op == "%":
            return l % r
        if op in ("==", "!="):
            eq = _eq(l, r, lt, rt)
            return eq if op == "==" else ~eq
        if op == ">":
            return l > r
        if op == "<":
            return l < r
        if op == ">=":
            return l >= r
        if op == "<=":
            return l <= r
        if op == "and":
            return l & r
        if op == "or":
            return l | r
        if op == "matches":
            return F.regexp_like(l.cast("string"), r)
        raise ValueError(f"unknown binary op: {e.op}")
    raise TypeError(f"not an Expr: {e!r}")


_FRACTIONAL = (T.DoubleType, T.FloatType)


def _eq(l: Column, r: Column, lt, rt) -> Column:
    """NULL-safe equality (NULL == NULL -> TRUE). With
    STRATUM_FLOAT_EQ_EPSILON set and a floating-point operand, equality
    becomes |a - b| < eps -- the reference's documented float comparison
    (eval/binary.rs:147-148: (a - b).abs() < EPSILON). Off by default:
    plain IEEE equality is this engine's documented baseline, and the
    epsilon mode is the opt-in parity switch. The epsilon form keeps the
    null-safe contract (NULL==NULL true, NULL==x false) and never yields
    NULL, so `!=` stays its exact negation."""
    import os

    eps = os.environ.get("STRATUM_FLOAT_EQ_EPSILON")
    if eps and (isinstance(lt, _FRACTIONAL) or isinstance(rt, _FRACTIONAL)):
        near = F.abs(l.cast("double") - r.cast("double")) < F.lit(float(eps))
        return (
            F.when(l.isNull() & r.isNull(), F.lit(True))
            .when(l.isNull() | r.isNull(), F.lit(False))
            .otherwise(near)
        )
    return l.eqNullSafe(r)


def _int_div(l: Column, r: Column) -> Column:
    # truncating integer division toward zero (reference eval/binary.rs:88-96,
    # Rust i64 semantics). (l - l % r) is exactly divisible and Spark's `%`
    # carries the dividend's sign, so the quotient is the truncated value;
    # the decimal cast keeps 64-bit exactness through the division.
    return ((l - (l % r)).cast("decimal(38,0)") / r).cast("long")
