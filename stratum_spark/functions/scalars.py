"""Scalar function registry -- the reference's SMQL function surface.

Implements BOTH the runtime-registered set (env/lower/upper/concat,
crates/expression-engine/src/functions/mod.rs:27-30) and the
documented-but-unimplemented set (trim/coalesce/date/year/month/quarter/now,
docs/smql-reference.md:635-646, which fail row-eval in the reference --
eval/runtime.rs:150-171) plus the documented-only `matches` regex operator
(docs/smql-reference.md:271) -- i.e. the full documented language.

Semantics notes vs the reference:
  * concat stringifies args and maps NULL -> "" (functions/string.rs:38-59).
  * lower/upper error on non-string in the reference; we cast (Spark-native).
  * env() resolves driver-side at compile time (the reference resolves at
    plan build too -- crates/engine-core/src/plan/builder.rs env resolution).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def _concat(*args: Column) -> Column:
    # stringify-and-join with NULL -> "" (reference functions/string.rs:38-59)
    return F.concat(*[F.coalesce(a.cast("string"), F.lit("")) for a in args])


def _env(name: Column, *default: Column) -> Column:
    # driver-side env lookup (reference crates/expression-engine/src/functions/env.rs)
    raise RuntimeError("env() is resolved by compile_expr, not at runtime")


FUNCTIONS: dict[str, Callable[..., Column]] = {
    # runtime-registered in the reference
    "lower": lambda s: F.lower(s.cast("string")),
    "upper": lambda s: F.upper(s.cast("string")),
    "concat": _concat,
    # documented set we complete (SURVEY.md §2.3 'documented-only functions')
    "trim": lambda s: F.trim(s.cast("string")),
    "coalesce": lambda *a: F.coalesce(*a),
    "date": lambda s: F.to_date(s),
    "year": lambda s: F.year(s),
    "month": lambda s: F.month(s),
    "quarter": lambda s: F.quarter(s),
    "now": lambda: F.current_timestamp(),
    # documented-only regex operator, exposed as a function
    "matches": lambda s, pat: s.cast("string").rlike(pat),
    # general helpers available to pipelines
    "length": lambda s: F.length(s.cast("string")),
    "abs": lambda x: F.abs(x),
    "round": lambda x, *n: F.round(x, n[0] if n else 0),
}


def resolve_env(name: str, default: str | None = None) -> str:
    v = os.environ.get(name)
    if v is None:
        if default is None:
            raise KeyError(f"env var not set: {name}")
        return default
    return v
