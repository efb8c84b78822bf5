from stratum_spark.functions.expr import (
    Arr,
    Bin,
    Call,
    DotPath,
    Ident,
    IsNotNull,
    IsNull,
    Lit,
    Un,
    When,
    compile_expr,
)
from stratum_spark.functions.parser import ParseError, parse_expr
from stratum_spark.functions.scalars import FUNCTIONS

__all__ = [
    "Lit",
    "DotPath",
    "parse_expr",
    "ParseError",
    "Ident",
    "Bin",
    "Un",
    "Call",
    "Arr",
    "When",
    "IsNull",
    "IsNotNull",
    "compile_expr",
    "FUNCTIONS",
]
