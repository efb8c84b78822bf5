from stratum_spark.functions.expr import (
    Arr,
    Bin,
    Call,
    Ident,
    IsNotNull,
    IsNull,
    Lit,
    Un,
    When,
    compile_expr,
)
from stratum_spark.functions.scalars import FUNCTIONS

__all__ = [
    "Lit",
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
