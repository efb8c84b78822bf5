"""Source-dialect type mapping: MySQL / PostgreSQL DDL types -> Spark types.

Reimplements the reference's per-dialect converters
(crates/connectors/src/drivers/mysql/types.rs, postgres types; registry
crates/engine-schema/src/type_registry.rs:11-40) onto Spark SQL types,
including the documented special rules:
  * MySQL TINYINT(1) -> boolean (Transform::IntToBool, mysql/types.rs:20-37)
  * ENUM -> string (fidelity 'equivalent', mysql/types.rs:240-248)
  * SET -> array<string> (-> PG TEXT[], mysql/types.rs:251-258)
  * BIGINT UNSIGNED -> decimal(20,0) (the reference maps to Int64 with an
    overflow warning, docs/architecture.md:219-222 -- we keep the value
    exact instead and surface the same warning)
  * unknown types -> string with a warning (Type::Unknown fallback_ddl)

Returns (spark_ddl_type, warnings).
"""

from __future__ import annotations

import re

_MYSQL_EXACT = {
    "tinyint": "tinyint",
    "smallint": "smallint",
    "mediumint": "int",
    "int": "int",
    "integer": "int",
    "bigint": "bigint",
    "float": "float",
    "double": "double",
    "real": "double",
    "date": "date",
    "datetime": "timestamp",
    "timestamp": "timestamp",
    "time": "string",
    "year": "int",
    "char": "string",
    "varchar": "string",
    "tinytext": "string",
    "text": "string",
    "mediumtext": "string",
    "longtext": "string",
    "binary": "binary",
    "varbinary": "binary",
    "tinyblob": "binary",
    "blob": "binary",
    "mediumblob": "binary",
    "longblob": "binary",
    "json": "string",
    "bit": "binary",
    "geometry": "binary",
}

_PG_EXACT = {
    "smallint": "smallint",
    "int2": "smallint",
    "integer": "int",
    "int4": "int",
    "bigint": "bigint",
    "int8": "bigint",
    "real": "float",
    "float4": "float",
    "double precision": "double",
    "float8": "double",
    "boolean": "boolean",
    "bool": "boolean",
    "date": "date",
    "timestamp": "timestamp",
    "timestamptz": "timestamp",
    "timestamp with time zone": "timestamp",
    "timestamp without time zone": "timestamp",
    "time": "string",
    "text": "string",
    "varchar": "string",
    "character varying": "string",
    "char": "string",
    "character": "string",
    "bytea": "binary",
    "uuid": "string",
    "json": "string",
    "jsonb": "string",
    "inet": "string",
    "cidr": "string",
    "macaddr": "string",
    "xml": "string",
    "money": "decimal(19,2)",
}


def _parse(ddl: str) -> tuple[str, list[int], str]:
    ddl = ddl.strip().lower()
    m = re.match(r"^([a-z0-9_ ]+?)\s*(\(([\d\s,]+)\))?\s*(unsigned)?(\[\])?$", ddl)
    if not m:
        return ddl, [], ""
    base = m.group(1).strip()
    args = [int(x) for x in m.group(3).split(",")] if m.group(3) else []
    mods = (m.group(4) or "") + (m.group(5) or "")
    return base, args, mods


def mysql_type_to_spark(ddl: str) -> tuple[str, list[str]]:
    warnings: list[str] = []
    base, args, mods = _parse(ddl)
    unsigned = "unsigned" in mods
    if base == "tinyint" and args[:1] == [1]:
        return "boolean", warnings  # TINYINT(1) -> bool
    if base.startswith("enum"):
        warnings.append("ENUM mapped to string (variants not enforced)")
        return "string", warnings
    if base.startswith("set"):
        warnings.append("SET mapped to array<string>")
        return "array<string>", warnings
    if base in ("decimal", "numeric", "dec"):
        p, s = (args + [10, 0])[:2]
        return f"decimal({p},{s})", warnings
    if unsigned:
        widened = {"tinyint": "smallint", "smallint": "int", "mediumint": "int", "int": "bigint"}
        if base in widened:
            return widened[base], warnings
        if base == "bigint":
            warnings.append("BIGINT UNSIGNED exceeds int64; mapped to decimal(20,0)")
            return "decimal(20,0)", warnings
    if base in _MYSQL_EXACT:
        return _MYSQL_EXACT[base], warnings
    warnings.append(f"unknown MySQL type '{ddl}' mapped to string")
    return "string", warnings


def pg_type_to_spark(ddl: str) -> tuple[str, list[str]]:
    warnings: list[str] = []
    base, args, mods = _parse(ddl)
    if "[]" in mods:
        inner, w = pg_type_to_spark(base)
        return f"array<{inner}>", w
    if base in ("numeric", "decimal"):
        p, s = (args + [38, 18])[:2]
        return f"decimal({p},{s})", warnings
    if base == "serial":
        return "int", warnings
    if base == "bigserial":
        return "bigint", warnings
    if base in _PG_EXACT:
        return _PG_EXACT[base], warnings
    warnings.append(f"unknown PostgreSQL type '{ddl}' mapped to string")
    return "string", warnings
