"""Field-id based table schema with evolution (add / rename / widen).

The reference introspects source schemas into a canonical Type enum
(crates/model/src/core/types.rs:4-104) and evolves destinations with
ALTER TABLE ADD COLUMN (crates/connectors/src/sql/query/generator.rs:274-282).
Here columns carry stable integer field ids (the Iceberg idea): a rename
keeps the id, an add allocates a new id, a widen changes the type on the
same id. Data files written under an old schema are resolved to the
current schema by id, so all three evolutions are metadata-only.

Types are Spark SQL DDL strings ("string", "int", "array<int>", ...),
parsed on demand -- the canonical-Type <-> Spark mapping of SURVEY.md §1.3.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from pyspark.sql import types as T

# legal widenings (stratum's TypeRegistry fidelity 'Compatible' promotions,
# crates/engine-schema/src/type_registry.rs:151-198, restricted to lossless)
_WIDEN_OK: dict[str, set[str]] = {
    "tinyint": {"smallint", "int", "bigint", "float", "double", "decimal"},
    "smallint": {"int", "bigint", "float", "double", "decimal"},
    "int": {"bigint", "double", "decimal"},
    "bigint": {"decimal"},
    "float": {"double"},
    "date": {"timestamp"},
    "array<int>": {"array<bigint>"},
    "array<float>": {"array<double>"},
}


def parse_type(ddl: str) -> T.DataType:
    return T.StructType.fromDDL(f"x {ddl}")[0].dataType


@dataclass(frozen=True)
class Field:
    id: int
    name: str
    type: str  # Spark DDL type string
    nullable: bool = True

    @property
    def spark_type(self) -> T.DataType:
        return parse_type(self.type)

    def to_json(self) -> dict:
        return {"id": self.id, "name": self.name, "type": self.type, "nullable": self.nullable}

    @staticmethod
    def from_json(d: dict) -> "Field":
        return Field(d["id"], d["name"], d["type"], d.get("nullable", True))


@dataclass(frozen=True)
class TableSchema:
    schema_id: int
    fields: tuple[Field, ...] = field(default_factory=tuple)
    # highest field id EVER assigned (never decreases -- Iceberg's
    # last-column-id): without it, dropping the highest-id column and
    # re-adding a column would REUSE the dropped id, and the id-based
    # read resolver would resurrect the dropped column's old values
    last_field_id: int = 0

    # -- construction ----------------------------------------------------
    @staticmethod
    def from_ddl(ddl: str, schema_id: int = 0) -> "TableSchema":
        """e.g. TableSchema.from_ddl("doc_id string, tokens array<int>")."""
        st = T.StructType.fromDDL(ddl)
        return TableSchema(
            schema_id,
            tuple(
                Field(i + 1, f.name, f.dataType.simpleString(), f.nullable)
                for i, f in enumerate(st)
            ),
            last_field_id=len(st),
        )

    # -- views -----------------------------------------------------------
    @property
    def names(self) -> list[str]:
        return [f.name for f in self.fields]

    def field_by_name(self, name: str) -> Field:
        for f in self.fields:
            if f.name.lower() == name.lower():  # case-insensitive like Record.get()
                return f
        raise KeyError(name)

    def field_by_id(self, fid: int) -> Field | None:
        for f in self.fields:
            if f.id == fid:
                return f
        return None

    @property
    def max_field_id(self) -> int:
        return max((f.id for f in self.fields), default=0)

    def spark_schema(self) -> T.StructType:
        return T.StructType(
            [T.StructField(f.name, f.spark_type, f.nullable) for f in self.fields]
        )

    def ddl(self) -> str:
        return ", ".join(f"{f.name} {f.type}" for f in self.fields)

    @property
    def _last_id(self) -> int:
        # legacy schemas (no persisted counter) fall back to max live id
        return max(self.last_field_id, self.max_field_id)

    # -- evolution (each returns a NEW schema with schema_id+1) ----------
    def add_column(self, name: str, type_ddl: str) -> "TableSchema":
        if any(f.name.lower() == name.lower() for f in self.fields):
            raise ValueError(f"column exists: {name}")
        parse_type(type_ddl)  # validate
        nf = Field(self._last_id + 1, name, type_ddl, True)
        return TableSchema(self.schema_id + 1, self.fields + (nf,), last_field_id=nf.id)

    def rename_column(self, old: str, new: str) -> "TableSchema":
        f = self.field_by_name(old)
        if any(g.name.lower() == new.lower() for g in self.fields):
            raise ValueError(f"column exists: {new}")
        fields = tuple(replace(g, name=new) if g.id == f.id else g for g in self.fields)
        return TableSchema(self.schema_id + 1, fields, last_field_id=self._last_id)

    def widen_type(self, name: str, new_type: str) -> "TableSchema":
        f = self.field_by_name(name)
        cur, new = f.type.strip().lower(), new_type.strip().lower()
        allowed = _WIDEN_OK.get(cur.split("(")[0], set())
        if new != cur and new.split("(")[0] not in {a.split("(")[0] for a in allowed} and new not in allowed:
            raise ValueError(f"illegal widen {f.type} -> {new_type} on {name}")
        parse_type(new_type)
        fields = tuple(replace(g, type=new_type) if g.id == f.id else g for g in self.fields)
        return TableSchema(self.schema_id + 1, fields, last_field_id=self._last_id)

    def drop_column(self, name: str) -> "TableSchema":
        f = self.field_by_name(name)
        return TableSchema(
            self.schema_id + 1,
            tuple(g for g in self.fields if g.id != f.id),
            last_field_id=self._last_id,
        )

    # -- serialization ---------------------------------------------------
    def to_json(self) -> dict:
        return {
            "schema_id": self.schema_id,
            "fields": [f.to_json() for f in self.fields],
            "last_field_id": self._last_id,
        }

    @staticmethod
    def from_json(d: dict) -> "TableSchema":
        return TableSchema(
            d["schema_id"],
            tuple(Field.from_json(f) for f in d["fields"]),
            last_field_id=d.get("last_field_id", 0),
        )
