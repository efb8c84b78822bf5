"""Iceberg binding: the same sink contract on a real Iceberg catalog.

This sandbox ships no Iceberg runtime jars, so the engine's lake layer is
the self-contained snapshot-log format in lake/table.py. On a cluster with
`iceberg-spark-runtime` on the classpath and a catalog configured, this
module provides the equivalent operations through Iceberg SQL -- the MERGE
statement here is exactly the shape documented in LakeTable.merge and
SURVEY.md §7.3. Import/availability is checked at construction; everything
raises IcebergUnavailable cleanly in this sandbox (covered by tests).

UNTESTED AGAINST A LIVE ICEBERG CATALOG in this environment -- the SQL is
standard Iceberg DDL/DML kept in one reviewable place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class IcebergUnavailable(RuntimeError):
    pass


def iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.catalog.Catalog")
        return True
    except Exception:
        return False


class IcebergTable:
    """Minimal LakeTable-compatible surface over an Iceberg catalog table."""

    def __init__(self, spark: SparkSession, identifier: str, key: str | None = None):
        if not iceberg_available(spark):
            raise IcebergUnavailable(
                "no Iceberg runtime on the classpath; use stratum_spark.lake.LakeTable"
            )
        self.spark = spark
        self.identifier = identifier
        self.key = key

    @staticmethod
    def create(
        spark: SparkSession,
        identifier: str,
        schema_ddl: str,
        key: str | None = None,
        n_buckets: int = 64,
    ) -> "IcebergTable":
        t = IcebergTable(spark, identifier, key)
        part = f" PARTITIONED BY (bucket({n_buckets}, {key}))" if key else ""
        spark.sql(f"CREATE TABLE {identifier} ({schema_ddl}) USING iceberg{part}")
        return t

    def read(self) -> DataFrame:
        return self.spark.table(self.identifier)

    def append(self, df: DataFrame) -> None:
        df.writeTo(self.identifier).append()

    def overwrite(self, df: DataFrame) -> None:
        df.writeTo(self.identifier).overwritePartitions()

    def merge(self, batch: DataFrame, op_col: str = "op") -> None:
        """The engine's MERGE contract on Iceberg SQL (batch pre-deduped to
        one row per key, op in I/U/D)."""
        view = f"__stratum_batch_{abs(hash(self.identifier)) % 10_000_000}"
        batch.createOrReplaceTempView(view)
        self.spark.sql(
            f"""
            MERGE INTO {self.identifier} t USING {view} s
            ON t.{self.key} = s.{self.key}
            WHEN MATCHED AND s.{op_col} = 'D' THEN DELETE
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED AND s.{op_col} <> 'D' THEN INSERT *
            """
        )

    def add_column(self, name: str, type_ddl: str) -> None:
        self.spark.sql(f"ALTER TABLE {self.identifier} ADD COLUMN {name} {type_ddl}")

    def rename_column(self, old: str, new: str) -> None:
        self.spark.sql(f"ALTER TABLE {self.identifier} RENAME COLUMN {old} TO {new}")

    def widen_type(self, name: str, new_type: str) -> None:
        self.spark.sql(f"ALTER TABLE {self.identifier} ALTER COLUMN {name} TYPE {new_type}")

    def expire_snapshots(self, older_than: str) -> None:
        self.spark.sql(
            f"CALL system.expire_snapshots(table => '{self.identifier}', "
            f"older_than => TIMESTAMP '{older_than}')"
        )
