"""Lake-table layer: bucketed immutable parquet + atomic snapshot log.

Plays the Iceberg role in this engine (the sandbox ships no Iceberg jars):
  * snapshot isolation + time travel (versioned metadata JSON, atomic
    rename commits, optimistic concurrency on version files)
  * MERGE INTO with copy-on-write at hash-bucket granularity --
    the distributed analog of stratum's staging-table MERGE transaction
    (crates/engine-processing/src/io/sink/postgres.rs:130-198)
  * schema evolution by field id (add / rename / type-widen are
    metadata-only; readers resolve historic data files through the
    schema history) -- the ALTER TABLE path of
    crates/connectors/src/sql/query/generator.rs:274-282
  * idempotent epoch commits keyed on (job_id, epoch_id) -- the
    exactly-once checkpoint protocol of
    crates/engine-processing/src/consumer/components/coordinator.rs:61-135

On a real cluster the same interface binds to Iceberg's Spark catalog
(MERGE INTO / ALTER TABLE SQL); see lake/table.py docstring.
"""

from stratum_spark.lake.schema import Field, TableSchema
from stratum_spark.lake.table import LakeTable, MergeStats

__all__ = ["Field", "TableSchema", "LakeTable", "MergeStats"]
