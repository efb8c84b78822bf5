"""stratum_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch reimplementation of the capabilities of stanstork/stratum
(declarative, crash-safe data+schema migration) recast as a distributed
CDC engine: a change feed (binlog/WAL analog) is tailed with Structured
Streaming and applied as key-partitioned MERGE upserts into lake tables
of pre-tokenized training sequences, with schema evolution, exactly-once
semantics, lineage, and verification receipts.

Layout:
  lake/       snapshot-log lake table format (MERGE, schema evolution,
              time travel, idempotent epoch commits) — the Iceberg role,
              self-contained because this sandbox ships no Iceberg jars;
              the TableFormat interface is swappable for real Iceberg.
  cdc/        binlog model + generator, LWW dedup, the apply loop
              (batch epochs + foreachBatch streaming), lineage, DLQ.
  plans/      declarative pipeline spec (stratum's Pipeline analog)
              compiled to DataFrame DAGs.
  functions/  SMQL-semantics scalar expression layer -> Column exprs.
  operators/  relational + training-data-pipeline operators
              (dedup families, ANN similarity, text analysis, multimodal).
  sources/    batch/stream readers (parquet, CSV, JDBC-shaped).
  streaming/  structured-streaming drivers and rate limiting.
  verify/     canonical row hashing + Merkle receipts.

Reference parity is cited per-module as `crates/...:line` pointers into
stanstork/stratum; the implementation is Spark-first, not a port.
"""

from stratum_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
