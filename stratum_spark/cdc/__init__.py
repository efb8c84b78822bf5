"""CDC layer: change-feed model, deterministic binlog generator, LWW dedup,
validation/DLQ split, the apply loop (batch epochs + streaming), lineage.

This is the engine stratum points toward but never built -- its CDC mode is
an explicit stub (crates/engine-processing/src/producer/mod.rs:233-237,
README.md:144 "CDC is planned but not implemented"). We generalize its
snapshot semantics (cursor-ordered batches, checkpoint-per-batch,
MERGE-on-PK idempotent writes) to a totally ordered change feed applied
distributively.
"""

from stratum_spark.cdc.binlog import BINLOG_DDL, SCHEMA_EVOLUTION, generate_binlog, write_binlog
from stratum_spark.cdc.dedup import lww_dedup, lww_dedup_window
from stratum_spark.cdc.applier import CdcApplier, TOKENS_DDL

__all__ = [
    "BINLOG_DDL",
    "SCHEMA_EVOLUTION",
    "generate_binlog",
    "write_binlog",
    "lww_dedup",
    "lww_dedup_window",
    "CdcApplier",
    "TOKENS_DDL",
]
