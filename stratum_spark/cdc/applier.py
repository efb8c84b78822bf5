"""The CDC apply loop: change feed -> validate -> LWW dedup -> MERGE.

Per-epoch sequence (one micro-batch == one epoch == one atomic lake commit),
the distributed analog of stratum's per-batch consumer protocol
(crates/engine-processing/src/consumer/components/coordinator.rs:61-135):

  1. epoch guard        -- already-committed epoch -> skip (exactly-once)
  2. schema evolution   -- scripted DDL whose position falls inside the
                           epoch is applied to the table first
                           (metadata-only; stratum's 3-phase ordering,
                           crates/engine-schema/src/plan.rs:259-288)
  3. validation split   -- rows violating n_tok == size(tokens) go to the
                           DLQ table, never to the target (stratum
                           validation action 'skip' + failed-row writer,
                           crates/engine-processing/src/transform/
                           failed_row_writer.rs:16-120)
  4. schema-ver mapping -- physical binlog columns -> current table
                           columns per event schema_ver
  5. LWW dedup          -- skew-proof max_by aggregate (cdc/dedup.py)
  6. MERGE              -- bucket-pruned copy-on-write upsert with the
                           lsn precedence guard; the (job_id, epoch)
                           bookmark commits atomically with the data
  7. lineage + metrics  -- per-partition offset ranges + merge counts
                           appended to the lineage table (FIXTURES.md §4;
                           stratum Batch{cursor,next} + MetricsSnapshot,
                           crates/engine-infra/src/metrics.rs:22-31)

All steps are DataFrame expressions; the only driver-side data are the
epoch's distinct schema versions, touched-bucket ids, and aggregate counts.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stratum_spark.cdc.binlog import SCHEMA_EVOLUTION
from stratum_spark.cdc.dedup import lww_dedup
from stratum_spark.lake import LakeTable, MergeStats

TOKENS_DDL = "doc_id string, tokens array<int>, n_tok int, source string, lsn bigint"
LINEAGE_DDL = (
    "batch_id string, epoch bigint, partition_id int, lsn_min bigint, lsn_max bigint, "
    "rows_in bigint, rows_deduped bigint, rows_inserted bigint, rows_updated bigint, "
    "rows_deleted bigint, rows_dlq bigint, wall_ms bigint, committed_at timestamp"
)
DLQ_DDL = "lsn bigint, doc_id string, rule string, message string, payload string, failed_at timestamp"


@dataclass(frozen=True)
class EpochStats:
    epoch: int
    skipped: bool
    rows_in: int = 0
    rows_dlq: int = 0
    rows_deduped: int = 0
    merge: MergeStats | None = None
    wall_ms: int = 0


class CdcApplier:
    """Owns the target/lineage/DLQ tables and applies change-feed epochs."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        job_id: str = "cdc",
        n_buckets: int = 16,
        evolution: list[dict] | None = None,
        n_events_hint: int | None = None,
        validate: bool = True,
        lineage_detail: bool = True,
    ):
        self.lineage_detail = lineage_detail
        self.spark = spark
        self.warehouse = os.path.abspath(warehouse)
        self.job_id = job_id
        self.validate = validate
        # scripted DDL positions (absolute lsn) -- in production these would
        # arrive as schema-change events in the feed itself
        self.evolution: list[dict] = []
        if evolution is not None:
            self.evolution = evolution
        elif n_events_hint:
            self.evolution = [
                {
                    "lsn": int(s["at_frac"] * n_events_hint),
                    "ver": s["ver"],
                    "action": s["action"],
                    "args": s["args"],
                }
                for s in SCHEMA_EVOLUTION
            ]

        tok_root = os.path.join(self.warehouse, "tokens")
        lin_root = os.path.join(self.warehouse, "lineage")
        dlq_root = os.path.join(self.warehouse, "dlq")
        if LakeTable.exists(tok_root):
            self.tokens = LakeTable.load(spark, tok_root)
        else:
            self.tokens = LakeTable.create(
                spark, tok_root, TOKENS_DDL, key="doc_id", n_buckets=n_buckets,
                properties={"schema_ver": "0"},
            )
        self.lineage = (
            LakeTable.load(spark, lin_root)
            if LakeTable.exists(lin_root)
            else LakeTable.create(spark, lin_root, LINEAGE_DDL, n_buckets=1)
        )
        self.dlq = (
            LakeTable.load(spark, dlq_root)
            if LakeTable.exists(dlq_root)
            else LakeTable.create(spark, dlq_root, DLQ_DDL, n_buckets=1)
        )

    # ------------------------------------------------------------------
    def _table_schema_ver(self) -> int:
        return int(self.tokens.snapshot().properties.get("schema_ver", "0"))

    def _evolve_to(self, target_ver: int) -> None:
        cur = self._table_schema_ver()
        for step in sorted(self.evolution, key=lambda s: s["ver"]):
            if cur < step["ver"] <= target_ver:
                getattr(self.tokens, step["action"])(*step["args"])
                self.tokens.set_properties({"schema_ver": str(step["ver"])})
                cur = step["ver"]

    def _source_col_name(self) -> str:
        """Current name of the original 'source' column (rename-aware)."""
        names = set(self.tokens.snapshot().schema.names)
        return "corpus" if "corpus" in names else "source"

    # ------------------------------------------------------------------
    def apply_epoch(self, events: DataFrame, epoch: int) -> EpochStats:
        """One epoch end-to-end. Fast path (schema evolution settled) runs
        exactly TWO serial Spark jobs: (1) dedup + touched-bucket discovery,
        which also materializes the cached slice and fires the attached
        Observation carrying batch stats, and (2) the MERGE write. The DLQ
        write and per-partition lineage stats run as concurrent jobs over
        the cached slice. While scripted DDL is still pending, a pre-scan
        decides evolution before column mapping (the reference applies
        schema ops strictly before data, crates/engine-schema/src/plan.rs:259-288).
        """
        from concurrent.futures import ThreadPoolExecutor

        from pyspark.sql import Observation

        t0 = time.time()
        if epoch <= self.tokens.committed_epoch(self.job_id):
            return EpochStats(epoch=epoch, skipped=True)

        bad_pred = (F.col("op") != "D") & ~F.col("n_tok").eqNullSafe(F.size("tokens"))
        events = events.persist()
        pool = ThreadPoolExecutor(max_workers=2)
        try:
            pending_evo = bool(self.evolution) and self._table_schema_ver() < max(
                s["ver"] for s in self.evolution
            )

            def parts_job():
                return (
                    events.groupBy(F.spark_partition_id().alias("partition_id"))
                    .agg(
                        F.min("lsn").alias("lsn_min"),
                        F.max("lsn").alias("lsn_max"),
                        F.count("*").alias("rows_in"),
                        F.max("schema_ver").alias("v"),
                        F.sum(bad_pred.cast("long")).alias("n_bad"),
                    )
                    .collect()
                )

            parts = None
            parts_future = None
            obs = None
            if pending_evo:
                parts = parts_job()  # serial: gates evolution before mapping
                if not parts:
                    return EpochStats(epoch=epoch, skipped=True)
                self._evolve_to(max(int(p["v"]) for p in parts if p["v"] is not None))
                rows_in = sum(int(p["rows_in"]) for p in parts)
                lsn_max = max(int(p["lsn_max"]) for p in parts)
                n_bad = sum(int(p["n_bad"] or 0) for p in parts)
                ev = events
            else:
                if self.lineage_detail:
                    parts_future = pool.submit(parts_job)
                obs = Observation(f"epoch_{epoch}")
                ev = events.observe(
                    obs,
                    F.count(F.lit(1)).alias("n"),
                    F.max("lsn").alias("lsn_max"),
                    F.sum(bad_pred.cast("long")).alias("n_bad"),
                )

            # DLQ write overlaps everything; append skips empty batches
            dlq_future = None
            if self.validate:
                dlq_rows = events.where(bad_pred).select(
                    F.col("lsn"),
                    F.col("doc_id"),
                    F.lit("n_tok_mismatch").alias("rule"),
                    F.format_string(
                        "n_tok=%s != size(tokens)=%s", F.col("n_tok"), F.size("tokens")
                    ).alias("message"),
                    F.to_json(F.struct("lsn", "op", "doc_id", "n_tok", "schema_ver")).alias(
                        "payload"
                    ),
                    F.current_timestamp().alias("failed_at"),
                )
                dlq_future = pool.submit(self.dlq.append, dlq_rows)

            good = ev.where(~bad_pred) if self.validate else ev

            # schema_ver -> current-columns mapping
            src_name = self._source_col_name()
            cols = [
                F.col("doc_id"),
                F.col("op"),
                F.col("lsn"),
                F.col("tokens"),
                F.col("n_tok"),
                F.col("source").alias(src_name),
            ]
            if self._table_schema_ver() >= 1:
                cols.append(F.when(F.col("schema_ver") >= 1, F.col("lang")).alias("lang"))
            mapped = good.select(*cols)

            # job 1: dedup + touched discovery (fires the observation)
            deduped = lww_dedup(mapped, key="doc_id", order_col="lsn").persist()
            try:
                bexpr = self.tokens._bucket_expr("doc_id")
                touched = [
                    r[0] for r in deduped.select(bexpr.alias("b")).distinct().collect()
                ]
                if obs is not None:
                    stats_row = obs.get
                    rows_in = int(stats_row["n"] or 0)
                    lsn_max = int(stats_row["lsn_max"] or 0)
                    n_bad = int(stats_row["n_bad"] or 0)
                if rows_in == 0:
                    return EpochStats(epoch=epoch, skipped=True)

                # job 2: MERGE
                mstats = self.tokens.merge(
                    deduped,
                    op_col="op",
                    job_id=self.job_id,
                    epoch=epoch,
                    lsn_max=lsn_max,
                    precedence_col="lsn",
                    touched=touched,
                )
            finally:
                deduped.unpersist()

            n_dlq = dlq_future.result() if dlq_future is not None else 0
            if parts_future is not None:
                parts = parts_future.result()

            # lineage rows appended driver-side (no Spark job)
            wall_ms = int((time.time() - t0) * 1000)
            batch_id = f"{self.job_id}-{epoch:08d}"
            from datetime import datetime, timezone

            now = datetime.now(timezone.utc).replace(tzinfo=None)
            lineage_rows: list[dict] = []
            if self.lineage_detail and parts:
                for p in parts:
                    lineage_rows.append(
                        {
                            "batch_id": batch_id,
                            "epoch": epoch,
                            "partition_id": int(p["partition_id"]),
                            "lsn_min": int(p["lsn_min"]),
                            "lsn_max": int(p["lsn_max"]),
                            "rows_in": int(p["rows_in"]),
                            "committed_at": now,
                        }
                    )
            n_applied = mstats.rows_inserted + mstats.rows_updated + mstats.rows_deleted
            lineage_rows.append(
                {
                    "batch_id": batch_id,
                    "epoch": epoch,
                    "partition_id": -1,
                    "lsn_min": None,
                    "lsn_max": lsn_max,
                    "rows_in": rows_in,
                    "rows_deduped": n_applied,
                    "rows_inserted": mstats.rows_inserted,
                    "rows_updated": mstats.rows_updated,
                    "rows_deleted": mstats.rows_deleted,
                    "rows_dlq": n_dlq,
                    "wall_ms": wall_ms,
                    "committed_at": now,
                }
            )
            self.lineage.append_local(lineage_rows)

            return EpochStats(
                epoch=epoch,
                skipped=False,
                rows_in=rows_in,
                rows_dlq=n_dlq,
                rows_deduped=n_applied,
                merge=mstats,
                wall_ms=wall_ms,
            )
        finally:
            pool.shutdown(wait=True)
            events.unpersist()

    # ------------------------------------------------------------------
    def run_backfill(
        self,
        binlog_path: str,
        epoch_size: int = 10_000,
        stop_after: int | None = None,
        max_lsn: int | None = None,
    ) -> list[EpochStats]:
        """Batch-mode apply: the feed is consumed as consecutive lsn-range
        epochs (keyset pagination generalized -- stratum Cursor::Numeric,
        crates/model/src/pagination/cursor.rs:43-47). Resumes after the last
        committed epoch; `stop_after` epochs simulates a crash/pause for
        kill-and-resume tests (crates/engine-tests/src/resume.rs:50-127)."""
        feed = self.spark.read.parquet(binlog_path)
        if max_lsn is None:
            max_lsn = feed.agg(F.max("lsn")).collect()[0][0] or 0
        out: list[EpochStats] = []
        start_epoch = self.tokens.committed_epoch(self.job_id) + 1
        n_epochs = (max_lsn + epoch_size - 1) // epoch_size
        done = 0
        for ep in range(start_epoch, n_epochs):
            lo, hi = ep * epoch_size + 1, (ep + 1) * epoch_size
            sl = feed.where((F.col("lsn") >= lo) & (F.col("lsn") <= hi))
            out.append(self.apply_epoch(sl, ep))
            done += 1
            if stop_after is not None and done >= stop_after:
                break
        return out

    # ------------------------------------------------------------------
    def state(self) -> DataFrame:
        """Current user-facing table state (system lsn column dropped)."""
        return self.tokens.read().drop("lsn")

    def receipt(self, n_buckets: int = 64):
        """Merkle receipt over the user-facing state (stratum `apply
        --integrity`, crates/engine-processing/src/producer/components/
        integrity.rs); persists alongside the table metadata."""
        import json as _json

        from stratum_spark.verify import merkle_receipt

        r = merkle_receipt(self.state(), key="doc_id", n_buckets=n_buckets)
        path = os.path.join(self.warehouse, "tokens", "_meta", "receipt.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            _json.dump(r.to_json(), fh)
        os.replace(tmp, path)
        return r

    def verify(self):
        """Re-read the destination and compare against the stored receipt
        (stratum `verify`, crates/engine-verify/src/verifier.rs:40-53)."""
        import json as _json

        from stratum_spark.verify import Receipt, verify_receipt

        path = os.path.join(self.warehouse, "tokens", "_meta", "receipt.json")
        with open(path) as fh:
            r = Receipt.from_json(_json.load(fh))
        return verify_receipt(self.state(), "doc_id", r)

    def epoch_state(self) -> dict:
        return {
            "epoch": self.tokens.committed_epoch(self.job_id),
            "lsn": self.tokens.committed_lsn(self.job_id),
            "schema_ver": self._table_schema_ver(),
        }
