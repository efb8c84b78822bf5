"""DLQ file targets: failed rows to JSONL or CSV files.

The reference's failed-row writer supports an error TABLE or a FILE
destination (JSONL/CSV) -- crates/engine-processing/src/transform/
failed_row_writer.rs:16-120, model FailedRowsDestination
crates/model/src/execution/pipeline.rs:162-180. The lake DLQ table is the
default; this module adds the file form for parity and for pipelines whose
consumers want plain files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def write_dlq_file(bad_rows: DataFrame, path: str, fmt: str = "jsonl") -> int:
    """Append failed rows under `path` as JSONL or CSV (one subdir per
    call, immutable files). Returns rows written."""
    os.makedirs(path, exist_ok=True)
    import uuid

    out = os.path.join(path, uuid.uuid4().hex[:12])
    n = bad_rows.count()
    if n == 0:
        return 0
    if fmt == "jsonl":
        bad_rows.write.mode("error").json(out)
    elif fmt == "csv":
        bad_rows.write.mode("error").option("header", "true").csv(out)
    else:
        raise ValueError(f"unknown DLQ file format: {fmt}")
    return n
