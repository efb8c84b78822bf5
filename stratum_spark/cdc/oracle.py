"""Reference replay oracle: the sequential, single-process ground truth.

Plays the role of stratum's source-vs-destination verification (row counts +
Merkle receipts, crates/engine-verify/src/verifier.rs): a trivially-correct
pure-Python replay of the change feed in strict lsn order, against which the
distributed applier's final table state must match per-row (token-array
equality per BASELINE.json:input_hint). Only for test scale -- O(n) driver
memory by design.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass, field

import pyarrow.parquet as pq


@dataclass
class ReplayState:
    rows: dict[str, dict] = field(default_factory=dict)  # doc_id -> row
    dlq_lsns: list[int] = field(default_factory=list)
    schema_ver: int = 0


def replay_binlog(
    binlog_path: str,
    evolution_lsns: dict[int, int] | None = None,
    validate: bool = True,
    max_lsn: int | None = None,
) -> ReplayState:
    """Apply events one at a time in lsn order; duplicates (same lsn) apply
    once. Invalid I/U rows (n_tok != len(tokens)) are skipped to the DLQ.
    evolution_lsns: {ver: at_lsn} (informational; the physical feed already
    carries schema_ver per event)."""
    paths = (
        sorted(glob.glob(os.path.join(binlog_path, "*.parquet")))
        if os.path.isdir(binlog_path)
        else [binlog_path]
    )
    tbl = pq.read_table(paths)
    df = tbl.to_pandas()
    df = df.sort_values("lsn").drop_duplicates(subset=["lsn"], keep="first")
    if max_lsn is not None:
        df = df[df["lsn"] <= max_lsn]

    st = ReplayState()
    for row in df.itertuples(index=False):
        st.schema_ver = max(st.schema_ver, int(row.schema_ver))
        if row.op == "D":
            st.rows.pop(row.doc_id, None)
            continue
        toks = list(row.tokens) if row.tokens is not None else None
        if validate and (toks is None or int(row.n_tok) != len(toks)):
            st.dlq_lsns.append(int(row.lsn))
            continue
        st.rows[row.doc_id] = {
            "doc_id": row.doc_id,
            "tokens": [int(t) for t in toks],
            "n_tok": int(row.n_tok),
            "source": row.source,
            "lang": row.lang if int(row.schema_ver) >= 1 else None,
            "lsn": int(row.lsn),
        }
    return st


def state_as_records(st: ReplayState, table_schema_ver: int) -> dict[str, dict]:
    """Project replay state onto the evolved table's user-facing columns:
    ver>=1 adds lang, ver>=2 renames source->corpus (n_tok widen at ver>=3
    doesn't change values)."""
    out: dict[str, dict] = {}
    for doc_id, r in st.rows.items():
        rec = {"doc_id": doc_id, "tokens": r["tokens"], "n_tok": r["n_tok"]}
        src_name = "corpus" if table_schema_ver >= 2 else "source"
        rec[src_name] = r["source"]
        if table_schema_ver >= 1:
            rec["lang"] = r["lang"]
        out[doc_id] = rec
    return out
