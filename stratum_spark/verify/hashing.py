"""Cryptographic verification: canonical row hashes + Merkle receipts.

Reimplements the reference's integrity pipeline (canonical value encoding
crates/model/src/integrity/canonical.rs:29-249, Merkle tree merkle.rs,
verifier crates/engine-verify/src/verifier.rs) Spark-first:

  * canonical row hash = sha256 over a canonical string encoding of the
    row's columns SORTED BY NAME, null-marked, unit-separated -- computed
    JVM-side (sha2 + concat_ws), never per-row Python.
  * receipts are per-bucket ORDER-INDEPENDENT roots (the reference's
    cascade-table sorted-hash mode, verifier.rs:173-201 -- the right mode
    for a distributed table where partition order is arbitrary), computed
    as a COMMUTATIVE digest: each row hash is expanded into 4 independent
    64-bit lanes; a bucket root is sha256 over (per-lane XOR, per-lane
    32-bit-masked SUM, row count). XOR+SUM+COUNT are commutative and
    associative, so the aggregation state per bucket is 9 longs --
    O(1) regardless of bucket size -- where a sort/concat digest would
    hold every row hash in one aggregation buffer (billions x 32 B per
    bucket at 100 TB). The masked sums stay within int64 for < 2^31 rows
    per bucket and break the XOR self-cancellation of duplicate rows.
  * verification re-reads the destination, recomputes, compares roots
    per bucket; `row_diff` drills down to per-key divergences
    (verifier.rs:302-358) via a full-outer join on hashes.

At 100 TB: hashing is one codegen'd projection over the scan; the
receipt aggregate is a partial-agg (map-side combine) shuffle of 9-long
states into n_buckets groups; bucket roots are tiny. Verify cost is one
full-table read, the same asymptotics the reference documents
(docs/verification.md:542).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NULL = "\x00NULL\x00"
_SEP = "\x1f"


def canonical_hash_col(df: DataFrame, cols: list[str] | None = None) -> Column:
    """sha256 hex of the canonical encoding of the given columns (default:
    all, sorted by name). Arrays/structs are canonicalized via their
    to_json / cast-to-string form."""
    names = sorted(cols if cols is not None else df.columns)
    parts: list[Column] = []
    for n in names:
        dt = df.schema[n].dataType.simpleString()
        c = F.col(n)
        if dt.startswith(("array", "struct", "map")):
            s = F.to_json(c)
        elif dt == "binary":
            # binary -> hex, not a UTF-8 cast (raw bytes are not valid
            # strings; hex is deterministic and engine-portable)
            s = F.hex(c)
        elif dt in ("float", "double"):
            # fixed-point canonical form so the same value hashes equally
            # across engines/precisions
            s = F.format_string("%.6f", c.cast("double"))
        else:
            s = c.cast("string")
        parts.append(F.coalesce(s, F.lit(_NULL)))
    return F.sha2(F.concat_ws(_SEP, *parts), 256)


@dataclass(frozen=True)
class Receipt:
    n_rows: int
    n_buckets: int
    bucket_roots: dict[int, str]
    root: str

    def to_json(self) -> dict:
        return {
            "n_rows": self.n_rows,
            "n_buckets": self.n_buckets,
            "bucket_roots": {str(k): v for k, v in self.bucket_roots.items()},
            "root": self.root,
        }

    @staticmethod
    def from_json(d: dict) -> "Receipt":
        return Receipt(
            d["n_rows"], d["n_buckets"], {int(k): v for k, v in d["bucket_roots"].items()}, d["root"]
        )


_N_LANES = 4
_MASK32 = (1 << 32) - 1


def commutative_digest_aggs(h: Column) -> list[Column]:
    """The commutative per-group digest state over a row-hash column:
    per-lane XOR + per-lane 32-bit-masked SUM + COUNT (9 aggregates).
    Each is a partial aggregate (map-side combine) with O(1) state --
    never an unbounded buffer like collect_list."""
    lanes = [F.xxhash64(h, F.lit(i)) for i in range(_N_LANES)]
    aggs: list[Column] = []
    for i, ln in enumerate(lanes):
        aggs.append(F.bit_xor(ln).alias(f"x{i}"))
    for i, ln in enumerate(lanes):
        aggs.append(F.sum(ln.bitwiseAND(F.lit(_MASK32))).alias(f"s{i}"))
    aggs.append(F.count(F.lit(1)).alias("n"))
    return aggs


def digest_row_to_root(row) -> str:
    """Fold one digest-state row (x0..x3, s0..s3, n) into a hex root."""
    import hashlib

    # empty groups yield NULL xor/sum aggregates -> canonical zero state
    parts = [str(int(row[f"x{i}"] or 0)) for i in range(_N_LANES)]
    parts += [str(int(row[f"s{i}"] or 0)) for i in range(_N_LANES)]
    parts.append(str(int(row["n"] or 0)))
    return hashlib.sha256("|".join(parts).encode()).hexdigest()


def merkle_receipt(
    df: DataFrame, key: str, n_buckets: int = 64, cols: list[str] | None = None
) -> Receipt:
    """Order-independent Merkle receipt over the DataFrame."""
    import hashlib

    h = canonical_hash_col(df, cols)
    bucket = F.pmod(F.xxhash64(F.col(key).cast("string")), F.lit(n_buckets)).cast("int")
    per_bucket = (
        df.select(bucket.alias("__b"), h.alias("__h"))
        .groupBy("__b")
        .agg(*commutative_digest_aggs(F.col("__h")))
        .collect()
    )
    roots = {int(r["__b"]): digest_row_to_root(r) for r in per_bucket}
    n_rows = int(sum(r["n"] for r in per_bucket))
    acc = hashlib.sha256()
    for b in sorted(roots):
        acc.update(f"{b}:{roots[b]}".encode())
    return Receipt(n_rows=n_rows, n_buckets=n_buckets, bucket_roots=roots, root=acc.hexdigest())


def verify_receipt(
    df: DataFrame, key: str, receipt: Receipt, cols: list[str] | None = None
) -> dict:
    """Recompute and compare. Returns {'match': bool, 'bad_buckets': [...],
    'row_count_delta': int} -- tamper (modified/inserted/deleted rows)
    surfaces as bucket-root mismatches + count deltas."""
    cur = merkle_receipt(df, key, receipt.n_buckets, cols)
    bad = sorted(
        set(cur.bucket_roots) ^ set(receipt.bucket_roots)
        | {b for b in set(cur.bucket_roots) & set(receipt.bucket_roots)
           if cur.bucket_roots[b] != receipt.bucket_roots[b]}
    )
    return {
        "match": cur.root == receipt.root and cur.n_rows == receipt.n_rows,
        "bad_buckets": bad,
        "row_count_delta": cur.n_rows - receipt.n_rows,
    }


def row_diff(
    expected: DataFrame, actual: DataFrame, key: str, cols: list[str] | None = None
) -> DataFrame:
    """Per-key divergence drill-down (verifier.rs:302-358): rows whose
    canonical hash differs, with a status column
    missing|unexpected|modified."""
    e = expected.select(F.col(key).alias("k"), canonical_hash_col(expected, cols).alias("eh"))
    a = actual.select(F.col(key).alias("k"), canonical_hash_col(actual, cols).alias("ah"))
    j = e.join(a, "k", "full_outer")
    return (
        j.where(~F.col("eh").eqNullSafe(F.col("ah")))
        .select(
            F.col("k").alias(key),
            F.when(F.col("ah").isNull(), F.lit("missing"))
            .when(F.col("eh").isNull(), F.lit("unexpected"))
            .otherwise(F.lit("modified"))
            .alias("status"),
        )
    )
