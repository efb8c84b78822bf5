from stratum_spark.verify.hashing import (
    Receipt,
    canonical_hash_col,
    merkle_receipt,
    row_diff,
    verify_receipt,
)

__all__ = ["Receipt", "canonical_hash_col", "merkle_receipt", "row_diff", "verify_receipt"]
