from stratum_spark.verify.hashing import (
    canonical_hash_col,
    merkle_receipt,
    row_diff,
    verify_receipt,
)

__all__ = ["canonical_hash_col", "merkle_receipt", "row_diff", "verify_receipt"]
