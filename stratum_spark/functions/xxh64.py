"""Pure-Python xxHash64 (XXH64), bit-identical to Spark's `xxhash64`.

Why this exists: the lake's key point-lookup prunes the manifest to the
ONE hash bucket a key can live in. The bucket function is
`pmod(xxhash64(key), n_buckets)` (the same expression every bucketed
write uses, lake/table.py::_bucket_expr). Evaluating that on the driver
through Spark would cost a one-row job per lookup; re-implementing the
public XXH64 spec (Yann Collet's xxHash, BSD-2) keeps the manifest prune
genuinely zero-job. Spark's implementation
(org.apache.spark.sql.catalyst.expressions.XXH64) is the same spec with
seed 42; `tests/test_scan_prune.py` differential-tests this module
against `F.xxhash64` on adversarial lengths (0..40 bytes, unicode) so
any divergence fails loudly instead of mispruning.

Reference-parity note: the reference engine hashes rows for its cascade
dedup with a fixed non-cryptographic hash as well (SURVEY §2.5); this
module plays that role for bucket addressing only -- data-path hashing
stays JVM-side.
"""

from __future__ import annotations

_MASK = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _MASK
    return (_rotl(acc, 31) * _P1) & _MASK


def _merge(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * _P1) + _P4) & _MASK


def xxhash64(data: bytes, seed: int = 42) -> int:
    """XXH64 of `data` as an unsigned 64-bit int. Seed defaults to 42 --
    Spark's fixed seed for the `xxhash64` SQL function."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = ((_rotl(h, 27) * _P1) + _P4) & _MASK
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _MASK
        h = ((_rotl(h, 23) * _P2) + _P3) & _MASK
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def xxhash64_signed(data: bytes, seed: int = 42) -> int:
    """XXH64 as the signed long Spark's `xxhash64` column returns."""
    h = xxhash64(data, seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def key_bucket(value, n_buckets: int) -> int:
    """The hash bucket `pmod(xxhash64(CAST(value AS STRING)), n_buckets)`
    assigns -- bit-identical to lake/table.py::_bucket_expr, evaluated
    driver-side with zero jobs. Python's % on a positive modulus is
    already non-negative for negative operands, i.e. exactly pmod.
    Spark's hash functions SKIP null inputs (the result is the seed, 42),
    so a null key buckets to 42 % n_buckets, not hash("None")."""
    if value is None:
        return 42 % n_buckets
    return xxhash64_signed(str(value).encode("utf-8")) % n_buckets
