"""Packed token columns: array<int> <-> binary, zero-copy via Arrow.

An `array<int>` column pays per-element costs everywhere it moves --
parquet encodes repetition/definition levels per element and decodes into
per-element array cells; Tungsten's UnsafeArrayData carries an 8 B header
plus null bits per row; row serialization walks elements. A packed
`binary` column (4 B little-endian int32 per token) is ONE buffer per row:
parquet byte_array encode/decode is a length + memcpy, and the row copy is
a single blob move. For token-sequence ingest -- where the token payload
is ~80% of every row but no epoch-path operator looks INSIDE it -- packing
at ingest and unpacking only at the user-facing read cuts the bytes-walked
cost of the LWW/write hot path (round-4 verdict, next-round item 1; the
reference moves token payloads as opaque byte buffers for the same reason,
its row format being language-native structs).

The conversion itself is nearly free: Arrow's `list<int32>` and `binary`
layouts are BOTH (validity bitmap, int32 offsets, values buffer) -- the
same memory up to offsets x4. `mapInArrow` hands us the columns as Arrow
buffers, so packing is: reuse the validity buffer, multiply the offsets by
4 (one tiny vectorized numpy op), reuse the child values buffer AS the
binary data buffer. No per-row Python, no per-element work -- the north
star's "vectorized pandas/Arrow UDFs (no per-row Python)" contract.

Cost note: the mapInArrow pass itself is not free -- the JVM converts
UnsafeRows -> Arrow batches and back around it. Whether pack-at-ingest
wins end-to-end is feed-dependent; bench.py A/Bs it (BENCH_R5 packed
exhibit) and CdcApplier gates it behind tokens_packed/STRATUM_TOKENS_PACKED.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame


def _normalized(col: pa.Array) -> pa.Array:
    """Arrays sliced out of a larger batch carry a logical offset; the
    buffer-reinterpretation below needs offset 0 (the validity bitmap is
    bit-packed and cannot be re-based without a copy). Spark's mapInArrow
    batches are freshly built (offset 0); pay the copy only on the rare
    sliced input."""
    if col.offset != 0:
        col = pa.concat_arrays([col])
    return col


def pack_array(col: pa.Array) -> pa.Array:
    """list<int32> -> binary by buffer reinterpretation (offsets x4)."""
    col = _normalized(col)
    if not (pa.types.is_list(col.type) and pa.types.is_int32(col.type.value_type)):
        raise TypeError(f"pack_array expects list<int32>, got {col.type}")
    offs = np.frombuffer(col.buffers()[1], dtype=np.int32, count=len(col) + 1)
    child = col.values
    # compute in int64 first: a values buffer past 512 MiB would silently
    # wrap int32 byte offsets and corrupt the packed column (unreachable at
    # Spark's default Arrow batch sizes, but guarded rather than assumed)
    byte_offs64 = (offs.astype(np.int64) + child.offset) * 4
    if byte_offs64[-1] > np.iinfo(np.int32).max:
        raise ValueError(
            f"token values buffer too large to pack ({int(byte_offs64[-1])} B "
            "of byte offsets exceeds int32) -- reduce the Arrow batch size"
        )
    byte_offs = byte_offs64.astype(np.int32)
    # a batch whose rows are all null/empty has no child values buffer
    data = child.buffers()[1] or pa.py_buffer(b"")
    return pa.Array.from_buffers(
        pa.binary(),
        len(col),
        [col.buffers()[0], pa.py_buffer(byte_offs.tobytes()), data],
        null_count=col.null_count,
    )


def unpack_array(col: pa.Array) -> pa.Array:
    """binary -> list<int32>, the exact inverse (offsets / 4)."""
    col = _normalized(col)
    if not pa.types.is_binary(col.type):
        raise TypeError(f"unpack_array expects binary, got {col.type}")
    boffs = np.frombuffer(col.buffers()[1], dtype=np.int32, count=len(col) + 1)
    # validate EVERY value boundary, not just the ends: interior misaligned
    # boundaries (e.g. lengths 2+2, ends still aligned) would otherwise pass
    # and silently yield corrupted token arrays after offsets//4. The numpy
    # check is vectorized -- one pass over the (tiny) offsets buffer.
    if np.any(boffs % 4):
        raise ValueError("binary column is not 4-byte token-packed")
    offs = (boffs // 4).astype(np.int32)
    data = col.buffers()[2]
    n_child = (len(data) // 4) if data is not None else 0
    child = pa.Array.from_buffers(pa.int32(), n_child, [None, data])
    return pa.Array.from_buffers(
        pa.list_(pa.int32()),
        len(col),
        [col.buffers()[0], pa.py_buffer(offs.tobytes())],
        null_count=col.null_count,
        children=[child],
    )


def _convert_df(df: DataFrame, col: str, fn, out_type: str) -> DataFrame:
    from pyspark.sql.types import StructField, _parse_datatype_string

    idx = df.columns.index(col)
    fields = list(df.schema.fields)
    fields[idx] = StructField(col, _parse_datatype_string(out_type), True)
    out_schema = type(df.schema)(fields)

    def mapper(batches):
        for b in batches:
            arrays = b.columns
            arrays[idx] = fn(arrays[idx])
            yield pa.RecordBatch.from_arrays(arrays, schema=pa.schema(
                [
                    f.with_type(arrays[i].type) if i == idx else f
                    for i, f in enumerate(b.schema)
                ]
            ))

    return df.mapInArrow(mapper, out_schema)


def pack_tokens(df: DataFrame, col: str = "tokens") -> DataFrame:
    """array<int> column -> 4 B/int packed binary; other columns pass
    through untouched. One Arrow round trip, zero per-element work."""
    return _convert_df(df, col, pack_array, "binary")


def unpack_tokens(df: DataFrame, col: str = "tokens") -> DataFrame:
    """Inverse of pack_tokens -- used at the user-facing read boundary
    (state()); internal files stay packed."""
    return _convert_df(df, col, unpack_array, "array<int>")
