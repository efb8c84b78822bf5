"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no stateful streaming (SURVEY.md §2.7); this is the
engine's extension point for operators Spark's built-ins can't express:
arbitrary per-key state updated Arrow-batch-at-a-time (never per-row
Python). Demonstrated with a running per-key document counter/byte total
over the change feed -- the shape a custom dedup cache, rate tracker, or
session store would take.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_docs_seen", T.LongType()),
        T.StructField("total_tokens", T.LongType()),
    ]
)
# bounded per-key state: counters + a KMV (k-minimum-values) sketch of
# doc_id hashes. A raw count would double-count docs re-seen in later
# micro-batches; a doc SET would grow without bound. KMV keeps the _KMV_K
# smallest hashes: EXACT distinct while distinct <= _KMV_K, an unbiased
# (K-1)/kth-min estimate beyond, O(K) state forever.
_KMV_K = 256
STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_tokens", T.LongType()),
        T.StructField("kmv", T.ArrayType(T.LongType())),
    ]
)


def _doc_hashes(s: pd.Series) -> "pd.Series":
    # vectorized, deterministic 64-bit hashing (no per-row python);
    # >>1 keeps values in the positive int64 range for the state column
    import numpy as np

    h = pd.util.hash_pandas_object(s.astype(str), index=False).to_numpy(dtype="uint64")
    return (h >> np.uint64(1)).astype("int64")


def _kmv_count(kmv: list[int]) -> int:
    if len(kmv) < _KMV_K:
        return len(kmv)
    return int((_KMV_K - 1) * (1 << 63) / kmv[-1])


def _update(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n_events, total, kmv = state.get if state.exists else (0, 0, [])
    seen = set(kmv or [])
    for pdf in batches:
        n_events += len(pdf)
        docs = pdf["doc_id"].dropna()
        if len(docs):
            seen.update(int(x) for x in _doc_hashes(docs))
        total += int(pdf["n_tok"].fillna(0).sum())
    kmv = sorted(seen)[:_KMV_K]
    state.update((n_events, total, kmv))
    yield pd.DataFrame(
        {
            "source": [key[0]],
            "n_events": [n_events],
            "n_docs_seen": [_kmv_count(kmv)],
            "total_tokens": [total],
        }
    )


def running_source_stats(feed: DataFrame) -> DataFrame:
    """Streaming DataFrame in (binlog schema), per-source running totals out
    (update mode). State: (n_events, n_docs_seen, total_tokens) per source."""
    return (
        feed.groupBy("source")
        .applyInPandasWithState(
            _update,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
