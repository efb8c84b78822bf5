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
STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("n_docs_seen", T.LongType()),
        T.StructField("total_tokens", T.LongType()),
    ]
)


def _update(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n_events, n_docs, total = state.get if state.exists else (0, 0, 0)
    seen_docs = n_docs  # approximate: count distinct within lifetime via state
    docs: set = set()
    for pdf in batches:
        n_events += len(pdf)
        docs.update(pdf["doc_id"].dropna())
        total += int(pdf["n_tok"].fillna(0).sum())
    n_docs = seen_docs + len(docs)
    state.update((n_events, n_docs, total))
    yield pd.DataFrame(
        {
            "source": [key[0]],
            "n_events": [n_events],
            "n_docs_seen": [n_docs],
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
