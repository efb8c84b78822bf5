"""Sessionization over event streams.

Batch form: gap-based sessions as pure window expressions (lag + cumulative
sum of gap-breaks) -- fully SQL-expressible, oracle-checkable, no state.
At scale this is one shuffle on the session key with whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    id_col: str = "event_id",
) -> DataFrame:
    """Assign session ids: a new session starts when the gap from the
    previous event of the same key exceeds gap_minutes. Returns per-session
    aggregates (key, session_no, n_events, start/end as strings, dur_s)."""
    w = Window.partitionBy(key).orderBy(ts_col, id_col)
    # NTZ-safe epoch seconds (TIMESTAMP_NTZ cannot cast to double directly)
    ts_s = F.unix_micros(F.col(ts_col).cast("timestamp")).cast("double") / 1e6
    gap_break = ts_s - F.lag(ts_s).over(w) > gap_minutes * 60.0
    with_sess = events.withColumn(
        "session_no",
        F.sum(F.when(gap_break, 1).otherwise(0)).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        with_sess.groupBy(key, "session_no")
        .agg(
            F.count("*").alias("n_events"),
            F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            (
                F.max(F.unix_micros(F.col(ts_col).cast("timestamp")))
                - F.min(F.unix_micros(F.col(ts_col).cast("timestamp")))
            ).alias("dur_us"),
        )
    )
