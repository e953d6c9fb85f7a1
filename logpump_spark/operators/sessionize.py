"""Batch sessionization (gaps-and-islands) over an event stream.

The batch twin of ``streaming/windows.py``'s session windows: given
(user, ts) events, a new session starts wherever the gap to the previous
event exceeds the timeout.  Classic two-window formulation — lag to mark
session starts, running sum to number them — one hash-shuffle on the
user key, in-partition sort, no self-join, no UDF.  Gap arithmetic runs
on epoch MICROSECONDS (int64), never on interval/double types, so any
engine agrees exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Attach ``session_no`` (1-based, per user, in time order) to every
    event.  ``id_col`` breaks ordering ties deterministically."""
    us = F.unix_micros(F.col(ts_col))
    w = W.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    gap_us = gap_minutes * 60 * 1_000_000
    prev = F.lag(us).over(w)
    is_new = F.when(prev.isNull() | ((us - prev) > gap_us), 1).otherwise(0)
    return df.withColumn(
        "session_no",
        F.sum(is_new).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session rollup: bounds, event count, exact integer duration.
    Same single shuffle as ``sessionize`` — the grouped agg reuses the
    (user) partitioning the window pass already established."""
    s = sessionize(df, user_col, ts_col, id_col, gap_minutes)
    return s.groupBy(user_col, "session_no").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col))).alias(
            "duration_us"
        ),
    )
