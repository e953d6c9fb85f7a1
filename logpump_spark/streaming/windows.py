"""Event-time window aggregations (SURVEY.md §2.G streaming rows).

Each builder works on BOTH batch and streaming DataFrames (Spark's window
functions are mode-agnostic), which is how the driver's batch oracle can
check them; the streaming tests add watermarks on top.

Scale: tumbling/sliding windows are hash aggregations on (window, keys) —
map-side partial agg applies, so the shuffle carries one row per
(window, key) per task.  Session windows shuffle on the partition key and
merge sessions within partitions (Spark's native session_window operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..compat import dsum


def tumbling_agg(
    df: DataFrame,
    ts_col: str = "ts",
    width: str = "1 day",
    keys: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    watermark: str | None = None,
) -> DataFrame:
    """Fixed windows: count + stable sum per (window, keys)."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    w = F.window(F.col(ts_col), width)
    return (
        df.groupBy(w.alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"), dsum(value_col).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str = "ts",
    width: str = "2 days",
    slide: str = "1 day",
    keys: tuple[str, ...] = ("event_type",),
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows: each event lands in width/slide windows."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    w = F.window(F.col(ts_col), width, slide)
    return (
        df.groupBy(w.alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            *keys,
            "n_events",
        )
    )


def session_agg(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    keys: tuple[str, ...] = ("user_id",),
    watermark: str | None = None,
) -> DataFrame:
    """Session windows: events closer than ``gap`` merge; the session ends
    at last_event + gap.  The streaming analog of the reference's 2 s
    idle-flush record assembly (internal/watcher/tail.go:64) — same
    session-gap shape, promoted from line level to event level."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    w = F.session_window(F.col(ts_col), gap)
    return (
        df.groupBy(w.alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            *keys,
            "n_events",
        )
    )
