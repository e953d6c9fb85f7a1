"""Stream-stream joins (SURVEY.md §2.G: the join surface under
continuous ingestion).

Spark's stream-stream inner join buffers both sides in state; the
watermark + time-interval condition bounds that state: rows older than
the watermark minus the interval are evicted.  Without the interval
condition the state grows forever — so this builder REQUIRES one.

Use case from the tech-log domain: correlate an EXCP (error) stream with
the DBMSSQL (query) stream of the same session within a lookback window —
"which query preceded this exception".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lookback: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """left |><| right where right_ts in [left_ts - lookback, left_ts],
    equal on ``on``.  Works identically on batch and streaming inputs;
    on streams both sides get the watermark and state is evicted past
    watermark + lookback."""
    l_wm = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    r_wm = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    cond = F.lit(True)
    for k in on:
        cond = cond & (l_wm[k] == r_wm[k])
    cond = (
        cond
        & (r_wm[right_ts] <= l_wm[left_ts])
        & (r_wm[right_ts] >= l_wm[left_ts] - F.expr(f"INTERVAL {lookback}"))
    )
    joined = l_wm.join(r_wm, cond, "inner")
    # on-list semantics: keep a single copy of each join key (the left's)
    for k in on:
        joined = joined.drop(r_wm[k])
    return joined
