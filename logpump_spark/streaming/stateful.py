"""Custom stateful streaming operators (SURVEY.md §2.G stateful ops).

Two surfaces:
- ``dedup_stream``: dropDuplicatesWithinWatermark — exactly-once record
  identity across micro-batches with bounded state (the fix for the
  reference's Redis offset store re-ingesting files, SURVEY.md §2.E T3)
- ``running_counts_stream``: applyInPandasWithState — the escape hatch
  for operators Spark lacks natively.  Keyed state lives in the state
  store, arrives as Arrow batches, and times out on watermark — this is
  the shape a true streaming tail-assembler (S7 session-gap at line
  level) would take if sub-hour-file latency were ever required.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)


def dedup_stream(df: DataFrame, keys: list[str], ts_col: str, watermark: str) -> DataFrame:
    """Streaming dedup on ``keys`` with state bounded by the watermark:
    duplicates arriving within the watermark window are dropped; state
    older than it is evicted."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


RUNNING_SCHEMA = "user_id long, n_events long, total_value double"
_STATE_SCHEMA = "n long, total double"


def _update_counts(key, pdfs: Iterator, state: GroupState) -> Iterator:
    import pandas as pd

    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_counts_stream(df: DataFrame) -> DataFrame:
    """Per-user running (count, sum) maintained in keyed state across
    micro-batches.  Output mode: update."""
    return (
        df.groupBy("user_id")
        .applyInPandasWithState(
            _update_counts,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


class _RunningTotals(StatefulProcessor):
    """transformWithState processor: per-key running (count, sum) in a
    typed ValueState cell.  Functionally the twin of ``_update_counts``
    above, on the Spark 4 arbitrary-state API (typed state cells, RocksDB
    changelog-checkpointed provider) instead of the legacy GroupState."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._agg = handle.getValueState("agg", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        n, total = self._agg.get() if self._agg.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._agg.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    def close(self) -> None:
        pass


def running_counts_tws(df: DataFrame) -> DataFrame:
    """``running_counts_stream`` on the transformWithState API.

    Needs the RocksDB state-store provider
    (``spark.sql.streaming.stateStore.providerClass``) — set per-query by
    the caller/test, not mutated here (session confs stay caller-owned).
    """
    return df.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_RunningTotals(),
        outputStructType=RUNNING_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
