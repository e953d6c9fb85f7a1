"""Structured Streaming surface (SURVEY.md §2.A S1-S5, §2.D, §2.E).

The reference's watcher/tailer/batcher/sink thread graph collapses into
one ``readStream -> parse plan -> writeStream.foreachBatch`` query:

- file discovery each micro-batch replaces inotify + periodic rescan
  (S4/S5); the seen-files log + checkpointLocation replace the offset
  store (T1-T5) with stronger per-micro-batch commit semantics
- trigger(processingTime) replaces the count-or-time batcher (R2); the
  exact '100 rows' flush is intentionally NOT emulated — micro-batches
  are the idiomatic admission unit (SURVEY.md §7.2)
- delivery: the reference is at-most-once across its sink (failed batches
  dropped, batch.go:43-49); this engine gets at-least-once from
  checkpoint replay and effectively-once with the idempotent parquet sink
  (overwrite-by-partition) — a documented, strictly stronger divergence
"""

from .job import build_techlog_stream, route_and_write, table_routing_column
from .windows import session_agg, sliding_agg, tumbling_agg

__all__ = [
    "build_techlog_stream",
    "route_and_write",
    "table_routing_column",
    "tumbling_agg",
    "sliding_agg",
    "session_agg",
]
