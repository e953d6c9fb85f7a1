"""Service entry point — the cmd/app/main.go analog.

    python -m logpump_spark --config config.yaml [--sink DIR] [--drain]

Loads the reference-compatible YAML (config.py), builds the streaming
ingestion query over every LogDirectoryMap root, and runs until
interrupted (SIGINT/SIGTERM stop the query gracefully — R3; Spark flushes
the in-flight micro-batch and commits the checkpoint).  ``--drain``
processes everything currently on disk and exits (availableNow), the
batch-mode counterpart.

The OS-service wrapper verbs (install/start/stop, kardianos/service in
main.go:106-133) are out of scope: cluster managers own process
lifecycle in the Spark world.
"""

from __future__ import annotations

import argparse
import signal

from .config import load_config
from .session import get_spark
from .streaming.job import build_techlog_stream


def main() -> int:
    ap = argparse.ArgumentParser(prog="logpump_spark")
    ap.add_argument("--config", required=True, help="reference-style config.yaml")
    ap.add_argument("--sink", default="tech_log_out", help="parquet sink root")
    ap.add_argument("--drain", action="store_true", help="process available files, then exit")
    args = ap.parse_args()

    cfg = load_config(args.config)
    spark = get_spark("logpump")
    writer = build_techlog_stream(
        spark,
        list(cfg.log_directory_map.values()),
        sink_dir=args.sink,
        checkpoint_dir=cfg.checkpoint_dir,
        table_map=cfg.clickhouse.table_map,
        default_table=cfg.clickhouse.default_table,
        glob=cfg.file_pattern,
        trigger_seconds=cfg.batch_interval,
        available_now=args.drain,
    )
    query = writer.start()

    def _stop(_sig, _frm):  # R3 graceful drain
        query.stop()

    signal.signal(signal.SIGINT, _stop)
    signal.signal(signal.SIGTERM, _stop)
    query.awaitTermination()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
