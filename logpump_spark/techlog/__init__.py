"""1C technology-log processing as a batch/streaming DataFrame library.

Re-expresses the reference's parse plane (SURVEY.md §2.A S7/S8, §2.B
P1-P15) as ONE Catalyst plan of built-in Column expressions — no UDFs:

    read_techlog (wholetext, glob)            reader.py
      -> assemble records (regex split)       reader.py
      -> parse header / SQL / Context         parser.py
      -> typed LogEntry projection            parser.py
      -> TechLogRow + validity split          transform.py

The reference does this row-at-a-time in Go across goroutines
(internal/watcher/tail.go, internal/parser/*.go,
internal/transform/transform.go); here the whole pipeline is columnar and
whole-stage-codegen'd, and scales by file parallelism (one task per file
split) instead of one goroutine per file.
"""

from .parser import parse_records
from .reader import read_techlog, records_from_text
from .transform import to_techlog_rows

__all__ = ["read_techlog", "records_from_text", "parse_records", "to_techlog_rows"]
