"""End-to-end batch pipeline: log directory -> TechLogRow DataFrame.

The whole flow is ONE Catalyst plan (scan -> split/explode -> parse ->
transform -> filter); nothing materializes between stages.  Compare the
reference's four thread hops (tailer goroutines -> channel -> batcher ->
sink, SURVEY.md §3.2-3.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .parser import parse_records
from .reader import read_techlog, records_from_text
from .transform import to_techlog_rows


def techlog_pipeline(
    spark: SparkSession,
    path: str,
    glob: str = "*.log",
    recursive: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """-> (TechLogRow rows, dead-letter rejects) for every record in every
    matching file under ``path``."""
    files = read_techlog(spark, path, glob=glob, recursive=recursive)
    records = records_from_text(files)
    entries = parse_records(records)
    return to_techlog_rows(entries)
