"""Source-format breadth: CSV, JSON-lines, and ORC scans.

The engine's primary table format is parquet (the tables the driver
ships) and its ingest format is raw 1C text (the techlog reader), but a
production engine must also read the interchange formats data actually
arrives in.  Each query here derives a twin of a driver table in the
target format — written by Spark's own writer to a per-sf cache dir —
and reads it back through the REAL format reader with an explicit
schema, returning the rows; the oracle reads the original parquet, so
the hash comparison proves byte-exact roundtrip fidelity through each
format's writer+parser (including doubles through JSON text via
shortest-round-trip rendering, and timestamps through ORC).

Scale notes: the same `spark.read.csv/json/orc` calls scale to a
directory of thousands of files — schema is explicit (no inference
pass over 100 TB), formats are splittable as written here (no
multiline JSON, no compressed single-file CSV), and pushdown/pruning
work on ORC like parquet.  The twin-derivation write is test
scaffolding, not the operator under test.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load

_CACHE_ROOT = os.path.join(tempfile.gettempdir(), "logpump_sources_cache")


def _twin_dir(sf_dir: str, name: str) -> str:
    sf = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join(_CACHE_ROOT, sf, name)


def scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source: nation written with headers, read back with an
    explicit schema (no inference scan)."""
    out = _twin_dir(sf_dir, "nation_csv")
    load(spark, sf_dir, "nation").write.mode("overwrite").option(
        "header", "true"
    ).csv(out)
    back = (
        spark.read.schema("n_nationkey int, n_name string, n_regionkey int")
        .option("header", "true")
        .csv(out)
    )
    return back.orderBy("n_nationkey")


_SCAN_CSV_SQL = "SELECT * FROM nation ORDER BY n_nationkey"


def scan_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source: an orders slice (int64 keys, free-text status,
    DOUBLE totalprice) through json writer+parser; shortest-round-trip
    double rendering makes the roundtrip value-exact."""
    out = _twin_dir(sf_dir, "orders_jsonl")
    load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    ).write.mode("overwrite").json(out)
    back = spark.read.schema(
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double"
    ).json(out)
    return back.orderBy("o_orderkey")


_SCAN_JSONL_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey
"""


def scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source: an events slice including the µs timestamp column
    through the columnar ORC writer+reader, with a predicate on the
    read side to exercise ORC pushdown."""
    out = _twin_dir(sf_dir, "events_orc")
    load(spark, sf_dir, "events").filter(F.col("event_id") < 1000).select(
        "event_id", "ts", "user_id", "event_type", "value"
    ).write.mode("overwrite").orc(out)
    back = (
        spark.read.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double"
        )
        .orc(out)
        .filter(F.col("event_type") != "error")
    )
    return back.orderBy("event_id")


_SCAN_ORC_SQL = """
SELECT event_id, ts, user_id, event_type, value
FROM events WHERE event_id < 1000 AND event_type != 'error'
ORDER BY event_id
"""


SPARK_QUERIES = {
    "scan_csv": scan_csv,
    "scan_jsonl": scan_jsonl,
    "scan_orc": scan_orc,
}
ORACLE_SQL = {
    "scan_csv": _SCAN_CSV_SQL,
    "scan_jsonl": _SCAN_JSONL_SQL,
    "scan_orc": _SCAN_ORC_SQL,
}
