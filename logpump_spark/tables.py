"""Test-table loaders for the driver's synthetic parquet star schema.

Parquet scans here are the scale-critical path: Catalyst pushes filters and
prunes columns into these scans (verify with .explain showing PushedFilters
/ ReadSchema), so query functions should select/filter on the DataFrames
returned here rather than materializing anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (TPC-H dims
# grow slowly or not at all); fact tables shuffle on their join keys.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS).  Spark 3.x's vectorized
        # reader rejects it outright — read as raw nanos (runtime-settable
        # legacy conf) and truncate to µs, the same truncation DuckDB
        # applies when it narrows ns -> its µs TIMESTAMP, so oracles agree
        # exactly.  Spark 4.1+ reads NANOS natively as TIMESTAMP_NTZ —
        # normalize to session-tz TIMESTAMP (value-preserving under the
        # UTC session tz every entry point pins) so downstream
        # unix_micros()/window() calls resolve on either Spark.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        dtype = dict(df.dtypes).get("ts")
        from pyspark.sql import functions as F

        if dtype == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        elif dtype == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}
