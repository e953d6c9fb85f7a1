"""Incremental rollup maintenance — the continuous-aggregate /
materialized-view pattern over the tech-log sink (the Spark-native answer
to a ClickHouse AggregatingMergeTree downstream of the reference's
tables).

A rollup table holds MERGEABLE partial states per (grain keys):
count, quantized sum, min, max.  Each micro-batch:

1. aggregates its own rows to partials (map-side combinable),
2. unions with the CURRENT rollup restricted to the touched grains
   (partition-pruned read),
3. re-aggregates (states merge associatively),
4. overwrites exactly the touched partitions (dynamic partition
   overwrite -> idempotent under micro-batch replay).

At 100 TB this touches only the partitions a batch lands in — hot
last-hour partitions stay small — instead of recomputing the aggregate
over history.  Finalization (avg = sum/count) happens at read time via
``finalize_rollup``.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..compat import quant

STATE_COLS = ("n_rows", "sum_q", "min_v", "max_v")


def partial_states(df: DataFrame, grain: list[str], value_col: str) -> DataFrame:
    return df.groupBy(*grain).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(quant(value_col)).alias("sum_q"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    )


def merge_states(states: DataFrame, grain: list[str]) -> DataFrame:
    return states.groupBy(*grain).agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("sum_q").alias("sum_q"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def upsert_rollup(
    spark: SparkSession,
    batch: DataFrame,
    rollup_path: str,
    grain: list[str],
    value_col: str,
    partition_col: str,
) -> None:
    """Merge one batch into the rollup table at ``rollup_path``
    (partitioned by ``partition_col``, which must be in ``grain``)."""
    assert partition_col in grain
    new_states = partial_states(batch, grain, value_col)

    try:
        current = spark.read.parquet(rollup_path)
    except AnalysisException as e:
        # ONLY a missing rollup table means "first batch".  Any other
        # analysis error — and every transient read error — must
        # propagate: swallowing it would silently overwrite the touched
        # partitions with batch-only partials (permanent state loss that
        # looks like success).
        if "PATH_NOT_FOUND" not in str(e):
            raise
        merged = merge_states(new_states, grain)
    else:
        # partition-dir type inference may widen the partition column
        # (e.g. '2024-01-01' -> DATE); pin it back to the batch's type
        tgt_type = dict(new_states.dtypes)[partition_col]
        current = current.withColumn(
            partition_col, F.col(partition_col).cast(tgt_type)
        )
        # driver-side collect is CARDINALITY-BOUNDED: distinct partition
        # values touched by ONE micro-batch (dates, typically 1-2) —
        # never proportional to row count
        touched = [
            r[0] for r in new_states.select(partition_col).distinct().collect()
        ]
        # partition-pruned read of only the grains this batch touches
        current = current.filter(F.col(partition_col).isin(touched))
        merged = merge_states(current.unionByName(new_states), grain)

    (
        # dynamic overwrite as a per-write option (no session-conf
        # mutation): only the touched partitions are rewritten
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(rollup_path)
    )


def finalize_rollup(rollup: DataFrame) -> DataFrame:
    """Read-time finalization: exact avg from the quantized-sum state."""
    return rollup.select(
        *[c for c in rollup.columns if c not in STATE_COLS],
        F.col("n_rows"),
        (F.col("sum_q").cast("double") / 10000.0).alias("sum_v"),
        (F.col("sum_q").cast("double") / 10000.0 / F.col("n_rows")).alias("avg_v"),
        "min_v",
        "max_v",
    )
