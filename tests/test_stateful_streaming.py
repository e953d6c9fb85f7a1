"""Stateful streaming: dedup-within-watermark and applyInPandasWithState
keyed state across micro-batches."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from logpump_spark.streaming.stateful import dedup_stream, running_counts_stream


def _write_batch(spark, path, rows):
    spark.createDataFrame(
        rows, "event_id long, ts_str string, user_id long, value double"
    ).withColumn("ts", F.col("ts_str").cast("timestamp")).drop("ts_str").write.mode(
        "append"
    ).parquet(path)


def test_dedup_within_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_batch(
        spark,
        src,
        [
            (1, "2024-01-01 00:00:01", 1, 1.0),
            (1, "2024-01-01 00:00:02", 1, 1.0),  # dup of event 1
            (2, "2024-01-01 00:01:00", 2, 2.0),
        ],
    )
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    deduped = dedup_stream(stream, ["event_id"], "ts", "10 minutes")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT event_id FROM dedup_out").collect()
    assert sorted(r.event_id for r in rows) == [1, 2]


def test_apply_in_pandas_with_state_across_batches(spark, tmp_path):
    src = str(tmp_path / "src2")
    ckpt = str(tmp_path / "ckpt2")
    out_dir = str(tmp_path / "out2")
    os.makedirs(src)
    _write_batch(spark, src, [(1, "2024-01-01 00:00:01", 7, 10.0)])

    def run_once():
        stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
        out = running_counts_stream(stream.select("user_id", "value"))
        q = (
            out.writeStream.foreachBatch(
                lambda df, _eid: df.write.mode("append").parquet(out_dir)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = {
        (r.user_id, r.n_events, r.total_value)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert (7, 1, 10.0) in first

    # second batch: keyed state must carry over through the checkpoint
    _write_batch(spark, src, [(2, "2024-01-01 00:00:05", 7, 5.0)])
    run_once()
    updates = {
        (r.user_id, r.n_events, r.total_value)
        for r in spark.read.parquet(out_dir).collect()
    }
    # the second run's update reflects accumulated state, not a reset
    assert (7, 2, 15.0) in updates
