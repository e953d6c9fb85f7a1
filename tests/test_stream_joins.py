"""Stream-stream interval join: correctness on streams, and batch/stream
result equivalence (same builder runs in both modes)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from logpump_spark.streaming.joins import interval_join


def _frame(spark, rows):
    return (
        spark.createDataFrame(rows, "sid long, ts_s string, tag string")
        .select("sid", F.col("ts_s").cast("timestamp").alias("ts"), "tag")
    )


ERRORS = [
    (1, "2024-01-01 10:00:00", "excp1"),
    (1, "2024-01-01 10:30:00", "excp2"),
    (2, "2024-01-01 10:00:00", "excp3"),
]
QUERIES = [
    (1, "2024-01-01 09:55:00", "sql_a"),  # within 10m of excp1 only
    (1, "2024-01-01 10:29:00", "sql_b"),  # within 10m of excp2 only
    (2, "2024-01-01 09:00:00", "sql_c"),  # too old for excp3
    (3, "2024-01-01 10:00:00", "sql_d"),  # no matching error session
]

EXPECTED = {("excp1", "sql_a"), ("excp2", "sql_b")}


def test_interval_join_batch(spark):
    errors, queries = _frame(spark, ERRORS), _frame(spark, QUERIES)
    out = interval_join(
        errors,
        queries.select(F.col("sid"), F.col("ts").alias("qts"), F.col("tag").alias("qtag")),
        ["sid"],
        "ts",
        "qts",
    )
    got = {(r.tag, r.qtag) for r in out.collect()}
    assert got == EXPECTED


def test_interval_join_streaming_matches_batch(spark, tmp_path):
    e_dir, q_dir = str(tmp_path / "e"), str(tmp_path / "q")
    for d, rows in ((e_dir, ERRORS), (q_dir, QUERIES)):
        os.makedirs(d)
        _frame(spark, rows).write.mode("overwrite").parquet(d)

    schema = spark.read.parquet(e_dir).schema
    e_stream = spark.readStream.schema(schema).parquet(e_dir)
    q_stream = (
        spark.readStream.schema(schema)
        .parquet(q_dir)
        .select(F.col("sid"), F.col("ts").alias("qts"), F.col("tag").alias("qtag"))
    )
    out = interval_join(e_stream, q_stream, ["sid"], "ts", "qts")
    q = (
        out.writeStream.format("memory")
        .queryName("ssjoin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.tag, r.qtag) for r in spark.sql("SELECT tag, qtag FROM ssjoin").collect()
    }
    assert got == EXPECTED
