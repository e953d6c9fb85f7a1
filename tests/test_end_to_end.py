"""The whole reference workflow in one test: raw 1C logs -> parse ->
routed, partitioned, clustered sink -> the ANALYTICAL side (the queries
the reference delegated to ClickHouse) over that sink — and the numbers
agree with ground truth computed from the raw records."""

from __future__ import annotations

import os

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from logpump_spark.streaming import build_techlog_stream
from logpump_spark.streaming.job import run_stream

N_SQL = 40
N_EXCP = 20


def _write_logs(d: str) -> None:
    os.makedirs(d)
    # two hourly files; durations are deterministic functions of i
    with open(f"{d}/25052607.log", "w", encoding="utf-8") as f:
        for i in range(N_SQL):
            f.write(
                f"07:{i % 60:02d}.{i:06d}-{i * 100},DBMSSQL,0,Usr=user{i % 4},"
                f"DataBase=erp,SessionID={i},Sql='SELECT {i} FROM T'\n"
            )
    with open(f"{d}/25052608.log", "w", encoding="utf-8") as f:
        for i in range(N_EXCP):
            f.write(
                f"08:{i % 60:02d}.{i:06d}-{i * 7},EXCP,3,Usr=user{i % 2},"
                f"Event=Boom{i}\n"
            )


def test_etl_then_analytics(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / p) for p in ("in", "out", "ckpt"))
    _write_logs(src)

    writer = build_techlog_stream(
        spark,
        src,
        out,
        ckpt,
        table_map={"EXCP": "errors"},
        default_table="tech_log",
        available_now=True,
    )
    run_stream(writer, timeout_seconds=120)

    sink = spark.read.parquet(out)

    # --- §2.F: aggregations over log metrics, per EventType ---
    stats = {
        r.EventType: r
        for r in sink.groupBy("EventType")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("Duration").alias("total_dur"),
            F.max("Duration").alias("max_dur"),
            F.countDistinct("User").alias("n_users"),
        )
        .collect()
    }
    assert stats["DBMSSQL"].n == N_SQL
    assert stats["DBMSSQL"].total_dur == sum(i * 100 for i in range(N_SQL))
    assert stats["DBMSSQL"].max_dur == (N_SQL - 1) * 100
    assert stats["DBMSSQL"].n_users == 4
    assert stats["EXCP"].n == N_EXCP
    assert stats["EXCP"].total_dur == sum(i * 7 for i in range(N_EXCP))
    assert stats["EXCP"].n_users == 2

    # --- routing put each component in its own table dir ---
    assert set(r._table for r in sink.select("_table").distinct().collect()) == {
        "tech_log",
        "errors",
    }

    # --- window function over the sink: per-user top duration rank ---
    w = W.partitionBy("User").orderBy(F.col("Duration").desc())
    top = (
        sink.filter(F.col("EventType") == "DBMSSQL")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("User", "Duration")
        .collect()
    )
    # user{k} owns durations {100*i : i % 4 == k}; max for user3 = 3900
    got = {r.User: r.Duration for r in top}
    assert got["user3"] == (N_SQL - 1) * 100  # i=39 -> user3

    # --- time slicing via partition pruning (EventDate partitions) ---
    day = sink.filter(F.col("EventDate") == "2025-05-26")
    assert day.count() == N_SQL + N_EXCP
    explained = day._jdf.queryExecution().toString()
    assert "PartitionFilters" in explained

    # --- SQL text survived parse + sink round trip ---
    one = sink.filter(
        (F.col("EventType") == "DBMSSQL") & (F.col("SessionID") == 7)
    ).collect()[0]
    assert one.SQLText == "SELECT 7 FROM T"
    assert one.EventTime.hour == 7
