"""The r11 segmented ROWS-frame window (operators/segwin.py) is a
re-expression: frame_sum/frame_n must be bit-identical to the plain
single-window formulation for any hot_key_threshold.  On test-sized
data the fixed 4x-parallelism block count makes every block a sliver
of 2-3 rows, so each frame crosses SEVERAL block heads — the carry
concatenation's inductive case is exercised on every row, not just at
occasional boundaries."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from logpump_spark.operators.segwin import (
    _moving_plain,
    moving_rows_frame,
)

T0 = dt.datetime(2024, 1, 1)


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, qv bigint"
    )


def _rand(seed, n_users=15, hot_rows=400, null_val_every=0, null_ts_every=0):
    rng = random.Random(seed)
    rows, eid = [], 0
    for u in range(1, n_users + 1):
        t = T0
        for _ in range(rng.randint(1, 10)):
            t = t + dt.timedelta(seconds=rng.randint(1, 500))
            rows.append((eid, t, u, rng.randint(-50, 50)))
            eid += 1
    t = T0
    for i in range(hot_rows):
        t = t + dt.timedelta(seconds=rng.choice([0, 0, 1, 40]))  # tie storms
        ts = None if null_ts_every and i % null_ts_every == 0 else t
        qv = None if null_val_every and i % null_val_every == 0 else rng.randint(-9, 9)
        rows.append((eid, ts, 0, qv))
        eid += 1
    rng.shuffle(rows)
    return rows


def _collect(df):
    return sorted(
        (r.user_id, r.event_id, r.frame_sum, r.frame_n)
        for r in df.select("user_id", "event_id", "frame_sum", "frame_n").collect()
    )


@pytest.mark.parametrize("seed,frame", [(1, 7), (2, 3), (3, 12)])
def test_segmented_equals_plain_across_frames(spark, seed, frame):
    df = _mk(spark, _rand(seed))
    got = moving_rows_frame(df, "qv", frame_rows=frame, hot_key_threshold=50)
    want = moving_rows_frame(df, "qv", frame_rows=frame, hot_key_threshold=None)
    assert _collect(got) == _collect(want)


def test_segmented_null_values_keep_sum_semantics(spark):
    # SUM skips NULLs and is NULL on an all-NULL frame; the cross-block
    # aggregate must reproduce both
    df = _mk(spark, _rand(5, hot_rows=300, null_val_every=2))
    got = moving_rows_frame(df, "qv", hot_key_threshold=40)
    want = moving_rows_frame(df, "qv", hot_key_threshold=None)
    assert _collect(got) == _collect(want)


def test_segmented_all_null_value_runs(spark):
    rows = [(i, T0 + dt.timedelta(seconds=i), 0, None) for i in range(120)]
    rows += [(500, T0, 1, 4)]
    df = _mk(spark, rows)
    got = moving_rows_frame(df, "qv", hot_key_threshold=30)
    want = moving_rows_frame(df, "qv", hot_key_threshold=None)
    assert _collect(got) == _collect(want)
    assert all(
        r.frame_sum is None
        for r in got.filter(F.col("user_id") == 0).collect()
    )


def test_segmented_null_ts_ordering(spark):
    df = _mk(spark, _rand(6, hot_rows=200, null_ts_every=11))
    got = moving_rows_frame(df, "qv", hot_key_threshold=40)
    want = moving_rows_frame(df, "qv", hot_key_threshold=None)
    assert _collect(got) == _collect(want)


def test_gate_compiles_plain_plan_when_no_hot_key(spark):
    df = _mk(spark, _rand(7, hot_rows=0))
    out = moving_rows_frame(df, "qv")  # default 1M threshold
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "SPARK_PARTITION_ID" not in plan.upper()
    assert "RepartitionByExpression" not in plan
    assert _collect(out) == _collect(
        _moving_plain(df, "qv", 7, "user_id", "ts", "event_id")
    )


def test_segmented_plan_shares_one_block_assignment(spark):
    # r13: the windowed branch and the tails branch read ONE
    # materialized block assignment (skewguard.ranged_blocks
    # localCheckpoints the ranged frame) — the executed plan must show
    # the checkpointed RDD scan and NO range exchange at all (the
    # shuffle ran once, inside the checkpoint; a rangepartitioning
    # exchange here would mean a branch re-derived its own assignment).
    df = _mk(spark, _rand(8, hot_rows=300))
    out = moving_rows_frame(df, "qv", hot_key_threshold=40)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    executed = plan.split("== Initial Plan ==")[0]
    assert "Scan ExistingRDD" in executed, executed
    assert "Exchange rangepartitioning" not in executed, executed
