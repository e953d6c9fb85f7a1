"""Streaming twins for the interval sweep family.

Same accumulate-and-recompute deployment as test_stream_funnel.py: raw
events append to a store per micro-batch, the sweep recomputes over the
accumulated table, and after the stream drains the result must equal
the batch run over the whole corpus.

The adversarial property specific to INTERVALS: a late-arriving event
can BRIDGE two of a user's sessions (the 30-min gap closes), merging
two short intervals into one long one — which retroactively changes
both the interval set and the peak concurrency.  A per-batch-only
sweep can never merge across batches; the fixture makes that failure
visible.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from logpump_spark.operators.intervals import (
    interval_union_length,
    max_concurrent_intervals,
)
from logpump_spark.operators.sessionize import session_stats, sessionize

from .test_stream_funnel import _run_accumulating_stream


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2025, 3, 1, 12, 0, 0) + dt.timedelta(minutes=minute)


def _us(minute: int) -> int:
    base = dt.datetime(2025, 3, 1, 12, 0, tzinfo=dt.timezone.utc)
    return int((base + dt.timedelta(minutes=minute)).timestamp() * 1_000_000)


_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"

# user 1: events at t0 and t50 — a 50-min gap, so TWO zero-length
# sessions (which count 0 under half-open [s,e) semantics) until the
# bridging event at t25 arrives in the LAST file and merges them into
# one [t0, t50] session that overlaps user 2's [t10, t40].
_MC_FILES = [
    [  # file 0
        (1, _ts(0), 1, "click"),
        (2, _ts(50), 1, "click"),
        (10, _ts(10), 2, "click"),
        (11, _ts(30), 2, "click"),
        (12, _ts(40), 2, "click"),
    ],
    [  # file 1: a third user, disjoint in time
        (20, _ts(60), 3, "click"),
        (21, _ts(80), 3, "click"),
    ],
    [  # file 2: the late bridge
        (3, _ts(25), 1, "click"),
    ],
]


def _mc_op(df):
    return max_concurrent_intervals(session_stats(df))


def test_max_concurrent_stream_equals_batch(spark, tmp_path):
    epochs, _store = _run_accumulating_stream(
        spark, tmp_path, _mc_op, files=_MC_FILES, schema=_SCHEMA
    )
    assert len(epochs) == len(_MC_FILES)

    rows = [r for f in _MC_FILES for r in f]
    batch = sorted(_mc_op(spark.createDataFrame(rows, _SCHEMA)).collect())
    assert epochs[-1] == batch

    # epoch 0: user 1's sessions are zero-length (count 0); only user
    # 2's [t10, t40] is open -> peak 1 at t10
    (e0,) = epochs[0]
    assert (e0.max_concurrent, e0.at_us) == (1, _us(10))
    # epoch 1: user 3's [t60, t80] is disjoint -> peak still 1
    (e1,) = epochs[1]
    assert (e1.max_concurrent, e1.at_us) == (1, _us(10))
    # epoch 2: the bridge merges user 1 into [t0, t50], overlapping
    # user 2 -> peak 2, first reached when user 2 opens at t10
    (e2,) = epochs[2]
    assert (e2.max_concurrent, e2.at_us) == (2, _us(10))


# user 2 has a 'click' session [t10, t40]; the 'view' session [t30,
# t60] arrives late — union coverage must become 50 min, not 30+30.
_UL_FILES = [
    [
        (10, _ts(10), 2, "click"),
        (11, _ts(30), 2, "click"),
        (12, _ts(40), 2, "click"),
    ],
    [
        (20, _ts(30), 2, "view"),
        (21, _ts(60), 2, "view"),
    ],
]


def _ul_op(df):
    keyed = df.withColumn(
        "uk", F.concat_ws("|", F.col("user_id"), F.col("event_type"))
    )
    iv = (
        sessionize(keyed, user_col="uk")
        .groupBy("user_id", "event_type", "session_no")
        .agg(
            F.unix_micros(F.min("ts")).alias("s_us"),
            F.unix_micros(F.max("ts")).alias("e_us"),
        )
    )
    return interval_union_length(iv)


def test_union_length_stream_equals_batch(spark, tmp_path):
    epochs, _store = _run_accumulating_stream(
        spark, tmp_path, _ul_op, files=_UL_FILES, schema=_SCHEMA
    )
    assert len(epochs) == len(_UL_FILES)

    rows = [r for f in _UL_FILES for r in f]
    batch = sorted(_ul_op(spark.createDataFrame(rows, _SCHEMA)).collect())
    assert epochs[-1] == batch

    (e0,) = epochs[0]
    assert (e0.covered_us, e0.n_intervals) == (30 * 60 * 1_000_000, 1)
    # overlapping 'view' session arrived: union is [t10, t60] = 50 min
    # counted ONCE across two intervals
    (e1,) = epochs[1]
    assert (e1.covered_us, e1.n_intervals) == (50 * 60 * 1_000_000, 2)


# --- time-decayed aggregates: the recompute contract -----------------------
# The decayed weights are relative to T_end = max(ts) seen so far.  A
# late-arriving event with the NEWEST timestamp moves T_end and
# re-weights EVERY earlier event — per-batch decayed sums can never be
# merged; only accumulate-and-recompute is correct.

_DECAY_FILES = [
    [
        (1, _ts(0), 1, "click"),
        (2, _ts(30), 1, "click"),
    ],
    [  # newest timestamp arrives in a later batch: T_end jumps +60 min
        (3, _ts(90), 1, "click"),
    ],
]


def _decay_op(df):
    from logpump_spark.operators.timeseries import time_decayed_by_type

    # tau = 1h so the T_end shift visibly re-weights the early events
    return time_decayed_by_type(df.withColumn("value", F.lit(1.0)),
                                tau_us=3600 * 1_000_000)


def test_decay_stream_equals_batch_and_reweights(spark, tmp_path):
    import math

    epochs, _store = _run_accumulating_stream(
        spark, tmp_path, _decay_op, files=_DECAY_FILES, schema=_SCHEMA
    )
    assert len(epochs) == len(_DECAY_FILES)

    rows = [r for f in _DECAY_FILES for r in f]
    batch = sorted(_decay_op(spark.createDataFrame(rows, _SCHEMA)).collect())
    assert epochs[-1] == batch

    # epoch 0: T_end = t30 -> weights exp(-0.5) + 1
    (e0,) = epochs[0]
    assert e0.decayed_sum == round(math.exp(-0.5) + 1.0, 6)
    # epoch 1: T_end jumped to t90 -> the SAME two early events now
    # weigh exp(-1.5) + exp(-1.0); a per-batch merge would have kept
    # their epoch-0 weights and added exp(0) = 1
    (e1,) = epochs[1]
    assert e1.decayed_sum == round(
        math.exp(-1.5) + math.exp(-1.0) + 1.0, 6
    )
    assert e1.decayed_sum != round(e0.decayed_sum + 1.0, 6)
