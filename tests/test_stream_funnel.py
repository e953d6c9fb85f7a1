"""Streaming twins for the round-6 behavioral operators.

ClickHouse users run windowFunnel/sequenceCount over live event streams
by inserting raw events into a table and running the funnel at query
time — the stream only appends, the operator recomputes over the
accumulated store.  The Spark deployment mirrors that: foreachBatch
appends each micro-batch to a parquet store and the SAME Column-logic
operator runs over the accumulated table.  This pins the contract that
makes the pattern sound: after the stream drains, funnel-over-store
equals funnel-over-corpus run in batch mode.

The fixture is adversarial on purpose:
- user 1's step chain (view -> cart -> buy) is split ACROSS micro-batch
  files — a per-batch-only funnel would score level 1, not 3;
- user 2's chain is broken by an interleaving noise event that arrives
  in a LATER file than the steps it separates — a per-batch funnel
  would wrongly score level 3 before the noise arrives.
Both wrong answers are exactly what the accumulate-and-recompute
deployment exists to avoid.
"""

from __future__ import annotations

import datetime as dt


from logpump_spark.operators.funnel import (
    sequence_count_adjacent,
    window_funnel_strict,
)

from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2025, 3, 1, 12, minute, 0)


# (event_id, ts, user_id, event_type) split into three source files; ts
# interleaves across files so event-time order != arrival order.
_FILES = [
    [  # file 0
        (1, _ts(0), 1, "view"),
        (10, _ts(0), 2, "view"),
        (11, _ts(2), 2, "cart"),
        (12, _ts(4), 2, "buy"),
        (20, _ts(0), 3, "view"),
        (21, _ts(1), 3, "cart"),
        (22, _ts(2), 3, "buy"),
    ],
    [  # file 1: user 1's chain continues; user 2's chain gets broken
        (2, _ts(5), 1, "cart"),
        (13, _ts(1), 2, "noise"),  # lands BETWEEN user 2's view and cart
    ],
    [  # file 2
        (3, _ts(9), 1, "buy"),
        (4, _ts(30), 4, "cart"),  # never does step 1
    ],
]

_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def _steps():
    return [
        F.col("event_type") == "view",
        F.col("event_type") == "cart",
        F.col("event_type") == "buy",
    ]


def _run_accumulating_stream(spark, tmp_path, operator, files=None, schema=None):
    """Drive the fixture through maxFilesPerTrigger=1 micro-batches,
    appending each batch to a store; return (per-epoch results computed
    over the accumulated store, the store path)."""
    import os

    files = _FILES if files is None else files
    schema = _SCHEMA if schema is None else schema
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate(files):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/f{i}")
        # widely-spaced mtimes pin the micro-batch order (the file source
        # picks oldest-first; sub-second writes could otherwise tie)
        for root, _dirs, fnames in os.walk(f"{src}/f{i}"):
            for fname in fnames:
                os.utime(os.path.join(root, fname), (1_700_000_000 + i * 100,) * 2)

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(f"{src}/f*")

    epochs: list[list] = []

    def sink(df, epoch_id):
        df.write.mode("append").parquet(store)
        acc = spark.read.parquet(store)
        epochs.append(sorted(operator(acc).collect()))

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return epochs, store


def _batch_df(spark):
    rows = [r for f in _FILES for r in f]
    return spark.createDataFrame(rows, _SCHEMA)


def test_strict_funnel_stream_equals_batch(spark, tmp_path):
    op = lambda df: window_funnel_strict(df, _steps())  # noqa: E731
    epochs, store = _run_accumulating_stream(spark, tmp_path, op)

    assert len(epochs) == len(_FILES), "expected one micro-batch per file"
    batch = sorted(op(_batch_df(spark)).collect())
    assert epochs[-1] == batch

    final = {r.user_id: r.level for r in epochs[-1]}
    # user 1's chain spans all three micro-batches
    assert final[1] == 3
    # user 2's chain was broken by the noise event that arrived late
    assert final[2] == 1
    # user 3 completed within one batch; user 4 has no anchor row
    assert final[3] == 3
    assert 4 not in final

    # the interim epochs are each correct for the data seen so far:
    # before the noise event arrived, user 2 legitimately scored 3
    e0 = {r.user_id: r.level for r in epochs[0]}
    assert e0[2] == 3
    e1 = {r.user_id: r.level for r in epochs[1]}
    assert e1[2] == 1


def test_sequence_count_stream_equals_batch(spark, tmp_path):
    op = lambda df: sequence_count_adjacent(  # noqa: E731
        df, F.col("event_type") == "view", F.col("event_type") == "cart"
    )
    epochs, store = _run_accumulating_stream(spark, tmp_path, op)

    assert len(epochs) == len(_FILES)
    batch = sorted(op(_batch_df(spark)).collect())
    assert epochs[-1] == batch

    final = {r.user_id: r.n_matches for r in epochs[-1]}
    # user 1: view(t0) .. cart arrives in batch 1 but at t5 — adjacent
    # in the final order (nothing between t0 and t5 for user 1)
    assert final[1] == 1
    # user 2: view->cart was adjacent until the late noise event landed
    # between them
    assert final[2] == 0
    e0 = {r.user_id: r.n_matches for r in epochs[0]}
    assert e0[2] == 1


def test_moving_avg_stream_equals_batch(spark, tmp_path):
    """ROWS-frame windows are order-sensitive: user 2's late-arriving
    noise event lands INSIDE earlier frames, so per-batch results must
    be revised by recompute — the same contract as the funnel."""
    from pyspark.sql import Window as W

    def op(df):
        w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
        return df.select(
            "user_id",
            "event_id",
            F.avg(F.col("event_id").cast("double")).over(w).alias("m3"),
        )

    epochs, _store = _run_accumulating_stream(spark, tmp_path, op)
    assert len(epochs) == len(_FILES)
    assert epochs[-1] == sorted(op(_batch_df(spark)).collect())
    # the late event must have changed user 2's frames between epochs
    e0 = {(r.user_id, r.event_id): r.m3 for r in epochs[0]}
    efin = {(r.user_id, r.event_id): r.m3 for r in epochs[-1]}
    assert e0[(2, 12)] != efin[(2, 12)]


def test_running_distinct_stream_equals_batch(spark, tmp_path):
    from pyspark.sql import Window as W

    def op(df):
        w_first = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
        w_run = (
            W.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        flagged = df.withColumn(
            "is_first", (F.row_number().over(w_first) == 1).cast("long")
        )
        return flagged.select(
            "user_id",
            "event_id",
            F.sum("is_first").over(w_run).alias("nd"),
        )

    epochs, _store = _run_accumulating_stream(spark, tmp_path, op)
    assert epochs[-1] == sorted(op(_batch_df(spark)).collect())
    # user 2's distinct-so-far at the buy event rises from 3 (view,
    # cart, buy) to 4 once the interleaved noise type arrives
    efin = {(r.user_id, r.event_id): r.nd for r in epochs[-1]}
    e0 = {(r.user_id, r.event_id): r.nd for r in epochs[0]}
    assert e0[(2, 12)] == 3 and efin[(2, 12)] == 4


# --- round-7 twins: strict_dedup funnel + the monitoring idioms --------
#
# strict_dedup's interruption condition is a REPEAT of an already-matched
# step between two matched steps — so the adversarial late arrival here
# is a duplicate step event, not generic noise (noise is exactly what
# strict_dedup exists to tolerate; the strict test above covers noise).

_DEDUP_FILES = [
    [  # file 0: two users complete chains; user 3 through cart
        (1, _ts(0), 1, "view"),
        (2, _ts(5), 1, "cart"),
        (3, _ts(9), 1, "buy"),
        (10, _ts(0), 2, "view"),
        (11, _ts(2), 2, "noise"),  # non-step event inside the chain
        (12, _ts(4), 2, "cart"),
        (13, _ts(6), 2, "buy"),
        (20, _ts(0), 3, "view"),
        (21, _ts(4), 3, "cart"),
    ],
    [  # file 1: user 3 finishes; a LATE duplicate view for user 1
        # lands between the view(t0) and cart(t5) seen in file 0
        (22, _ts(8), 3, "buy"),
        (4, _ts(2), 1, "view"),
    ],
    [  # file 2: late duplicate view for user 3 between cart and buy
        (23, _ts(6), 3, "view"),
    ],
]


def test_strict_dedup_funnel_stream_equals_batch(spark, tmp_path):
    from logpump_spark.operators.funnel import window_funnel_strict_dedup

    op = lambda df: window_funnel_strict_dedup(df, _steps())  # noqa: E731
    epochs, _store = _run_accumulating_stream(
        spark, tmp_path, op, files=_DEDUP_FILES
    )

    assert len(epochs) == len(_DEDUP_FILES)
    rows = [r for f in _DEDUP_FILES for r in f]
    batch = sorted(op(spark.createDataFrame(rows, _SCHEMA)).collect())
    assert epochs[-1] == batch

    final = {r.user_id: r.level for r in epochs[-1]}
    # user 1: the late duplicate view (t2) interrupts view(t0)->cart(t5)
    assert final[1] == 1
    # user 2: interleaved NON-step noise does not interrupt strict_dedup
    assert final[2] == 3
    # user 3: duplicate view between cart and buy caps the level at 2
    assert final[3] == 2
    # per-epoch correctness for data seen so far: both users scored
    # full chains before their duplicate arrived, then were revised down
    e0 = {r.user_id: r.level for r in epochs[0]}
    e1 = {r.user_id: r.level for r in epochs[1]}
    assert e0[1] == 3 and e1[1] == 1
    assert e1[3] == 3 and final[3] == 2


# Counter-reset rate and time-weighted average (timeseries_q.py
# timeseries_rate / timeseries_twa): both are one-lag/lead-over-user-sort
# shapes, so a late-arriving sample that lands BETWEEN two earlier
# samples changes its neighbors' lag/lead pairing — per-batch results
# must be revised by the accumulate-and-recompute deployment exactly as
# for the funnels.  The ops below are the registry operators' cores over
# a raw counter/gauge column (the registry twins synthesize the counter
# from the events table; the semantics under test — reset handling,
# hold-interval weighting — are identical).

_GAUGE_SCHEMA = "event_id long, ts timestamp, user_id long, reading long"

_RATE_FILES = [
    [  # monotone climb, then a wrap observed in-order
        (1, _ts(0), 1, 10),
        (2, _ts(2), 1, 20),
        (3, _ts(4), 1, 5),  # reset: 20 -> 5
        (4, _ts(6), 1, 8),
    ],
    [  # late sample lands between the 20 and the 5: the single
        # observed reset becomes TWO (20->7 and 7->5), and the day's
        # increase changes 18 -> 25
        (5, _ts(3), 1, 7),
    ],
]


def _rate_op(df):
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    d = df.withColumn("prev", F.lag("reading").over(w))
    inc = (
        F.when(F.col("prev").isNull(), F.lit(0))
        .when(F.col("reading") >= F.col("prev"), F.col("reading") - F.col("prev"))
        .otherwise(F.col("reading"))
    )
    reset = F.when(
        F.col("prev").isNotNull() & (F.col("reading") < F.col("prev")), 1
    ).otherwise(0)
    return (
        d.withColumn("inc", inc)
        .withColumn("reset", reset)
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.sum("inc").alias("increase"), F.sum("reset").alias("n_resets"))
    )


def test_counter_rate_stream_equals_batch(spark, tmp_path):
    epochs, _store = _run_accumulating_stream(
        spark, tmp_path, _rate_op, files=_RATE_FILES, schema=_GAUGE_SCHEMA
    )
    rows = [r for f in _RATE_FILES for r in f]
    batch = sorted(_rate_op(spark.createDataFrame(rows, _GAUGE_SCHEMA)).collect())
    assert epochs[-1] == batch

    e0 = {(r.user_id, str(r.day)): (r.increase, r.n_resets) for r in epochs[0]}
    fin = {(r.user_id, str(r.day)): (r.increase, r.n_resets) for r in epochs[-1]}
    key = (1, "2025-03-01")
    # before the late sample: 0 + 10 + 5 + 3 = 18 with one reset;
    # after: 0 + 10 + 7 + 5 + 3 = 25 with two (20->7, 7->5)
    assert e0[key] == (18, 1)
    assert fin[key] == (25, 2)


_TWA_FILES = [
    [  # one gauge held at 10 for 10 minutes, then sampled at 30
        (1, _ts(0), 1, 10),
        (2, _ts(10), 1, 30),
    ],
    [  # late sample splits the hold: 10 held 5 min, 0 held 5 min
        (3, _ts(5), 1, 0),
    ],
]


def _twa_op(df):
    day = F.to_date("ts")
    w = W.partitionBy("user_id", day).orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    d = df.select(
        "user_id", day.alias("day"), "ts", "event_id", "reading", us.alias("us")
    ).withColumn("nxt", F.lead("us").over(w))
    dur = F.col("nxt") - F.col("us")
    return (
        d.withColumn("dur", dur)
        .withColumn("seg", dur * F.col("reading"))
        .groupBy("user_id", "day")
        .agg(F.sum("seg").alias("num"), F.sum("dur").alias("den"))
        .filter(F.col("den") > 0)
        .select(
            "user_id",
            F.col("day").cast("string").alias("day"),
            (F.col("num").cast("double") / F.col("den").cast("double")).alias("twa"),
        )
    )


def test_twa_stream_equals_batch(spark, tmp_path):
    epochs, _store = _run_accumulating_stream(
        spark, tmp_path, _twa_op, files=_TWA_FILES, schema=_GAUGE_SCHEMA
    )
    rows = [r for f in _TWA_FILES for r in f]
    batch = sorted(_twa_op(spark.createDataFrame(rows, _GAUGE_SCHEMA)).collect())
    assert epochs[-1] == batch

    e0 = {(r.user_id, r.day): r.twa for r in epochs[0]}
    fin = {(r.user_id, r.day): r.twa for r in epochs[-1]}
    key = (1, "2025-03-01")
    # the whole first epoch holds 10 until the only next sample -> 10.0;
    # the late mid-interval zero drags the time-weighted mean to 5.0
    assert e0[key] == 10.0
    assert fin[key] == 5.0
