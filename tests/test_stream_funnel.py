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


def _run_accumulating_stream(spark, tmp_path, operator):
    """Drive the fixture through maxFilesPerTrigger=1 micro-batches,
    appending each batch to a store; return (per-epoch results computed
    over the accumulated store, the store path, number of batches)."""
    import os

    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate(_FILES):
        spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/f{i}")
        # widely-spaced mtimes pin the micro-batch order (the file source
        # picks oldest-first; sub-second writes could otherwise tie)
        for root, _dirs, files in os.walk(f"{src}/f{i}"):
            for fname in files:
                os.utime(os.path.join(root, fname), (1_700_000_000 + i * 100,) * 2)

    stream = spark.readStream.schema(_SCHEMA).option(
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
