"""inter_arrival_gaps (operators/timeseries.py, r16) — the count-gated
segmented rebuild of timeseries_gaps' per-type LAG (VERDICT r15 item 2).

Pins: (1) the segmented route's gap multiset equals the plain LAG
window's on random data, including duplicate timestamps and NULL ts;
(2) the downstream statistics (count / exact percentiles / max) are
therefore identical; (3) a corpus with no key over the gate compiles
the PLAIN plan — no range repartition, no block column — so the bench
and oracle fixtures keep the historical shape.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from logpump_spark.operators.timeseries import inter_arrival_gaps


def _mk_events(spark, n_keys=4, rows_per_key=120, with_nulls=False, seed=7):
    rng = random.Random(seed)
    rows = []
    eid = 0
    for k in range(n_keys):
        for _ in range(rows_per_key + k * 13):
            us = rng.randrange(0, 5_000_000) * 1000  # duplicates likely
            if with_nulls and rng.random() < 0.05:
                ts = None
            else:
                ts = us
            rows.append((f"type_{k}", ts, eid))
            eid += 1
    df = spark.createDataFrame(rows, "event_type string, us long, event_id long")
    return df.select(
        "event_type",
        F.timestamp_micros(F.col("us")).alias("ts"),
        "event_id",
    )


def _gap_multiset(df):
    rows = df.groupBy("event_type", "gap_us").count().collect()
    return sorted((r.event_type, r.gap_us, r["count"]) for r in rows)


@pytest.mark.parametrize("with_nulls", [False, True], ids=["clean", "null_ts"])
def test_segmented_equals_plain_multiset(spark, with_nulls):
    ev = _mk_events(spark, with_nulls=with_nulls)
    plain = inter_arrival_gaps(ev, hot_key_threshold=None)
    segmented = inter_arrival_gaps(ev, hot_key_threshold=1)  # force hot route
    assert _gap_multiset(segmented) == _gap_multiset(plain)


def test_segmented_statistics_identical(spark):
    ev = _mk_events(spark, n_keys=3, rows_per_key=200)

    def stats(gaps):
        out = (
            gaps.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_gaps"),
                F.floor(F.expr("percentile(gap_us, 0.5)")).cast("long").alias("p50"),
                F.floor(F.expr("percentile(gap_us, 0.95)")).cast("long").alias("p95"),
                F.max("gap_us").alias("mx"),
            )
            .collect()
        )
        return sorted(tuple(r) for r in out)

    assert stats(inter_arrival_gaps(ev, hot_key_threshold=1)) == stats(
        inter_arrival_gaps(ev, hot_key_threshold=None)
    )


def test_cold_gate_compiles_plain_plan(spark):
    # no key over the default 1M gate -> the compiled plan IS the plain
    # single-window plan: no block column, no range repartition
    ev = _mk_events(spark, n_keys=2, rows_per_key=50)
    out = inter_arrival_gaps(ev)
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "_ia_blk" not in plan
    assert "RepartitionByExpression" not in plan
    want = _gap_multiset(inter_arrival_gaps(ev, hot_key_threshold=None))
    assert _gap_multiset(out) == want


def test_single_row_and_empty_keys(spark):
    # a key with one row produces no gaps on either route; empty input
    # yields an empty frame, not an error
    ev = _mk_events(spark, n_keys=1, rows_per_key=1)
    assert inter_arrival_gaps(ev, hot_key_threshold=1).count() == 0
    empty = ev.filter(F.lit(False))
    assert inter_arrival_gaps(empty, hot_key_threshold=1).count() == 0
