"""The r12 segmented running distinct (operators/segwin.py:
running_distinct) closes the LAST cap-only shape of the user-key
window family: the naive formulation's value-set carry disappears
under the first-occurrence-flag decomposition, leaving a grouped
min-aggregate + the generic segmented prefix sum (one number per block
carried).  These tests pin segmented ≡ plain on hot twins including a
hot key with ONE dominant value (the case the old per-(key, value)
row_number window would single-task), NULL values and NULL timestamps,
the count gate, and the sampled-bounds regime."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from logpump_spark.operators.segwin import prefix_sum_segmented, running_distinct

T0 = dt.datetime(2024, 1, 1)


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, et string"
    )


def _rand(seed, n_users=15, hot_rows=400, dominant_value=False,
          null_val_every=0, null_ts_every=0):
    rng = random.Random(seed)
    kinds = ["a", "b", "c", "d", "e"]
    rows, eid = [], 0
    for u in range(1, n_users + 1):
        t = T0
        for _ in range(rng.randint(1, 10)):
            t = t + dt.timedelta(seconds=rng.randint(1, 500))
            rows.append((eid, t, u, rng.choice(kinds)))
            eid += 1
    t = T0
    for i in range(hot_rows):
        t = t + dt.timedelta(seconds=rng.choice([0, 0, 1, 40]))
        ts = None if null_ts_every and i % null_ts_every == 0 else t
        v = "a" if dominant_value and i % 20 else rng.choice(kinds)
        if null_val_every and i % null_val_every == 0:
            v = None
        rows.append((eid, ts, 0, v))
        eid += 1
    rng.shuffle(rows)
    return rows


def _collect(df):
    return sorted(
        (r.user_id, r.event_id, r.n_distinct)
        for r in df.select("user_id", "event_id", "n_distinct").collect()
    )


@pytest.mark.parametrize(
    "seed,kw",
    [
        (1, {}),
        (2, {"dominant_value": True}),  # hot (key, value) pair
        (3, {"null_val_every": 7}),     # NULL is a distinct value bucket
        (4, {"null_ts_every": 11}),
    ],
)
def test_running_distinct_segmented_equals_plain(spark, seed, kw):
    df = _mk(spark, _rand(seed, **kw))
    got = running_distinct(df, "et", hot_key_threshold=50)
    want = running_distinct(df, "et", hot_key_threshold=None)
    assert _collect(got) == _collect(want)


def test_prefix_sum_segmented_equals_plain_window(spark):
    from pyspark.sql import Window as W

    df = _mk(spark, _rand(5, hot_rows=300)).withColumn(
        "flag", (F.col("event_id") % 3 == 0).cast("long")
    )
    got = prefix_sum_segmented(df, "flag", out_col="rs")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    want = df.withColumn("rs", F.sum("flag").over(w).cast("long"))
    g = sorted((r.user_id, r.event_id, r.rs) for r in got.select("user_id", "event_id", "rs").collect())
    x = sorted((r.user_id, r.event_id, r.rs) for r in want.select("user_id", "event_id", "rs").collect())
    assert g == x


def test_count_gate_compiles_plain_plan(spark):
    df = _mk(spark, _rand(6, hot_rows=0))
    out = running_distinct(df, "et")  # default 1M threshold
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "SPARK_PARTITION_ID" not in plan.upper()
    assert "RepartitionByExpression" not in plan


def test_running_distinct_sampled_bounds_regime(spark):
    # at-scale equality where range bounds are genuinely SAMPLED (r13:
    # the materialized block assignment makes this a scale regression
    # test, not a sampler-determinism pin — see skewguard.ranged_blocks)
    from tests.test_seglead import _sampled_regime_rows

    hot = spark.range(_sampled_regime_rows(spark)).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.lit(1704067200000000) + F.col("id") * F.lit(5_000_000)
        ).alias("ts"),
        F.lit(0).cast("long").alias("user_id"),
        F.concat(F.lit("t"), (F.col("id") % 531).cast("string")).alias("et"),
    )
    cold = spark.range(1_000).select(
        (F.col("id") + 10_000_000).alias("event_id"),
        F.timestamp_micros(
            F.lit(1704067200000000) + (F.col("id") % 977) * F.lit(3_601_000_000)
        ).alias("ts"),
        (F.col("id") % 100 + 1).alias("user_id"),
        F.lit("a").alias("et"),
    )
    df = hot.unionByName(cold)
    got = running_distinct(df, "et", hot_key_threshold=10_000)
    want = running_distinct(df, "et", hot_key_threshold=None)
    assert got.select("user_id", "event_id", "n_distinct").exceptAll(
        want.select("user_id", "event_id", "n_distinct")
    ).count() == 0
