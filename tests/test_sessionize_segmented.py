"""The r11 segmented sessionize is a RE-EXPRESSION, not an
approximation: for any hot_key_threshold the output must be
bit-identical to the plain two-window formulation.  These tests plant
the exact failure modes the design doc names (SCALING.md §4.1 /
operators/sessionize.py): hot keys that force the segmented branch,
equal-ts ties at block boundaries, gap-exactly-equal edges, NULL
timestamps (which sort first and re-start sessions), an all-same-ts
burst bot (the range key includes event_id, so equal-ts rows still
spread across blocks by count), and the count gate itself (no hot
key -> the compiled plan IS the plain plan)."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from logpump_spark.operators.sessionize import (
    _sessionize_plain,
    sessionize,
    session_stats,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, value double"
    )


def _collect(df):
    return sorted(
        (r.user_id, r.event_id, r.session_no)
        for r in df.select("user_id", "event_id", "session_no").collect()
    )


def _rand_events(seed: int, n_users: int, hot_rows: int, null_every: int = 0):
    """Uniform users with a planted hot user 0 holding ``hot_rows``
    events; timestamps jitter so sessions split and merge; a few exact
    gap-boundary and equal-ts ties."""
    rng = random.Random(seed)
    rows, eid = [], 0
    for u in range(1, n_users + 1):
        t = T0
        for _ in range(rng.randint(1, 12)):
            step = rng.choice([60, 1800, 1801, 3600])  # 30min gap edges
            t = t + dt.timedelta(seconds=step)
            rows.append((eid, t, u, 1.0))
            eid += 1
    t = T0
    for i in range(hot_rows):
        # mixture of tiny steps, exact-gap steps, ties
        step = rng.choice([0, 1, 59, 1800, 1801])
        t = t + dt.timedelta(seconds=step)
        ts = None if null_every and i % null_every == 0 else t
        rows.append((eid, ts, 0, 1.0))
        eid += 1
    rng.shuffle(rows)
    return rows


@pytest.mark.parametrize("seed,hot_rows", [(1, 400), (2, 1000), (3, 77)])
def test_segmented_equals_plain_on_hot_twin(spark, seed, hot_rows):
    df = _mk(spark, _rand_events(seed, n_users=40, hot_rows=hot_rows))
    # threshold 50 forces user 0 (and only user 0) through the
    # segmented branch; plain is the semantics oracle
    got = sessionize(df, hot_key_threshold=50)
    want = sessionize(df, hot_key_threshold=None)
    assert _collect(got) == _collect(want)


def test_segmented_handles_null_ts_like_plain(spark):
    df = _mk(spark, _rand_events(7, n_users=10, hot_rows=300, null_every=37))
    got = sessionize(df, hot_key_threshold=50)
    want = sessionize(df, hot_key_threshold=None)
    assert _collect(got) == _collect(want)


def test_all_same_ts_burst_bot_degenerates_to_one_session(spark):
    # all-equal-ts burst: the range key's event_id component spreads
    # the rows across blocks by count; the carry must still merge them
    # into ONE session (every block gap is zero)
    rows = [(i, T0, 0, 1.0) for i in range(200)]
    rows += [(1000 + i, T0 + dt.timedelta(hours=i), 1, 1.0) for i in range(5)]
    df = _mk(spark, rows)
    got = sessionize(df, hot_key_threshold=50)
    want = sessionize(df, hot_key_threshold=None)
    assert _collect(got) == _collect(want)
    hot = got.filter(F.col("user_id") == 0).select("session_no").distinct()
    assert [r.session_no for r in hot.collect()] == [1]


def test_multiple_hot_users_and_tie_breaks(spark):
    rows = []
    eid = 0
    for u in (0, 1):  # two hot users, heavy equal-ts ties
        for i in range(150):
            ts = T0 + dt.timedelta(seconds=(i // 10) * 2000)  # 10-way ties
            rows.append((eid, ts, u, 1.0))
            eid += 1
    rows.append((eid, T0, 2, 1.0))
    df = _mk(spark, rows)
    got = sessionize(df, hot_key_threshold=100)
    want = sessionize(df, hot_key_threshold=None)
    assert _collect(got) == _collect(want)


def test_count_gate_compiles_plain_plan_when_no_hot_key(spark):
    df = _mk(spark, _rand_events(4, n_users=20, hot_rows=0))
    out = sessionize(df)  # default threshold 1M; nothing is hot
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # the segmented path's signature operators must be absent: the
    # sampled range repartition and its partition-id block column
    assert "SPARK_PARTITION_ID" not in plan.upper()
    assert "RepartitionByExpression" not in plan
    assert _collect(out) == _collect(sessionize(df, hot_key_threshold=None))


def test_session_stats_composes_over_segmented(spark):
    df = _mk(spark, _rand_events(5, n_users=15, hot_rows=250))
    got = session_stats(df, hot_key_threshold=60)
    want = session_stats(df, hot_key_threshold=None)
    key = lambda r: (r.user_id, r.session_no)  # noqa: E731
    g = sorted(got.collect(), key=key)
    w = sorted(want.collect(), key=key)
    assert [tuple(r) for r in g] == [tuple(r) for r in w]


def test_plain_helper_matches_public_default(spark):
    # _sessionize_plain is the oracle the property tests lean on; pin
    # it to the public API's threshold=None route
    df = _mk(spark, _rand_events(6, n_users=8, hot_rows=0))
    a = _collect(_sessionize_plain(df, "user_id", "ts", "event_id", 30 * 60 * 10**6))
    b = _collect(sessionize(df, hot_key_threshold=None))
    assert a == b


def test_segmented_string_keys_like_intervals_family(spark):
    # interval_length_sum composes sessionize over a concat'd STRING
    # key ("user|event_type"); the segmented path must range-split and
    # carry string keys identically to the plain window
    rng = random.Random(13)
    rows, eid = [], 0
    for u in ("7|click", "7|view", "bot|click"):
        t = T0
        n = 300 if u == "bot|click" else 25
        for _ in range(n):
            t = t + dt.timedelta(seconds=rng.choice([0, 30, 1800, 1801]))
            rows.append((eid, t, u, 1.0))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, uk string, value double"
    )
    got = sessionize(df, user_col="uk", hot_key_threshold=100)
    want = sessionize(df, user_col="uk", hot_key_threshold=None)
    key = lambda r: (r.uk, r.event_id)  # noqa: E731
    g = sorted(got.select("uk", "event_id", "session_no").collect(), key=key)
    w = sorted(want.select("uk", "event_id", "session_no").collect(), key=key)
    assert [tuple(r) for r in g] == [tuple(r) for r in w]


def test_segmented_equals_plain_in_sampled_bounds_regime(spark):
    # at-scale equality where range bounds are genuinely SAMPLED (past
    # the RangePartitioner's ~3 * 100-rows-per-block exhaustive window,
    # derived from the live block constants so an oversubscription bump
    # cannot silently shrink the margin).  r13: the carry join's two
    # subtrees read ONE materialized block assignment
    # (skewguard.ranged_blocks), so this is a scale regression test,
    # no longer a sampler-determinism contract pin.
    from pyspark.sql import functions as F2

    from tests.test_seglead import _sampled_regime_rows

    hot = spark.range(_sampled_regime_rows(spark)).select(
        F2.col("id").alias("event_id"),
        F2.timestamp_micros(
            F2.lit(1704067200000000)
            + F2.col("id") * F2.lit(7_000_000)
            + (F2.col("id") % 7) * F2.lit(1_800_000_000)
        ).alias("ts"),
        F2.lit(0).cast("long").alias("user_id"),
        F2.lit(1.0).alias("value"),
    )
    cold = spark.range(2_000).select(
        (F2.col("id") + 10_000_000).alias("event_id"),
        F2.timestamp_micros(
            F2.lit(1704067200000000) + (F2.col("id") % 977) * F2.lit(3_601_000_000)
        ).alias("ts"),
        (F2.col("id") % 200 + 1).alias("user_id"),
        F2.lit(1.0).alias("value"),
    )
    df = hot.unionByName(cold)
    got = sessionize(df, hot_key_threshold=10_000).select(
        "user_id", "event_id", "session_no"
    )
    want = sessionize(df, hot_key_threshold=None).select(
        "user_id", "event_id", "session_no"
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
