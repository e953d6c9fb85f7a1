"""Property-based invariants for the round-6 sequence operators: random
event streams against exact Python models — the strict-order funnel and
sequenceCount must agree with a straightforward scan of the ordered
stream on EVERY input, not just the fixture corpus."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# events: (user 0-3, minute 0-59, type 0=view 1=click 2=purchase 3=other)
_EVENTS = st.lists(
    st.tuples(
        st.integers(0, 3), st.integers(0, 59), st.integers(0, 3)
    ),
    min_size=1,
    max_size=60,
)

_TYPES = ("view", "click", "purchase", "other")


def _frame(spark, events):
    rows = [
        (u, dt.datetime(2024, 1, 1, 12, m, 0), i, _TYPES[t])
        for i, (u, m, t) in enumerate(events)
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )


def _ordered_streams(events):
    by_user: dict[int, list[str]] = {}
    order = sorted(
        ((u, m, i, _TYPES[t]) for i, (u, m, t) in enumerate(events)),
        key=lambda r: (r[1], r[2]),
    )
    for u, _m, _i, ty in order:
        by_user.setdefault(u, []).append(ty)
    return by_user


@settings(**_SETTINGS)
@given(_EVENTS)
def test_strict_funnel_matches_scan_model(spark, events):
    from logpump_spark.operators.funnel import window_funnel_strict

    steps = [F.col("event_type") == s for s in ("view", "click", "purchase")]
    got = {
        r["user_id"]: r["level"]
        for r in window_funnel_strict(_frame(spark, events), steps).collect()
    }

    want = {}
    for u, stream in _ordered_streams(events).items():
        if "view" not in stream:
            continue
        p = stream.index("view")  # earliest anchor
        level = 1
        if p + 1 < len(stream) and stream[p + 1] == "click":
            level = 2
            if p + 2 < len(stream) and stream[p + 2] == "purchase":
                level = 3
        want[u] = level
    assert got == want


@settings(**_SETTINGS)
@given(_EVENTS)
def test_seq_count_matches_scan_model(spark, events):
    from logpump_spark.queries.analytics_q import seq_count as _  # noqa: F401

    lbl = (
        F.when(F.col("event_type") == "view", 1)
        .when(F.col("event_type") == "click", 2)
        .otherwise(0)
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    d = (
        _frame(spark, events)
        .select("user_id", "ts", "event_id", lbl.alias("lbl"))
        .withColumn("nxt", F.lead("lbl").over(w))
    )
    got = {
        r["user_id"]: r["n"]
        for r in d.groupBy("user_id")
        .agg(
            F.sum(
                F.when((F.col("lbl") == 1) & (F.col("nxt") == 2), 1).otherwise(0)
            ).alias("n")
        )
        .collect()
    }

    for u, stream in _ordered_streams(events).items():
        n = sum(
            1
            for a, b in zip(stream, stream[1:])
            if a == "view" and b == "click"
        )
        assert got[u] == n
