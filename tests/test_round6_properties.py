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
    # drives the PRODUCTION operator (the same one seq_count registers)
    from logpump_spark.operators.funnel import sequence_count_adjacent

    got = {
        r["user_id"]: r["n_matches"]
        for r in sequence_count_adjacent(
            _frame(spark, events),
            F.col("event_type") == "view",
            F.col("event_type") == "click",
        ).collect()
    }

    for u, stream in _ordered_streams(events).items():
        n = sum(
            1
            for a, b in zip(stream, stream[1:])
            if a == "view" and b == "click"
        )
        assert got[u] == n
